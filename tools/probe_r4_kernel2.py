"""Stage-5 sub-bisection: which op group in the rank-block tail SIGABRTs.

s4 (d2 + pick + payload extraction) compiles; the full block does not.
Candidates: multi-axis int reduction, scalar bitcast int->f32, the
16-lane output assembly. Each sub-stage is cumulative and 2-D-only where
possible; the last OK stage becomes the new _rank_block implementation.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401
from probe_r4_kernel import make_stage, log, T_CELLS, CH, LANE

INF = jnp.inf


def base(rows, q):
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    diff = rows - q[:, :, None]
    d2 = jnp.sum(jnp.where(sub < 3, diff * diff, 0.0), axis=1)
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    ids = jnp.sum(jnp.where(sub == 3, rows_i, 0), axis=1)  # [Q,128]
    validc = ids >= 0
    valid_q = q[:, 3] > 0.0
    d2 = jnp.where(validc & valid_q[:, None], d2, INF)
    bd = jnp.min(d2, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    win = jnp.min(jnp.where(d2 <= bd, lane, LANE), axis=-1, keepdims=True)
    pick = (lane == win).astype(jnp.float32)
    safe = jnp.where(sub == 3, 0.0, rows)
    sel = jnp.sum(safe * pick[:, None, :], axis=2)  # [Q,8]
    return sub, d2, ids, validc, bd, pick, sel


def s5a_selid2d(rows, q):
    _, _, ids, validc, bd, pick, sel = base(rows, q)
    sel_id = jnp.sum(jnp.where(pick > 0.5, ids, 0), axis=-1)  # [Q] int, 2-D reduce
    occ = jnp.sum(validc.astype(jnp.float32), axis=-1)
    return jnp.pad(sel, ((0, 0), (0, 8))) + (sel_id.astype(jnp.float32) * 0 + occ * 0)[:, None]


def s5b_bitcast(rows, q):
    _, _, ids, validc, bd, pick, sel = base(rows, q)
    sel_id = jnp.sum(jnp.where(pick > 0.5, ids, 0), axis=-1)
    idf = jax.lax.bitcast_convert_type(sel_id, jnp.float32)  # [Q] 1-D bitcast
    return jnp.pad(sel, ((0, 0), (0, 8))) + idf[:, None] * 0.0


def s5c_concat(rows, q):
    _, _, ids, validc, bd, pick, sel = base(rows, q)
    sel_id = jnp.sum(jnp.where(pick > 0.5, ids, 0), axis=-1, keepdims=True)  # [Q,1]
    idf = jax.lax.bitcast_convert_type(sel_id, jnp.float32)  # [Q,1] 2-D bitcast
    occ = jnp.sum(validc.astype(jnp.float32), axis=-1, keepdims=True)
    Qn = rows.shape[0]
    return jnp.concatenate(
        [sel[:, 0:3], idf, sel[:, 4:7], bd, occ,
         jnp.zeros((Qn, 7), jnp.float32)], axis=1)


def s5d_where16(rows, q):
    _, _, ids, validc, bd, pick, sel = base(rows, q)
    sel_id = jnp.sum(jnp.where(pick > 0.5, ids, 0), axis=-1, keepdims=True)
    idf = jax.lax.bitcast_convert_type(sel_id, jnp.float32)
    occ = jnp.sum(validc.astype(jnp.float32), axis=-1, keepdims=True)
    Qn = rows.shape[0]
    olane = jax.lax.broadcasted_iota(jnp.int32, (Qn, 16), 1)
    out = jnp.zeros((Qn, 16), jnp.float32)
    for c in (0, 1, 2, 4, 5, 6):
        out = jnp.where(olane == c, sel[:, c:c + 1], out)
    out = jnp.where(olane == 3, idf, out)
    out = jnp.where(olane == 7, bd, out)
    out = jnp.where(olane == 8, occ, out)
    return out


def main():
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip
    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(T_CELLS, CH, LANE)).astype(np.float32))
    h = jnp.asarray(rng.integers(0, T_CELLS, size=(65536,), dtype=np.int32))
    q8 = jnp.asarray(rng.normal(size=(65536, CH)).astype(np.float32))
    for name, body in [
        ("s5a selid 2d-reduce", s5a_selid2d),
        ("s5b 1d bitcast", s5b_bitcast),
        ("s5c concat-out", s5c_concat),
        ("s5d where16-out", s5d_where16),
    ]:
        try:
            run = make_stage(body, 16)
            out = run(tab, h, q8)
            log(f"{name}: OK sum={float(jnp.sum(jnp.abs(out))):.3e}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    log("done")


if __name__ == "__main__":
    main()
