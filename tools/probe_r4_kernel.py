"""Bisect the Mosaic SIGABRT in the tiled gather_select kernel.

Stages add rank-block ops one at a time on top of the known-good DMA wave
loop (tools/probe_dma.py compiled and hit 78 M rows/s with the exact same
[T, 8, 128] table + scratch + semaphore structure). Each stage is its own
pallas_call; the first stage to fail names the guilty op group.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


T_CELLS = 1 << 16
Q = 512
GROUP = 128
CH = 8
LANE = 128
INF = jnp.inf


def dma_loop(h_ref, tab_ref, rows_scr, sems, t):
    def issue(k, g):
        i = g * GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * Q + i]], rows_scr.at[i], sems.at[k]).start()
        return g

    def wait(k, g):
        i = g * GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * Q + i]], rows_scr.at[i], sems.at[k]).wait()
        return g

    def wave(g, _):
        jax.lax.fori_loop(0, GROUP, issue, g)
        jax.lax.fori_loop(0, GROUP, wait, g)
        return 0

    jax.lax.fori_loop(0, Q // GROUP, wave, 0)


def make_stage(body, out_lanes):
    def kern(h_ref, tab_ref, q_ref, out_ref, rows_scr, sems):
        t = pl.program_id(0)
        dma_loop(h_ref, tab_ref, rows_scr, sems, t)
        out_ref[:] = body(rows_scr[:], q_ref[:])

    @jax.jit
    def run(tab, h, q8):
        n = h.shape[0]
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // Q,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((Q, CH), lambda i, h: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Q, out_lanes), lambda i, h: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((Q, CH, LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA((GROUP,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n, out_lanes), jnp.float32),
        )(h, tab, q8)

    return run


def s1_sum(rows, q):
    return jnp.sum(rows, axis=1)  # [Q, 128]


def s2_d2min(rows, q):
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    diff = rows - q[:, :, None]
    d2 = jnp.sum(jnp.where(sub < 3, diff * diff, 0.0), axis=1)
    return jnp.min(d2, axis=-1, keepdims=True) * jnp.ones((1, 128), jnp.float32)


def s3_ids(rows, q):
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    ids = jnp.sum(jnp.where(sub == 3, rows_i, 0), axis=1)
    return ids.astype(jnp.float32)


def s4_pick(rows, q):
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    diff = rows - q[:, :, None]
    d2 = jnp.sum(jnp.where(sub < 3, diff * diff, 0.0), axis=1)
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    ids = jnp.sum(jnp.where(sub == 3, rows_i, 0), axis=1)
    validc = ids >= 0
    valid_q = q[:, 3] > 0.0
    d2 = jnp.where(validc & valid_q[:, None], d2, INF)
    bd = jnp.min(d2, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    win = jnp.min(jnp.where(d2 <= bd, lane, LANE), axis=-1, keepdims=True)
    pick = (lane == win).astype(jnp.float32)
    safe = jnp.where(sub == 3, 0.0, rows)
    sel = jnp.sum(safe * pick[:, None, :], axis=2)  # [Q, 8]
    return jnp.pad(sel, ((0, 0), (0, 8)))


def s5_full(rows, q):
    from open3d_slam_private_tpu.kernels.gather_select_pallas import _rank_block
    return _rank_block(rows, q)


def main():
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip
    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(T_CELLS, CH, LANE)).astype(np.float32))
    h = jnp.asarray(rng.integers(0, T_CELLS, size=(65536,), dtype=np.int32))
    q8 = jnp.asarray(rng.normal(size=(65536, CH)).astype(np.float32))

    stages = [
        ("s1 dma+sum", s1_sum, 128),
        ("s2 d2+min", s2_d2min, 128),
        ("s3 bitcast ids", s3_ids, 128),
        ("s4 pick+payload", s4_pick, 16),
        ("s5 full rank block", s5_full, 16),
    ]
    for name, body, lanes in stages:
        try:
            run = make_stage(body, lanes)
            out = run(tab, h, q8)
            v = float(jnp.sum(jnp.abs(out)))
            log(f"{name}: OK sum={v:.3e}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    log("done")


if __name__ == "__main__":
    main()
