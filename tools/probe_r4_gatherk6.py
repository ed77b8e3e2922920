"""Isolate the gather_select slowdown: bare kernel rate vs XLA gather+rank
at identical row counts, plus tile_table cost."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from open3d_slam_private_tpu.kernels import gather_select_pallas as gsk
    from open3d_slam_private_tpu.ops import grid_hash
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    T, CAP, NQ = 1 << 16, 48, 524288
    table = jnp.asarray(rng.normal(size=(T, CAP, 8)).astype(np.float32))
    tiled = gsk.tile_table(table)
    h = jnp.asarray(rng.integers(0, T, size=(NQ,), dtype=np.int32))
    q = jnp.asarray(rng.normal(size=(NQ, 3)).astype(np.float32))
    m = jnp.ones((NQ,), bool)

    # Bare kernel, chained timing.
    @jax.jit
    def kern(tab, hh, qq):
        out = gsk.gather_select(tab, hh, qq, m)
        return qq + 1e-9 * out[:, :3]

    qq = kern(tiled, h, q)
    float(jnp.sum(qq))
    t0 = time.perf_counter()
    for _ in range(10):
        qq = kern(tiled, h, qq)
    float(jnp.sum(qq))
    dt = (time.perf_counter() - t0 - rt) / 10
    log(f"bare kernel 524k rows: {dt*1e3:.2f} ms = {NQ/dt/1e6:.1f} M rows/s")

    # XLA: flat row gather + masked rank (the production selection path).
    flat = table.reshape(T, CAP * 8)

    @jax.jit
    def xla(fl, hh, qq):
        rows = fl[hh].reshape(NQ, CAP, 8)
        ids = jax.lax.bitcast_convert_type(rows[..., 3], jnp.int32)
        valid = ids >= 0
        res = grid_hash.match_candidates_masked(rows, valid, qq, m, 0.5, 1)
        return qq + 1e-9 * jnp.nan_to_num(res.xyz[:, 0, :], posinf=0.0)

    qq = xla(flat, h, q)
    float(jnp.sum(qq))
    t0 = time.perf_counter()
    for _ in range(10):
        qq = xla(flat, h, qq)
    float(jnp.sum(qq))
    dt = (time.perf_counter() - t0 - rt) / 10
    log(f"xla gather+rank 524k rows: {dt*1e3:.2f} ms = {NQ/dt/1e6:.1f} M rows/s")

    # tile_table alone.
    @jax.jit
    def tt(tab):
        return gsk.tile_table(tab + 0.0)

    out = tt(table)
    float(jnp.sum(out[:2]))
    t0 = time.perf_counter()
    for _ in range(5):
        out = tt(table + 1e-12 * out[0, 0, 0])
    float(jnp.sum(out[:2]))
    dt = (time.perf_counter() - t0 - rt) / 5
    log(f"tile_table [{T}x{CAP}x8]: {dt*1e3:.2f} ms")
    log("done")


if __name__ == "__main__":
    main()
