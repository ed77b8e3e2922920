"""Measure per-row DMA gather throughput in a Pallas TPU kernel.

Table rows are stored as aligned [8, 128] f32 tiles (sublane = payload
channel, lane = candidate; 48 of 128 lanes used). Each grid tile issues Q
row DMAs (HBM -> VMEM scratch) from scalar-prefetched cell indices in
waves of GROUP outstanding copies, then reduces the scratch to force the
loads. Compare against XLA's ~76 M rows/s gather.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from open3d_slam_private_tpu.utils.timing import relay_roundtrip

T_CELLS = 1 << 17
Q = 256  # rows per grid tile
GROUP = 128  # outstanding DMAs per wave


def _kernel(h_ref, tab_ref, out_ref, scratch, sems):
    t = pl.program_id(0)

    def issue(k, g):
        i = g * GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * Q + i]], scratch.at[i], sems.at[k]
        ).start()
        return g

    def wait(k, g):
        i = g * GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * Q + i]], scratch.at[i], sems.at[k]
        ).wait()
        return g

    def wave(g, _):
        jax.lax.fori_loop(0, GROUP, issue, g)
        jax.lax.fori_loop(0, GROUP, wait, g)
        return 0

    jax.lax.fori_loop(0, Q // GROUP, wave, 0)
    v = scratch[:]  # [Q, 8, 128]
    out_ref[0] = jnp.sum(v, axis=0)


@functools.partial(jax.jit, static_argnames=())
def dma_gather_reduce(tab, h):
    n = h.shape[0]
    grid = (n // Q,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda i, h: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((Q, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((GROUP,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n // Q, 8, 128), jnp.float32),
    )(h, tab)


def main():
    rt = relay_roundtrip()
    print(f"relay rt {rt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(T_CELLS, 8, 128)).astype(np.float32))
    h = jnp.asarray(rng.integers(0, T_CELLS, size=(524288,), dtype=np.int32))

    out = dma_gather_reduce(tab, h)
    print(f"warm ok sum={float(jnp.sum(out)):.3f}", flush=True)


    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = dma_gather_reduce(tab, h)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0 - rt) / 10)
    ms = float(np.median(ts)) * 1e3
    print(f"dma gather 512k rows x 4096B: {ms:.2f} ms = {524288/ms/1e3:.0f} M rows/s, "
          f"{524288*4096/ms*1e3/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
