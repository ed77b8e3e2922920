"""gather_kernel bisect #4: bare kernel scaling — query count x table size."""

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

    rng = np.random.default_rng(0)
    for nq, tbits in [(131072, 16), (262144, 16), (524288, 16), (524288, 12)]:
        T = 1 << tbits
        tab = jnp.asarray(rng.normal(size=(T, 8, 128)).astype(np.float32))
        h = jnp.asarray(rng.integers(0, T, size=(nq,), dtype=np.int32))
        q = jnp.asarray(rng.normal(size=(nq, 3)).astype(np.float32))
        m = jnp.ones((nq,), bool)
        try:
            t0 = time.perf_counter()
            out = gsk.gather_select(tab, h, q, m)
            jax.block_until_ready(out)
            log(f"nq={nq} T=2^{tbits}: OK ({time.perf_counter()-t0:.1f}s warm) "
                f"sum={float(jnp.sum(jnp.abs(out[:, :3]))):.3e}")
        except Exception as e:
            log(f"nq={nq} T=2^{tbits}: FAILED {type(e).__name__}: {str(e)[:160]}")
    log("done")


if __name__ == "__main__":
    main()
