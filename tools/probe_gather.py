"""Characterize XLA row-gather cost on the TPU (the matcher's bottleneck).

The per-round candidate gather (rows = table[h]) + rank dominates the
X-ICP chain (12.8 of 26.3 ms per B=8 call). Questions:
  1. Does the rank reduction fuse into the gather (no [N,C,8] HBM round trip)?
  2. Is the gather per-ROW bound or per-BYTE bound?
  3. Do fewer/smaller rows help proportionally?
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from open3d_slam_private_tpu.utils.timing import relay_roundtrip

T_CELLS = 1 << 17
B = 8
N = 65536


def main():
    rt = relay_roundtrip()
    print(f"relay rt {rt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    # Table [T, C*ch] and per-lane query hashes (realistic: clustered runs
    # of repeated cells, ~16 queries share a cell on average).
    tab8 = jnp.asarray(rng.normal(size=(T_CELLS, 48 * 8)).astype(np.float32))
    tab4 = jnp.asarray(rng.normal(size=(T_CELLS, 48 * 4)).astype(np.float32))
    tab2i = jnp.asarray(rng.integers(0, 2**31 - 1, size=(T_CELLS, 48 * 3), dtype=np.int32))
    base = rng.integers(0, T_CELLS, size=(B, N // 16)).astype(np.int32)
    h = jnp.asarray(np.repeat(base, 16, axis=1))
    h_scat = jnp.asarray(rng.integers(0, T_CELLS, size=(B, N), dtype=np.int32))
    q = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def sync(x):
        return float(jnp.sum(x))

    @jax.jit
    def g8_rank(tab, h, q):
        # gather + d2 + min: the fusable-consumer shape (out [B, N]).
        def one(hh, qq):
            rows = tab[hh].reshape(N, 48, 8)
            d2 = jnp.sum((rows[..., :3] - qq[:, None, :]) ** 2, -1)
            return jnp.min(d2, axis=-1)
        return jax.vmap(one)(h, q)

    @jax.jit
    def g8_sum(tab, h):
        def one(hh):
            return jnp.sum(tab[hh]) * 1e-9
        return jax.vmap(one)(h)

    @jax.jit
    def g4_rank(tab, h, q):
        def one(hh, qq):
            rows = tab[hh].reshape(N, 48, 4)
            d2 = jnp.sum((rows[..., :3] - qq[:, None, :]) ** 2, -1)
            return jnp.min(d2, axis=-1)
        return jax.vmap(one)(h, q)

    @jax.jit
    def g2i_rank(tab, h, q):
        # packed-ish: 12 B/candidate int32, unpack u16 pairs then rank.
        def one(hh, qq):
            rows = tab[hh].reshape(N, 48, 3)
            w = jax.lax.bitcast_convert_type(rows, jnp.uint32)
            x = (w[..., 0] & jnp.uint32(0xFFFF)).astype(jnp.float32)
            y = (w[..., 0] >> 16).astype(jnp.float32)
            z = (w[..., 1] & jnp.uint32(0xFFFF)).astype(jnp.float32)
            cand = jnp.stack([x, y, z], -1) * 1e-4
            d2 = jnp.sum((cand - qq[:, None, :]) ** 2, -1)
            return jnp.min(d2, axis=-1)
        return jax.vmap(one)(h, q)

    @jax.jit
    def g8_rank_half(tab, h, q):
        def one(hh, qq):
            rows = tab[hh[: N // 2]].reshape(N // 2, 48, 8)
            d2 = jnp.sum((rows[..., :3] - qq[: N // 2, None, :]) ** 2, -1)
            return jnp.min(d2, axis=-1)
        return jax.vmap(one)(h, q)

    @jax.jit
    def g8_rank_cap24(tab, h, q):
        def one(hh, qq):
            rows = tab[hh, : 24 * 8].reshape(N, 24, 8)
            d2 = jnp.sum((rows[..., :3] - qq[:, None, :]) ** 2, -1)
            return jnp.min(d2, axis=-1)
        return jax.vmap(one)(h, q)

    @jax.jit
    def g8_rows8k(tab, h):
        def one(hh):
            return jnp.sum(tab[hh[:8192]]) * 1e-9
        return jax.vmap(one)(h)

    @jax.jit
    def take_sorted(tab, h, q):
        # sort queries by cell first: does locality help the gather?
        def one(hh, qq):
            order = jnp.argsort(hh)
            rows = tab[hh[order]].reshape(N, 48, 8)
            d2 = jnp.sum((rows[..., :3] - qq[order][:, None, :]) ** 2, -1)
            m = jnp.min(d2, axis=-1)
            return jnp.zeros_like(m).at[order].set(m)
        return jax.vmap(one)(h, q)

    cases = [
        ("g8_rank   clustered 1536B rows", lambda: g8_rank(tab8, h, q)),
        ("g8_rank   scattered 1536B rows", lambda: g8_rank(tab8, h_scat, q)),
        ("g8_sum    clustered (full read)", lambda: g8_sum(tab8, h)),
        ("g4_rank   clustered  768B rows", lambda: g4_rank(tab4, h, q)),
        ("g2i_rank  clustered  576B rows", lambda: g2i_rank(tab2i, h, q)),
        ("g8_rank   32k queries         ", lambda: g8_rank_half(tab8, h, q)),
        ("g8_rank   cap24 (768B slice)  ", lambda: g8_rank_cap24(tab8, h, q)),
        ("g8_sum    8k rows only        ", lambda: g8_rows8k(tab8, h)),
        ("g8_rank   pre-sorted by cell  ", lambda: take_sorted(tab8, h, q)),
    ]

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(name, ex.submit(fn)) for name, fn in cases]
        for name, f in futs:
            sync(f.result())
            print(f"warm {name}: {time.perf_counter()-t0:.0f}s", flush=True)

    for name, fn in cases:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            sync(out)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        ms = float(np.median(ts)) * 1e3
        print(f"{name}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
