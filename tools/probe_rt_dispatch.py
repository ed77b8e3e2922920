"""Probe: host-side dispatch cost of rt_step through the axon relay.

Separates: device_put of scan-sized arrays, rt_step dispatch with numpy
args vs pre-staged device args, and the stacked stats poll.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.slam.realtime import rt_init, rt_step
from tools.probe_realtime import build_cfg, make_frames
from bench import synth_scene


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    n_pts = 8192
    scene = synth_scene(100_000)
    frames, _ = make_frames(24, n_pts, scene)
    cfg = build_cfg(n_pts)

    state = rt_init(frames[0], jnp.eye(4), cfg)
    state, st0 = rt_step(state, frames[1], jnp.asarray(0.1, jnp.float32),
                         jnp.eye(4), cfg)
    jax.block_until_ready(state.map_pose)
    log("warm")

    # 1. device_put of one scan pytree (host->device staging cost).
    host_scans = [jax.tree.map(np.asarray, f) for f in frames[2:14]]
    t0 = time.perf_counter()
    staged = [jax.device_put(h) for h in host_scans]
    t_put_dispatch = (time.perf_counter() - t0) / len(staged)
    jax.block_until_ready(staged)
    t_put_total = (time.perf_counter() - t0) / len(staged)
    log(f"device_put scan: dispatch {t_put_dispatch*1e3:.1f} ms, "
        f"completed {t_put_total*1e3:.1f} ms (n={len(staged)})")

    # 2. rt_step dispatch cost with numpy args (what RealtimePipeline does).
    dt = jnp.asarray(0.1, jnp.float32)
    ext = jnp.eye(4)
    t0 = time.perf_counter()
    s = state
    outs = []
    for h in host_scans:
        s, stats = rt_step(s, h, dt, ext, cfg)
        outs.append(stats)
    t_disp_np = (time.perf_counter() - t0) / len(host_scans)
    jax.block_until_ready(outs[-1])
    t_all_np = (time.perf_counter() - t0) / len(host_scans)
    log(f"rt_step numpy args: dispatch {t_disp_np*1e3:.1f} ms/frame, "
        f"wall-to-done {t_all_np*1e3:.1f} ms/frame")

    # 3. rt_step with PRE-STAGED device args.
    t0 = time.perf_counter()
    s2 = state
    outs2 = []
    for d in staged:
        s2, stats = rt_step(s2, d, dt, ext, cfg)
        outs2.append(stats)
    t_disp_dev = (time.perf_counter() - t0) / len(staged)
    jax.block_until_ready(outs2[-1])
    t_all_dev = (time.perf_counter() - t0) / len(staged)
    log(f"rt_step staged args: dispatch {t_disp_dev*1e3:.1f} ms/frame, "
        f"wall-to-done {t_all_dev*1e3:.1f} ms/frame")

    # 4. poll cost: stack 8 stats + np.asarray.
    t0 = time.perf_counter()
    got = np.asarray(jnp.stack(outs2[:8]))
    log(f"poll (stack 8 + fetch): {(time.perf_counter()-t0)*1e3:.1f} ms")
    t0 = time.perf_counter()
    got = np.asarray(jnp.stack(outs2[:8]))
    log(f"poll again (program cached): {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
