"""Diagnose the 64k pipeline ATE blow-up (BENCH r4: ate_max 31.4 m).

Variants isolate: loop closure, poll staleness, ref compaction, normals.
Dumps per-frame ATE + flags around the worst frame.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run_variant(name, cfg, frames, gts, poll_every, lc):
    from open3d_slam_private_tpu.slam.realtime import RealtimePipeline
    from bench import _ate

    rt = RealtimePipeline(cfg, poll_every=poll_every,
                          loop_closure_async=lc)
    if not lc:
        cfg2 = dataclasses.replace(cfg, loop_closure_enabled=False)
        rt = RealtimePipeline(cfg2, poll_every=poll_every)
    rt.warmup(frames[0])
    t0 = time.perf_counter()
    for i, scan in enumerate(frames):
        rt.process_scan(scan, time=0.1 * i)
    rt.poll()
    wall = time.perf_counter() - t0
    rt.finish(wait_loop_closures=False)
    traj = rt.trajectory()
    ate = _ate(traj, gts)
    worst = int(np.argmax(ate))
    flags = []
    for j in range(max(0, worst - 3), min(len(rt.frames), worst + 2)):
        r = rt.frames[j]
        flags.append(f"f{j}: ate={ate[j]:.2f} ins={r.inserted} conv={r.converged} "
                     f"deg={r.degenerate}")
    log(f"{name}: ate_p50={np.median(ate):.4f} ate_max={np.max(ate):.3f} "
        f"worst_frame={worst} submaps={len(rt.submaps.submaps)} "
        f"lc={rt.loop_closure_count} hz={len(frames)/wall:.1f}")
    for fl in flags:
        log(f"  {fl}")


def main():
    from bench import _pipeline_cfg, _frames_for_run, synth_scene

    n_frames, n_pts = 80, 65536
    scene = synth_scene(400_000)
    cfg = _pipeline_cfg(smoke=False, carve=False, dense=False, loopy=False)
    frames, gts = _frames_for_run(scene, n_frames, n_pts, speed=0.32)
    log("frames built")

    run_variant("base lc+poll8", cfg, frames, gts, 8, True)
    run_variant("no-lc poll8", cfg, frames, gts, 8, False)
    run_variant("no-lc poll1", cfg, frames, gts, 1, False)
    cfg_nc = dataclasses.replace(
        cfg, mapper=dataclasses.replace(cfg.mapper, ref_capacity=None))
    run_variant("no-lc poll8 refcap=None", cfg_nc, frames, gts, 8, False)
    cfg_knn = dataclasses.replace(
        cfg, mapper=dataclasses.replace(cfg.mapper, normals_method="knn"))
    run_variant("no-lc poll8 knn-normals", cfg_knn, frames, gts, 8, False)
    log("done")


if __name__ == "__main__":
    main()
