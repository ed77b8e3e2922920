"""Round-5 probe: the NEW full-stage 64k e2e leg (carve + dense + LC,
two-lap loopy trajectory) with per-frame diagnostics — the reconciliation
run for the r4 0.32-vs-0.8555 m discrepancy (same session, same code as
the bench leg)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import bench
    from bench import _ate, _frames_for_run, _pipeline_cfg, synth_scene
    from open3d_slam_private_tpu.slam.realtime import RealtimePipeline

    import dataclasses as _dc

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 340
    n_pts = 65536
    scene = synth_scene(400_000)
    cfg = _pipeline_cfg()
    cfg = _dc.replace(
        cfg, mapper=_dc.replace(cfg.mapper, scan_voxel_size=0.2))
    frames, gts = _frames_for_run(scene, n_frames, n_pts)
    log(f"{n_frames} frames built")
    rt = RealtimePipeline(cfg, poll_every=8)
    rt.warmup(frames[0])
    log("warm; streaming")
    t0 = time.perf_counter()
    for i, scan in enumerate(frames):
        rt.process_scan(scan, time=0.1 * i)
        if (i + 1) % 50 == 0:
            log(f"  f{i+1}: submaps={len(rt.submaps.submaps)} "
                f"lc={rt.loop_closure_count} solves={rt.pose_graph_solves}")
    rt.poll()
    wall = time.perf_counter() - t0
    rt.finish()
    traj = rt.trajectory()
    ate = _ate(traj, gts)
    worst = int(np.argmax(ate))
    log(f"hz={n_frames/wall:.1f} ate_p50={np.median(ate):.4f} "
        f"p95={np.percentile(ate,95):.4f} max={ate.max():.4f} worst_f={worst} "
        f"submaps={len(rt.submaps.submaps)} lc={rt.loop_closure_count} "
        f"solves={rt.pose_graph_solves}")
    for j in range(max(0, worst - 3), min(len(rt.frames), worst + 3)):
        r = rt.frames[j]
        log(f"  f{j}: ate={ate[j]:.3f} ins={r.inserted} conv={r.converged} "
            f"deg={r.degenerate} submap={r.submap_idx}")
    for s in rt.solve_log:
        log(f"  solve: {s}")
    # ATE trace every 20 frames for drift-shape inspection.
    log("ate[::20]=" + np.array2string(ate[::20], precision=3, max_line_width=100))


if __name__ == "__main__":
    main()
