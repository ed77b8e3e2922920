"""Round-5 probe: loop-closure efficacy on the drift-observable corridor
scenario (bench.corridor_world/corridor_frames).

Stage 1 (--off-only): lc_off run — verify drift actually accumulates
(prerequisite the round-4 protocol lacked: its loopy scene kept every
direction observable, so lc_on == lc_off bit-identically).
Stage 2: lc_on run on identical scans — the solves must produce nonzero
increments and repair the drift.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run(tag, frames, gts, lb, lc, poll_every=8):
    import dataclasses as dc

    from bench import _ate, _pipeline_cfg
    from open3d_slam_private_tpu.slam.realtime import RealtimePipeline

    cfg = _pipeline_cfg()
    if not lc:
        cfg = dc.replace(cfg, loop_closure_enabled=False)
    rt = RealtimePipeline(cfg, poll_every=poll_every)
    log(f"{tag}: warmup")
    rt.warmup(frames[0])
    log(f"{tag}: streaming {len(frames)} frames")
    t0 = time.perf_counter()
    for i, scan in enumerate(frames):
        rt.process_scan(scan, time=0.1 * i)
        if (i + 1) % 100 == 0:
            est = rt.pose
            gt = gts[i]
            log(f"  {tag} f{i+1}: est_x={est[0,3]:7.2f} gt_x={gt[0,3]:7.2f} "
                f"err={np.linalg.norm(est[:3,3]-gt[:3,3]):6.3f} "
                f"submaps={len(rt.submaps.submaps)} lc={rt.loop_closure_count}")
    rt.poll()
    wall = time.perf_counter() - t0
    rt.finish()
    traj = rt.trajectory()
    ate = _ate(traj, gts)
    lap1 = ate[: lb[0]]
    lap2 = ate[lb[0]:] if len(lb) > 1 else ate[:0]
    degs = [r.degenerate for r in rt.frames if r.pose is not None]
    log(f"{tag}: wall={wall:.0f}s hz={len(frames)/wall:.1f} "
        f"submaps={len(rt.submaps.submaps)} lc={rt.loop_closure_count} "
        f"solves={rt.pose_graph_solves} deg_frac={np.mean(degs):.2f}")
    per = {}
    for r in rt.frames:
        if r.pose is not None:
            per.setdefault(r.submap_idx, []).append(1.0 if r.degenerate else 0.0)
    log(f"{tag}: per-submap deg frac: " + " ".join(
        f"{k}:{np.mean(v):.2f}" for k, v in sorted(per.items())))
    log(f"{tag}: ATE p50={np.median(ate):.3f} p95={np.percentile(ate,95):.3f} "
        f"max={ate.max():.3f} | lap1 p50={np.median(lap1):.3f} "
        + (f"| lap2 p50={np.median(lap2):.3f} max={lap2.max():.3f}" if len(lap2) else ""))
    for s in rt.solve_log:
        log(f"  solve: {s}")
    return ate, rt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--off-only", action="store_true")
    ap.add_argument("--on-only", action="store_true")
    ap.add_argument("--laps", type=int, default=2)
    ap.add_argument("--pts", type=int, default=8192)
    args = ap.parse_args()

    from bench import corridor_frames, corridor_world

    log("building world + frames")
    scene = corridor_world(240_000)
    frames, gts, lb = corridor_frames(scene, n_pts=args.pts, laps=args.laps)
    log(f"{len(frames)} frames, lap bounds {lb}")

    if not args.on_only:
        run("lc_off", frames, gts, lb, lc=False)
    if not args.off_only:
        run("lc_on", frames, gts, lb, lc=True)


if __name__ == "__main__":
    main()
