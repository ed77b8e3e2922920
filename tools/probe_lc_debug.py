"""Debug probe: where do loop-closure corrections go? Runs the protocol-4
loopy two-lap scenario with instrumentation on the pose-graph solve:
prints per-solve increment magnitudes, the pending increment handed to the
mapping thread, and per-constraint measured-vs-anchor disagreement.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from bench import _ate, _frames_for_run, _pipeline_cfg, synth_scene
    from open3d_slam_private_tpu.slam import place_recognition as pr
    from open3d_slam_private_tpu.slam.realtime import RealtimePipeline

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 340
    scene = synth_scene(200_000)
    frames, gts = _frames_for_run(scene, n_frames, 8192)

    cfg = _pipeline_cfg()
    rt = RealtimePipeline(cfg, poll_every=8)

    # --- instrumentation ---
    orig_opt = rt._optimize_pose_graph
    orig_lc = pr.build_loop_closure_constraints

    def spy_constraints(submaps, idx, cfg=None):
        cons = orig_lc(submaps, idx, cfg=cfg)
        for c in cons:
            a_t = submaps.submaps[c.target_idx].anchor
            a_s = submaps.submaps[c.source_idx].anchor
            implied = np.linalg.inv(a_t) @ a_s
            dis = np.linalg.inv(c.T_target_source) @ implied
            log(f"  LC {c.target_idx}->{c.source_idx}: measured-vs-anchor "
                f"disagreement trans={np.linalg.norm(dis[:3, 3]):.4f} m "
                f"rot={np.linalg.norm(dis[:3, :3] - np.eye(3)):.5f}")
        return cons

    def spy_opt():
        orig_opt()
        with rt._inc_lock:
            inc = rt._pending_increment
        if inc is None:
            log("  solve: pending increment = None")
        else:
            log(f"  solve: pending inc trans={np.linalg.norm(inc[:3, 3]):.4f} m")

    rt._optimize_pose_graph = spy_opt
    pr.build_loop_closure_constraints = spy_constraints
    # Re-point the already-running worker's closure (it calls methods via
    # self, so the monkeypatch above is enough for _optimize_pose_graph;
    # the pr module function is looked up at call time in realtime.py).

    t0 = time.perf_counter()
    for i, scan in enumerate(frames):
        rt.process_scan(scan, time=0.1 * i)
        if (i + 1) % 50 == 0:
            log(f"frame {i+1}/{n_frames} ({time.perf_counter()-t0:.0f}s, "
                f"lc={rt.loop_closure_count} solves={rt.pose_graph_solves})")
    rt.poll()
    rt.finish()
    ate = _ate(rt.trajectory(), gts)
    log(f"ate p50={np.median(ate):.4f} max={np.max(ate):.4f} "
        f"submaps={len(rt.submaps.submaps)} lc={rt.loop_closure_count} "
        f"solves={rt.pose_graph_solves}")


if __name__ == "__main__":
    main()
