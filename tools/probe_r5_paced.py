"""Round-5 probe: honest 10 Hz arrival->pose latency with the async
reference rebuild (the p95 <= 100 ms task). Mirrors the bench's paced
segment exactly: poll_every=1, arrivals at 0.1 s ticks, latency measured
completion - arrival."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from bench import _frames_for_run, _pipeline_cfg, synth_scene
    from open3d_slam_private_tpu.slam.realtime import RealtimePipeline

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    scene = synth_scene(200_000)
    frames, gts = _frames_for_run(scene, n, 8192)
    for tag, async_rb in [("async", True), ("sync", False)]:
        rt = RealtimePipeline(_pipeline_cfg(), poll_every=1,
                              async_rebuild=async_rb)
        log(f"{tag}: warmup")
        rt.warmup(frames[0])
        log(f"{tag}: streaming paced")
        lats = []
        t_first = time.perf_counter()
        for i, scan in enumerate(frames):
            t_due = t_first + 0.1 * i
            now = time.perf_counter()
            if now < t_due:
                time.sleep(t_due - now)
            rt.process_scan(scan, time=0.1 * i)
            rt.poll()
            lats.append(time.perf_counter() - t_due)
        rt.finish(wait_loop_closures=False)
        core = np.asarray(lats[15:]) * 1e3
        log(f"{tag}: p50={np.percentile(core,50):.1f} ms "
            f"p90={np.percentile(core,90):.1f} p95={np.percentile(core,95):.1f} "
            f"max={core.max():.1f} over {len(core)} frames")
        worst = np.argsort(core)[-6:]
        log(f"{tag}: worst frames (idx+15, ms): "
            + " ".join(f"{i+15}:{core[i]:.0f}" for i in sorted(worst)))


if __name__ == "__main__":
    main()
