"""Steady-state throughput of the FULL pipeline (odometry + loop closure +
pose-graph backend), excluding one-time compiles.

The reference's full workflow is odometry -> elevation-image loop closure ->
g2o backend (reference slam.py:118-163, loop_closure.py:254-333,
backend.py:288-389).  Here the whole pipeline runs with batched rimg8
odometry; this script times frames PAST a warmup cut so first-use compiles
(odometry batch executable, loop-closure match path, backend optimizer) are
excluded, and reports scans/s + per-stage means.

Steady state is measured over a MIDDLE window: WARMUP frames lead (one-time
compiles + pipeline fill), COOLDOWN frames trail (still processed in order,
but the final `slam.finish()` drain -- a bounded tail a 4541-frame KITTI
sequence amortizes to ~0 -- is not billed to the window).  The deferred-
downstream backlog is constant in steady state (bounded at 4 flushes +
one submap interval), so work entering the window equals work leaving it.

Usage:  python scripts/bench_full_pipeline.py
Env:    FP_FRAMES (default 250), FP_BATCH (12), FP_WARMUP_FRAMES (48),
        FP_COOLDOWN_FRAMES (48),
        FP_SPEED (0.5 -- keeps 250 frames inside the +/-120 m wall field),
        FP_ITERS/FP_REASSOC/FP_MOTION/FP_SIGMA (GN schedule; defaults to
        the bench.py champion: motion-gated 8/8 at 0.2 m, sigma 0.4),
        FP_REPEATS (5 -- per-run rates + median; the tunneled chip shows
        sporadic stalls, a single run is not a number),
        FP_OUT (path -- also write the summary JSON as an artifact, e.g.
        FULLPIPE_r05.json).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

FRAMES = int(os.environ.get("FP_FRAMES", "250"))
BATCH = int(os.environ.get("FP_BATCH", "12"))
WARMUP = int(os.environ.get("FP_WARMUP_FRAMES", "48"))
COOLDOWN = int(os.environ.get("FP_COOLDOWN_FRAMES", "48"))
SPEED = float(os.environ.get("FP_SPEED", "0.5"))


def run_once(seq, loader):
    from pathlib import Path as _P

    from pylidar_slam_tpu.config import compose, dataclass_from_dict
    from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig

    config_dir = _P(__file__).parent.parent / "config"
    cfg = compose(str(config_dir), "slam", [
        "dataset=synthetic",
        f"slam/loop_closure={os.environ.get('FP_LC', 'elevation_image')}",
        f"slam/backend={os.environ.get('FP_BACKEND', 'graph_slam')}",
        "slam/odometry/local_map=aggregated",
        "slam.odometry.local_map.max_neighbor_dist=0.6",
        f"slam.odometry.batch_size={BATCH}",
        "slam.odometry.upload_format=rimg8",
        "slam.odometry.num_points_padded=66560",
        # Default schedule == the bench.py / acceptance champion (motion-
        # gated 8 iters at 0.2 m, geman_mcclure sigma 0.4) so the product
        # number is measured at the recorded odometry config.
        f"slam.odometry.reassoc_every={os.environ.get('FP_REASSOC', '8')}",
        f"slam.odometry.max_num_alignments={os.environ.get('FP_ITERS', '8')}",
        f"slam.odometry.reassoc_motion_m={os.environ.get('FP_MOTION', '0.2')}",
        "slam.odometry.alignment.gauss_newton_config.scheme=geman_mcclure",
        "slam.odometry.alignment.gauss_newton_config.sigma="
        + os.environ.get("FP_SIGMA", "0.4"),
    ])["slam"]
    slam = SLAM(dataclass_from_dict(SLAMConfig, cfg),
                projector=loader.projector())
    slam.init()

    # Mirror the runner's prefetch workers: host_prepare (preprocessing +
    # upload encode) runs ahead of the pipeline thread.
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=2 * BATCH)

    def producer():
        for i in range(len(seq)):
            frame = dict(seq[i])
            slam.host_prepare(frame)
            q.put(frame)

    threading.Thread(target=producer, daemon=True).start()

    t_mark = t_cool = None
    cool_at = FRAMES - COOLDOWN
    t_qget = t_proc = 0.0
    for i in range(len(seq)):
        tq = time.time()
        frame = q.get()
        tp = time.time()
        slam.process_next_frame(frame)
        tdone = time.time()
        if t_mark is not None and t_cool is None:
            t_qget += tp - tq
            t_proc += tdone - tp
        if i + 1 == cool_at and t_mark is not None:
            t_cool = time.time()
        if i + 1 == WARMUP:
            # The loop-closure match executable compiles in a background
            # prewarm thread (loop_closure._prewarm); on the single-CPU host
            # it may not be done by the first submap event.  Steady state
            # excludes one-time compiles (a KITTI sequence amortizes them
            # over 4541 frames), so block here until the prewarm finishes.
            th = getattr(getattr(slam, "loop_closure", None),
                         "_prewarm_thread", None)
            if th is not None:
                th.join(timeout=600.0)
            t_mark = time.time()
            n_odo = len(slam.elapsed_odometry)
            n_lc = len(slam.elapsed_loop_closure)
            n_be = len(slam.elapsed_backend)
    t_fin = time.time()
    slam.finish()
    t_finish = time.time() - t_fin
    if t_cool is None:  # COOLDOWN >= FRAMES - WARMUP: fall back to loop end
        t_cool = t_fin
        cool_at = FRAMES
    elapsed = t_cool - t_mark
    timed = cool_at - WARMUP
    rate = timed / elapsed

    lc_ms = 1e3 * float(np.mean(slam.elapsed_loop_closure[n_lc:])) \
        if len(slam.elapsed_loop_closure) > n_lc else 0.0
    be_ms = 1e3 * float(np.mean(slam.elapsed_backend[n_be:])) \
        if len(slam.elapsed_backend) > n_be else 0.0
    odo_ms = 1e3 * float(np.mean(slam.elapsed_odometry[n_odo:])) \
        if len(slam.elapsed_odometry) > n_odo else 0.0

    pipe = dict(getattr(slam.odometry, "pipe_stats", {}))
    n_fl = max(1, int(pipe.get("flushes", 0)))
    return {
        "metric": "full pipeline (odometry+LC+backend) steady-state",
        "value": round(rate, 1), "unit": "scans/sec",
        "timed_frames": timed, "batch": BATCH,
        "stages_ms_per_frame": {"odometry_submit": round(odo_ms, 2),
                                "loop_closure": round(lc_ms, 2),
                                "backend": round(be_ms, 2)},
        # Whole-run means (incl. warmup): where the odometry pipeline
        # thread blocked per flush.
        "pipeline_ms_per_flush": {
            "upload_wait": round(1e3 * pipe.get("upload_wait_s", 0.0)
                                 / n_fl, 2),
            "dispatch": round(1e3 * pipe.get("dispatch_s", 0.0) / n_fl, 2),
        },
        # Timed-loop decomposition: producer starvation vs in-order
        # processing vs the final drain (all inside `elapsed`).
        "loop_ms_per_frame": {"qget": round(1e3 * t_qget / timed, 2),
                              "process": round(1e3 * t_proc / timed, 2),
                              "cooldown_frames": FRAMES - cool_at,
                              "finish_total_s": round(t_finish, 2)},
    }


def main():
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticDatasetLoader)

    loader = SyntheticDatasetLoader(SyntheticConfig(
        lidar_height=64, lidar_width=1024, num_frames=FRAMES,
        num_walls=40, num_pillars=25, speed=SPEED))
    lazy_seq = loader.sequences()[0][0][0]
    # Pre-materialize: the synthetic raycaster costs ~290 ms/frame -- lazily
    # generating inside the timed loop measures the data GENERATOR, not the
    # pipeline (a disk-backed dataset reads frames in ~1 ms).  This exact
    # mistake capped earlier full-pipeline numbers at ~3 scans/s.
    seq = [dict(lazy_seq[i]) for i in range(FRAMES)]

    repeats = int(os.environ.get("FP_REPEATS", "5"))
    runs = [run_once(seq, loader) for _ in range(repeats)]
    rates = sorted(r["value"] for r in runs)
    median = rates[len(rates) // 2] if repeats % 2 else round(
        0.5 * (rates[repeats // 2 - 1] + rates[repeats // 2]), 1)
    # The summary carries the MEDIAN as the headline (robust to the tunneled
    # chip's sporadic stalls) plus every per-run rate, and the per-stage
    # breakdown of the median run so the artifact explains its own number.
    med_run = min(runs, key=lambda r: abs(r["value"] - median))
    summary = dict(med_run)
    summary["value"] = median
    summary["runs"] = [r["value"] for r in runs]
    summary["repeats"] = repeats
    out = os.environ.get("FP_OUT", "")
    if out:
        Path(out).write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
