"""Benchmark: fused ICP frame-to-model odometry throughput (scans/sec/chip).

Runs the flagship jitted odometry step over KITTI-resolution scans
(64 x 1024 vertex maps, ~100k points/scan, local map of 20 frames, up to 10
ICP iterations/frame) and reports steady-state scans/sec on the attached
device (one TPU chip under the driver).

If KITTI data is available via $KITTI_ODOM_ROOT it is used; otherwise the
occlusion-aware synthetic dataset generates equivalent scans.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "scans/sec", "vs_baseline": N}

Baseline: the reference's best-accuracy configuration runs at 5.34 scans/s
(187.256 ms/frame, docs/results/KITTI/kitti_benchmark.md:9 -> BASELINE.md).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

REFERENCE_SCANS_PER_SEC = 1000.0 / 187.256  # 5.34 scans/s (BASELINE.md)

# Defaults keep the timed region aligned to full device batches (batch=8):
# warmup = first frame + one full batch; timed = 6 batches.
NUM_FRAMES = int(os.environ.get("BENCH_FRAMES", "57"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "9"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def load_frames():
    """Loads NUM_FRAMES scans: KITTI seq 00 if mounted, else synthetic."""
    kitti_root = os.environ.get("KITTI_ODOM_ROOT")
    if kitti_root and Path(kitti_root).exists():
        from pylidar_slam_tpu.dataset.kitti_dataset import (KITTIConfig,
                                                            KITTIDatasetLoader)
        loader = KITTIDatasetLoader(KITTIConfig(kitti_sequence_dir=kitti_root,
                                                train_sequences=["00"]))
        seq = loader.sequences()[0][0][0]
        frames = [seq[i]["numpy_pc"][:, :3] for i in range(NUM_FRAMES)]
        return frames, loader.projector(), "kitti-00"
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticDatasetLoader)
    cfg = SyntheticConfig(lidar_height=64, lidar_width=1024,
                          num_frames=NUM_FRAMES, num_walls=40, num_pillars=25)
    loader = SyntheticDatasetLoader(cfg)
    seq = loader.sequences()[0][0][0]
    frames = [seq[i]["numpy_pc"] for i in range(NUM_FRAMES)]
    return frames, loader.projector(), "synthetic-kitti64x1024"


def main():
    import jax
    import jax.numpy as jnp

    from pylidar_slam_tpu.slam.odometry.icp_odometry import (
        ICPFrameToModel, ICPFrameToModelConfig)

    frames, proj, source = load_frames()

    # The tuned accuracy configuration (synthetic tr_err 0.57%, meeting the
    # BASELINE accuracy bar): neighborhood-weighted GN, reassociation every
    # 2 iterations, f32 uploads (int16 quantization costs ~0.3pt tr_err).
    icp_cfg = ICPFrameToModelConfig(
        max_num_alignments=12,
        reassoc_every=2,
        local_map={"type": "aggregated_local_map", "local_map_size": 20,
                   "window_rows": 1, "window_cols": 2,
                   "max_neighbor_dist": 0.6},
        alignment={"gauss_newton_config": {"scheme": "neighborhood",
                                           "sigma": 0.2, "max_iters": 1}},
        num_points_padded=131072,
        data_key="numpy_pc",
        batch_size=BATCH,
        upload_quantization=float(os.environ.get("BENCH_QUANT", "0.0")),
    )
    odom = ICPFrameToModel(icp_cfg, projector=proj)
    odom.init()

    last_rpose = np.eye(4, dtype=np.float32)

    def run_frame(points):
        nonlocal last_rpose
        d = {"numpy_pc": points, "init_rpose": last_rpose}
        odom.process_next_frame(d)
        last_rpose = d.get("odometry_pose", last_rpose)

    # Warmup (compilation + map fill); sync so queued warmup work doesn't
    # bleed into the timed region.
    for i in range(WARMUP):
        run_frame(frames[i % len(frames)])
    _ = np.asarray(odom.last_rpose_device)

    # Steady state timing
    bench_frames = frames[WARMUP:] if len(frames) > WARMUP else frames
    t0 = time.perf_counter()
    for points in bench_frames:
        run_frame(points)
    # Force a REAL sync: np.asarray of a fresh device result drains the queue
    # (block_until_ready alone does not synchronize on tunneled platforms).
    _ = np.asarray(odom.last_rpose_device)
    elapsed = time.perf_counter() - t0

    scans_per_sec = len(bench_frames) / elapsed
    result = {
        "metric": f"ICP odometry throughput ({source}, 64x1024, map=20, accuracy config)",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
