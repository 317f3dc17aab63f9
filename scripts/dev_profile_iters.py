"""Decompose the batched ICP device step's per-frame cost.

Times the aggregated-map `_batch_step` at several (max_num_alignments,
reassoc_every) settings and fits per-GN-iteration / per-rasterization /
fixed costs, so optimization effort goes where the milliseconds are.

Usage: python scripts/dev_profile_iters.py   (TPU; ~6 compiles of ~1 min)
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

BATCH = int(os.environ.get("PROF_BATCH", "12"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp

    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticDatasetLoader)
    from pylidar_slam_tpu.slam.odometry.icp_odometry import (
        ICPFrameToModel, ICPFrameToModelConfig)

    loader = SyntheticDatasetLoader(SyntheticConfig(
        lidar_height=64, lidar_width=1024, num_frames=2 * BATCH + 1,
        num_walls=40, num_pillars=25))
    seq = loader.sequences()[0][0][0]
    frames = [seq[i]["numpy_pc"] for i in range(len(seq))]

    def build(iters, reassoc):
        cfg = ICPFrameToModelConfig(
            max_num_alignments=iters, reassoc_every=reassoc,
            local_map={"type": "aggregated_local_map", "local_map_size": 20,
                       "window_rows": 1, "window_cols": 2,
                       "max_neighbor_dist": 0.6},
            alignment={"gauss_newton_config": {"scheme": "geman_mcclure",
                                               "sigma": 0.3,
                                               "max_iters": 1}},
            num_points_padded=66560, data_key="numpy_pc",
            batch_size=BATCH, upload_format="rimg8", async_upload=False)
        odom = ICPFrameToModel(cfg, projector=loader.projector())
        odom.init()
        return odom

    def time_batch(odom):
        """Feeds 2 batches (compile + warm), then times REPS re-runs of the
        second batch's device execution only (upload excluded: the stacked
        buffer is reused)."""
        for f in frames[: 2 * BATCH + 1]:
            odom.process_next_frame({"numpy_pc": f})
        # reuse the internal stacked upload from the last flush
        bufs = [odom.encode_upload(f[:, :3]) for f in frames[1: BATCH + 1]]
        pts, msks = odom._stack_and_upload(bufs)
        np.asarray(jax.block_until_ready(pts)[0, 0])  # real sync via fetch
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = odom._batch_step(odom._map_state, odom._delta_since_update,
                                   odom.last_rpose_device, pts, msks)
            np.asarray(out[3])  # params fetch = tunnel-honest sync
            best = min(best, time.perf_counter() - t0)
        return 1e3 * best / BATCH

    results = {}
    for iters, reassoc in ((12, 4), (12, 12), (6, 4), (6, 6), (2, 2),
                           (12, 2)):
        ms = time_batch(build(iters, reassoc))
        n_raster = 1 + (iters - 1) // reassoc
        results[(iters, reassoc)] = (ms, n_raster)
        print(f"iters={iters:2d} reassoc={reassoc:2d} rasterizations~{n_raster} "
              f"-> {ms:6.2f} ms/frame", flush=True)

    # Least-squares fit: ms = c0 + c_it * iters + c_ras * rasterizations
    a = np.array([[1.0, it, r] for (it, _), (_, r) in results.items()])
    y = np.array([ms for ms, _ in results.values()])
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    print(f"fit: fixed={coef[0]:.2f} ms  per-GN-iter={coef[1]:.3f} ms  "
          f"per-rasterization={coef[2]:.3f} ms")


if __name__ == "__main__":
    main()
