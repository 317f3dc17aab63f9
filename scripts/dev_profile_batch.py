"""Per-stage breakdown of the benchmark path: host prep, H2D upload, and
device batch_step compute, measured separately with real syncs."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.slam.odometry.icp_odometry import (ICPFrameToModel,
                                                         ICPFrameToModelConfig)
from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                SyntheticDatasetLoader)

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
N_BATCHES = int(os.environ.get("N_BATCHES", "6"))

cfg = SyntheticConfig(lidar_height=64, lidar_width=1024,
                      num_frames=BATCH * (N_BATCHES + 2) + 1,
                      num_walls=40, num_pillars=25)
loader = SyntheticDatasetLoader(cfg)
seq = loader.sequences()[0][0][0]
frames = [seq[i]["numpy_pc"] for i in range(len(seq))]

icp_cfg = ICPFrameToModelConfig(
    max_num_alignments=12, reassoc_every=2,
    local_map={"type": "aggregated_local_map", "local_map_size": 20,
               "window_rows": 1, "window_cols": 2, "max_neighbor_dist": 0.6},
    alignment={"gauss_newton_config": {"scheme": "neighborhood",
                                       "sigma": 0.2, "max_iters": 1}},
    num_points_padded=131072, data_key="numpy_pc", batch_size=BATCH)
odom = ICPFrameToModel(icp_cfg, projector=loader.projector())
odom.init()

# ---- host prep: _read_points (NaN scrub + pad) ----
t0 = time.perf_counter()
prepped = []
for f in frames:
    pts, msk = odom._pad_points(f)
    prepped.append((pts, msk))
host_ms = (time.perf_counter() - t0) / len(frames) * 1000
print(f"host prep (scrub+pad)                    {host_ms:8.2f} ms/frame")

# ---- upload: jnp.asarray of one batch, synced ----
for _ in range(2):  # warm
    pb = jnp.asarray(np.stack([p for p, _ in prepped[:BATCH]]))
    mb = jnp.asarray(np.stack([m for _, m in prepped[:BATCH]]))
    np.asarray(pb[0, 0, 0:1])
t0 = time.perf_counter()
for k in range(N_BATCHES):
    sl = prepped[k * BATCH:(k + 1) * BATCH]
    pb = jnp.asarray(np.stack([p for p, _ in sl]))
    mb = jnp.asarray(np.stack([m for _, m in sl]))
    np.asarray(pb[0, 0, 0:1])
upload_ms = (time.perf_counter() - t0) / (N_BATCHES * BATCH) * 1000
print(f"H2D upload (sync, {BATCH}x131k f32+bool)      {upload_ms:8.2f} ms/frame")

# ---- device-only batch_step: preloaded batches, chained ----
dev_batches = []
for k in range(N_BATCHES + 1):
    sl = prepped[1 + k * BATCH:1 + (k + 1) * BATCH]
    pb = jnp.asarray(np.stack([p for p, _ in sl]))
    mb = jnp.asarray(np.stack([m for _, m in sl]))
    dev_batches.append((pb, mb))
np.asarray(dev_batches[-1][0][0, 0, 0:1])

p0, m0 = prepped[0]
odom._map_state = None
odom.init()
odom._map_state = odom._first(odom._map_state, jnp.asarray(p0), jnp.asarray(m0))
state = odom._map_state
delta = jnp.eye(4, dtype=jnp.float32)
rpose = jnp.eye(4, dtype=jnp.float32)

# warm/compile
state, delta, rpose, params, diags = odom._batch_step(state, delta, rpose,
                                                      *dev_batches[0])
np.asarray(params[0, 0:1])

t0 = time.perf_counter()
for k in range(1, N_BATCHES + 1):
    state, delta, rpose, params, diags = odom._batch_step(state, delta, rpose,
                                                          *dev_batches[k])
np.asarray(params[0, 0:1])
dev_ms = (time.perf_counter() - t0) / (N_BATCHES * BATCH) * 1000
print(f"device batch_step (map=20, 12 GN iters)  {dev_ms:8.2f} ms/frame")
print(f"device-only rate: {1000.0 / dev_ms:.1f} scans/s")
total = host_ms + upload_ms + dev_ms
print(f"serial total {total:.2f} ms/frame -> {1000.0/total:.1f} scans/s "
      f"(overlap target: {1000.0/max(dev_ms, upload_ms, host_ms):.1f})")
