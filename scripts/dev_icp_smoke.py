"""Dev smoke test: run fused ICP odometry over a synthetic sequence (CPU)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = os.environ.get("SMOKE_PLATFORM", "cpu")
import jax
jax.config.update("jax_platforms", os.environ.get("SMOKE_PLATFORM", "cpu"))

import numpy as np

from pylidar_slam_tpu.config import dataclass_from_dict
from pylidar_slam_tpu.dataset.synthetic import SyntheticConfig, SyntheticDatasetLoader
from pylidar_slam_tpu.slam.odometry.icp_odometry import ICPFrameToModel, ICPFrameToModelConfig
from pylidar_slam_tpu.slam.initialization import ConstantVelocityInitialization, CVConfig
from pylidar_slam_tpu.eval import eval_odometry as ev

H, W = int(os.environ.get("SMOKE_H", 32)), int(os.environ.get("SMOKE_W", 256))
FRAMES = int(os.environ.get("SMOKE_FRAMES", 25))

cfg = SyntheticConfig(lidar_height=H, lidar_width=W, num_frames=FRAMES)
loader = SyntheticDatasetLoader(cfg)
seq = loader.sequences()[0][0][0]
proj = loader.projector()

icp_cfg = ICPFrameToModelConfig(
    max_num_alignments=15,
    local_map={"local_map_size": 10, "normals_kernel_size": 5},
    alignment={"gauss_newton_config": {"scheme": "geman_mcclure", "sigma": 0.3}},
    num_points_padded=H * W,
    data_key="numpy_pc",
)
odom = ICPFrameToModel(icp_cfg, projector=proj)
odom.init()
init = ConstantVelocityInitialization(CVConfig())
init.init()

t0 = time.time()
for i in range(len(seq)):
    d = seq[i]
    init.next_frame(d)
    odom.process_next_frame(d)
    init.save_real_motion(d["odometry_pose"], d)
    if i in (1, 2) or i % 10 == 0:
        r = odom.last_result
        if r is not None:
            print(f"frame {i}: iters={int(r.num_iters)} loss={float(r.loss):.4f} "
                  f"matches={int(r.num_matches)} inserted={bool(r.inserted)}")
print(f"total {time.time()-t0:.1f}s for {FRAMES} frames")

rel_pred = odom.get_relative_poses().astype(np.float64)
rel_gt = loader.get_ground_truth("synth_00")[:FRAMES]
abs_pred = ev.compute_absolute_poses(rel_pred)
abs_gt = ev.compute_absolute_poses(rel_gt)
ate, std = ev.compute_ate(rel_pred, rel_gt)
are, _ = ev.compute_are(rel_pred, rel_gt)
end_err = np.linalg.norm(abs_pred[-1][:3, 3] - abs_gt[-1][:3, 3])
print(f"ATE={ate:.4f}m +-{std:.4f}  ARE={are:.5f}  end_pos_err={end_err:.3f}m "
      f"over {np.linalg.norm(np.diff(abs_gt[:, :3, 3], axis=0), axis=1).sum():.1f}m traveled")

err = np.linalg.norm(rel_pred[:, :3, 3] - rel_gt[:, :3, 3], axis=1)
print("per-frame trans err:", np.array2string(err, precision=3, max_line_width=120))
