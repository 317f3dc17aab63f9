"""PoseNet deep odometry: per-frame relative pose regression from a trained
checkpoint (capability match of reference slam/odometry/posenet_odometry.py).

Loads ``{train_dir}/config.yaml`` + ``{train_dir}/checkpoint.ckp`` (the
trainer's contract), rebuilds the architecture, and regresses the relative
pose from the stacked previous+current vertex maps with a single jitted
forward (rasterization fused in).
"""
from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from pylidar_slam_tpu.config import MISSING, dataclass_from_dict
from pylidar_slam_tpu.ops import projection, se3
from pylidar_slam_tpu.slam.odometry import ODOMETRY
from pylidar_slam_tpu.slam.odometry.icp_odometry import OdometryConfig
from pylidar_slam_tpu.training.prediction_modules import (
    PoseNetPredictionModule, PredictionConfig)
from pylidar_slam_tpu.utils import assert_debug


@dataclass
class PoseNetOdometryConfig(OdometryConfig):
    algorithm: str = "posenet"
    debug: bool = False
    train_dir: str = MISSING
    train_config_file: str = "config.yaml"
    checkpoint_file: str = "checkpoint.ckp"
    device: str = "tpu"
    pose: str = "euler"
    posenet_config: Dict[str, Any] = field(default_factory=dict)
    num_points_padded: int = 131072


class _PoseNetInference:
    """Shared checkpoint loading + jitted regression (used by the odometry
    and by the PoseNet initialization)."""

    def __init__(self, train_dir: str, train_config_file: str,
                 checkpoint_file: str,
                 projector: Optional[projection.SphericalProjection]):
        tdir = Path(train_dir)
        assert_debug(tdir.exists(), f"train_dir {tdir} does not exist")
        cfg_path = tdir / train_config_file
        ckpt_path = tdir / checkpoint_file
        assert_debug(cfg_path.exists(), f"Missing train config {cfg_path}")
        assert_debug(ckpt_path.exists(), f"Missing checkpoint {ckpt_path}")

        with open(cfg_path) as f:
            train_config = yaml.safe_load(f)
        pred_cfg = dataclass_from_dict(PredictionConfig,
                                       dict(train_config.get("prediction", {})))
        self.prediction = PoseNetPredictionModule(pred_cfg)

        proj_cfg = train_config.get("projector")
        if projector is None and proj_cfg:
            projector = projection.SphericalProjection(
                height=int(proj_cfg["height"]), width=int(proj_cfg["width"]),
                up_fov=float(proj_cfg["up_fov"]),
                down_fov=float(proj_cfg["down_fov"]))
        assert_debug(projector is not None, "PoseNet inference needs a projector")
        self.proj = projector

        with open(ckpt_path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.device_put(state["params"])
        self.batch_stats = jax.device_put(state["batch_stats"])

        prediction = self.prediction
        proj = self.proj

        def regress(params, batch_stats, prev_pts, prev_mask, cur_pts, cur_mask):
            def raster(p, m):
                return projection.build_vertex_map(p, proj, mask=m)
            vm_prev = raster(prev_pts, prev_mask).transpose(2, 0, 1)
            vm_cur = raster(cur_pts, cur_mask).transpose(2, 0, 1)
            stacked = jnp.stack([vm_prev, vm_cur])[None]  # (1, 2, 3, H, W)
            pose_params, pose_matrix, _ = prediction.apply(
                params, batch_stats, stacked, train=False)
            return pose_params[0], pose_matrix[0]

        self._regress = jax.jit(regress)

    def __call__(self, prev_pts, prev_mask, cur_pts, cur_mask):
        return self._regress(self.params, self.batch_stats,
                             prev_pts, prev_mask, cur_pts, cur_mask)


class PoseNetOdometry:
    """Pure deep odometry: one checkpointed forward per frame."""

    def __init__(self, config: PoseNetOdometryConfig,
                 projector: Optional[projection.SphericalProjection] = None,
                 **kwargs):
        if not isinstance(config, PoseNetOdometryConfig):
            config = dataclass_from_dict(PoseNetOdometryConfig, config)
        self.config = config
        self.inference = _PoseNetInference(
            str(config.train_dir), config.train_config_file,
            config.checkpoint_file, projector)
        self._prev = None
        self._params_log: list = []
        self._iter = 0
        self.last_rpose_device = None

    @staticmethod
    def pointcloud_key() -> str:
        return "odometry_pc"

    @staticmethod
    def relative_pose_key() -> str:
        return "odometry_pose"

    def init(self):
        self._prev = None
        self._params_log = []
        self._iter = 0
        self.last_rpose_device = None

    def _pad(self, points: np.ndarray):
        cap = self.config.num_points_padded
        pts = points[:, :3].astype(np.float32)
        pts = pts[~np.isnan(pts).any(axis=1)]
        n = min(len(pts), cap)
        out = np.zeros((cap, 3), np.float32)
        msk = np.zeros((cap,), bool)
        out[:n] = pts[:n]
        msk[:n] = True
        return jnp.asarray(out), jnp.asarray(msk)

    def process_next_frame(self, data_dict: dict):
        key = "numpy_pc" if "numpy_pc" in data_dict else "vertex_map"
        data = np.asarray(data_dict[key])
        if data.ndim == 3:  # vertex map -> point list
            if data.shape[0] == 3:
                data = data.transpose(1, 2, 0)
            data = data.reshape(-1, 3)
        pts, mask = self._pad(data)

        if self._prev is None:
            self._prev = (pts, mask)
            self.last_rpose_device = jnp.eye(4, dtype=jnp.float32)
            self._params_log.append(jnp.zeros((1, 6), jnp.float32))
            data_dict[self.relative_pose_key()] = self.last_rpose_device
            self._iter += 1
            return

        params, rpose = self.inference(self._prev[0], self._prev[1], pts, mask)
        self._prev = (pts, mask)
        self.last_rpose_device = rpose
        self._params_log.append(params[None])
        data_dict[self.relative_pose_key()] = rpose
        self._iter += 1

    def get_relative_poses(self) -> Optional[np.ndarray]:
        if not self._params_log:
            return None
        all_params = np.asarray(jnp.concatenate(self._params_log, axis=0),
                                dtype=np.float64)
        from pylidar_slam_tpu.slam.odometry.icp_odometry import _pose_matrix_f64
        return np.stack([_pose_matrix_f64(p) for p in all_params]).astype(np.float32)


ODOMETRY.register("posenet", PoseNetOdometry, PoseNetOdometryConfig)
