"""Motion-prior (initialization) modules.

Each module writes a (4, 4) relative-pose prior under the ``init_rpose`` key
each frame (reference slam/initialization.py:33-70 contract).  Variants:

* **NI** -- identity prior.
* **CV** -- constant velocity: replays the last estimated relative pose.  To
  keep the odometry loop host-sync-free, the CV prior can hold a *device*
  array (the odometry's last pose) and feed it straight back into the next
  jitted step.
* **EI** -- elevation-image 2D prior (see ei_initialization.py; registered
  lazily to keep this module light).
* **PoseNet** -- deep regression prior from a trained checkpoint (registered
  by pylidar_slam_tpu.training when the models stack is imported).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from pylidar_slam_tpu.config import MISSING, Registry


@dataclass
class InitializationConfig:
    type: str = MISSING


class Initialization:
    """Base class: writes the motion prior under `init_rpose`."""

    def __init__(self, config: InitializationConfig, **kwargs):
        self.config = config

    @staticmethod
    def initial_pose_key() -> str:
        return "init_rpose"

    def init(self):
        pass

    def next_frame(self, data_dict: dict, **kwargs):
        data_dict[self.initial_pose_key()] = self.next_initial_pose(
            data_dict=data_dict, **kwargs)

    def next_initial_pose(self, data_dict: Optional[dict] = None, **kwargs):
        return None

    def save_real_motion(self, relative_pose, data_dict: dict):
        """Feeds back the estimated motion of the registered frame."""
        pass


@dataclass
class NIConfig(InitializationConfig):
    type: str = "ni"


class NoInitialization(Initialization):
    """Identity motion prior (reference initialization.py:76-92)."""

    def next_initial_pose(self, data_dict: Optional[dict] = None, **kwargs):
        return None


@dataclass
class CVConfig(InitializationConfig):
    type: str = "cv"


class ConstantVelocityInitialization(Initialization):
    """Constant-velocity prior: replay the last estimated relative pose
    (reference initialization.py:103-119).  Accepts device arrays so the
    odometry's output can be fed back without a host sync."""

    def __init__(self, config: CVConfig, **kwargs):
        super().__init__(config)
        self.initial_estimate = None

    def init(self):
        self.initial_estimate = np.eye(4)

    def next_initial_pose(self, data_dict: Optional[dict] = None, **kwargs):
        return self.initial_estimate

    def save_real_motion(self, relative_pose, data_dict: dict):
        self.initial_estimate = relative_pose


@dataclass
class EIConfig(InitializationConfig):
    """Elevation-image 2D motion prior (reference initialization.py:134-202,
    OpenCV feature alignment replaced by dense BEV phase correlation)."""
    type: str = "ei"
    debug: bool = False
    ni_if_failure: bool = False  # fall back to identity when matching fails
    pixel_size: float = 0.3
    im_size: int = 256
    z_min: float = -3.0
    z_max: float = 5.0
    num_yaw_steps: int = 45
    yaw_range: float = 0.35  # radians; inter-frame rotations are small
    min_score: float = 0.05
    # Keep only points this far above the scan's median height (0 disables).
    # Raw single-scan BEV phase correlation locks onto the EGOCENTRIC
    # ground sampling pattern at zero shift regardless of the true motion
    # (bev.ground_suppressed_mask); structures above ground are world-fixed.
    ground_margin: float = 0.5


class ElevationImageInitialization(Initialization):
    """2D (x, y, yaw) prior from registering consecutive BEV images."""

    def __init__(self, config: EIConfig, **kwargs):
        super().__init__(config)
        self._prev_image = None
        self._last_motion = np.eye(4)

    def init(self):
        self._prev_image = None
        self._last_motion = np.eye(4)

    def _image(self, points: np.ndarray):
        import jax.numpy as jnp
        from pylidar_slam_tpu.ops import bev
        cfg = self.config
        pts = jnp.asarray(points[:, :3], jnp.float32)
        mask = bev.ground_suppressed_mask(pts, margin=cfg.ground_margin) \
            if float(cfg.ground_margin) > 0 else None
        return bev.build_elevation_image(
            pts, mask, pixel_size=cfg.pixel_size, size=cfg.im_size,
            z_min=cfg.z_min, z_max=cfg.z_max)

    def next_initial_pose(self, data_dict: Optional[dict] = None, **kwargs):
        import jax.numpy as jnp
        from pylidar_slam_tpu.ops import bev
        cfg = self.config
        key = "numpy_pc" if "numpy_pc" in data_dict else "vertex_map"
        data = np.asarray(data_dict[key])
        if data.ndim == 3:
            if data.shape[0] == 3:
                data = data.transpose(1, 2, 0)
            data = data.reshape(-1, 3)
        image = self._image(data)
        if self._prev_image is None:
            self._prev_image = image
            return None
        # T maps current-frame coords into previous-frame coords = the
        # relative pose prior the odometry expects.
        result = bev.register_bev(self._prev_image, image,
                                  num_yaw_steps=cfg.num_yaw_steps,
                                  yaw_range=cfg.yaw_range)
        self._prev_image = image
        if float(result.score) < cfg.min_score:
            return None if cfg.ni_if_failure else self._last_motion
        estimate = np.asarray(bev.bev_transform_to_se3(result, cfg.pixel_size),
                              dtype=np.float64)
        self._last_motion = estimate
        return estimate

    def save_real_motion(self, relative_pose, data_dict: dict):
        pass


@dataclass
class PNConfig(InitializationConfig):
    """PoseNet initialization: a trained checkpoint provides the motion prior
    (reference initialization.py:205-282)."""
    type: str = "posenet"
    train_dir: str = MISSING
    checkpoint_file: str = "checkpoint.ckp"
    train_config_file: str = "config.yaml"
    num_points_padded: int = 131072


class PoseNetInitialization(Initialization):
    """Regresses the prior from the previous+current scans via PoseNet."""

    def __init__(self, config: PNConfig, projector=None, **kwargs):
        super().__init__(config)
        from pylidar_slam_tpu.slam.odometry.posenet_odometry import _PoseNetInference
        self.inference = _PoseNetInference(
            str(config.train_dir), config.train_config_file,
            config.checkpoint_file, projector)
        self._prev = None
        self._cap = int(config.num_points_padded)

    def init(self):
        self._prev = None

    def _pad(self, points: np.ndarray):
        import jax.numpy as jnp
        pts = points[:, :3].astype(np.float32)
        pts = pts[~np.isnan(pts).any(axis=1)]
        n = min(len(pts), self._cap)
        out = np.zeros((self._cap, 3), np.float32)
        msk = np.zeros((self._cap,), bool)
        out[:n] = pts[:n]
        msk[:n] = True
        return jnp.asarray(out), jnp.asarray(msk)

    def next_initial_pose(self, data_dict: Optional[dict] = None, **kwargs):
        key = "numpy_pc" if "numpy_pc" in data_dict else "vertex_map"
        data = np.asarray(data_dict[key])
        if data.ndim == 3:
            if data.shape[0] == 3:
                data = data.transpose(1, 2, 0)
            data = data.reshape(-1, 3)
        pts, mask = self._pad(data)
        if self._prev is None:
            self._prev = (pts, mask)
            return None
        _, rpose = self.inference(self._prev[0], self._prev[1], pts, mask)
        self._prev = (pts, mask)
        return rpose  # device array; consumed directly by the jitted odometry


INITIALIZATION = Registry("initialization", type_key="type")
INITIALIZATION.register("ni", NoInitialization, NIConfig)
INITIALIZATION.register("cv", ConstantVelocityInitialization, CVConfig)
INITIALIZATION.register("posenet", PoseNetInitialization, PNConfig)
INITIALIZATION.register("ei", ElevationImageInitialization, EIConfig)
