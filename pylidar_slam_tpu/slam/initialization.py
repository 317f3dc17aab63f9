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


INITIALIZATION = Registry("initialization", type_key="type")
INITIALIZATION.register("ni", NoInitialization, NIConfig)
INITIALIZATION.register("cv", ConstantVelocityInitialization, CVConfig)
