"""Prediction module: wraps PoseNet for training/inference.

Capability match of reference slam/training/prediction_modules.py:31-60:
consumes stacked vertex maps ``(B, 2, 3, H, W)``, emits ``pose_params``
(B, 6) and ``pose_matrix`` (B, 4, 4); when absolute GT poses are present the
relative GT ``inv(gt0) @ gt1`` is emitted under ``ground_truth``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.config import dataclass_from_dict
from pylidar_slam_tpu.models import POSENET
from pylidar_slam_tpu.models.posenet import PoseResNet, PoseResNetConfig
from pylidar_slam_tpu.ops import se3


@dataclass
class PredictionConfig:
    type: str = "poseresnet"
    posenet_config: Dict[str, Any] = field(default_factory=dict)


class PoseNetPredictionModule:
    """Holds the flax module; parameters live in the train state."""

    def __init__(self, config: PredictionConfig, **kwargs):
        if not isinstance(config, PredictionConfig):
            config = dataclass_from_dict(PredictionConfig, config)
        self.config = config
        net_cfg = dataclass_from_dict(PoseResNetConfig,
                                      dict(config.posenet_config or {}))
        self.net_config = net_cfg
        _cls, _cfg_cls = POSENET.get(config.type)
        self.module: PoseResNet = _cls(net_cfg)

    def init_params(self, rng, sample_shape: Tuple[int, ...]):
        """Initializes (params, batch_stats) for an input of `sample_shape`."""
        variables = self.module.init(rng, jnp.zeros(sample_shape, jnp.float32),
                                     train=False)
        return variables["params"], variables.get("batch_stats", {})

    def apply(self, params, batch_stats, vertex_maps: jnp.ndarray,
              train: bool = False):
        """Returns (pose_params (B, 6), pose_matrix (B, 4, 4), new_batch_stats)."""
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.module.apply(
                variables, vertex_maps, train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            out = self.module.apply(variables, vertex_maps, train=False)
            new_stats = batch_stats
        pose_params = out[:, 0, :]  # num_out_poses = 1
        pose_matrix = se3.build_pose_matrix(pose_params)
        return pose_params, pose_matrix, new_stats


def relative_ground_truth(absolute_gt: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 4, 4) absolute GT pair -> (B, 4, 4) relative inv(gt0) @ gt1."""
    inv0 = se3.inverse_pose_matrix(absolute_gt[:, 0])
    return jnp.einsum("bij,bjk->bik", inv0, absolute_gt[:, 1])
