"""PoseResNet: regresses 6-DoF relative pose(s) from stacked vertex maps.

Capability match of reference slam/models/posenet.py:19-78: a ResNet encoder
over a stacked pair of vertex maps, global average pool, separate
rotation/translation heads with the 0.1 rotation scaling and small-init
weights that stabilize training (posenet.py:46-61).

Input layout: the public contract is the reference's ``(B, seq, 3, H, W)``;
internally converted to NHWC with channels stacked: ``(B, H, W, seq*3)``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pylidar_slam_tpu.config import MISSING
from pylidar_slam_tpu.models import POSENET
from pylidar_slam_tpu.models.resnet import ResNetEncoder


@dataclass
class PoseResNetConfig:
    type: str = "poseresnet"
    num_input_channels: int = 3
    sequence_len: int = 2
    num_out_poses: int = 1
    resnet_model: int = 18
    activation: str = "relu"
    regression_activation: str = "relu"


class PoseResNet(nn.Module):
    config: Any  # PoseResNetConfig

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, seq, C, H, W) stacked vertex maps -> (B, num_out_poses, 6)."""
        cfg = self.config
        b, seq, c, h, w = frames.shape
        assert seq == cfg.sequence_len and c == cfg.num_input_channels, (
            f"Expected (B, {cfg.sequence_len}, {cfg.num_input_channels}, H, W), "
            f"got {frames.shape}")
        # (B, seq, C, H, W) -> (B, H, W, seq*C)
        x = frames.reshape(b, seq * c, h, w).transpose(0, 2, 3, 1)

        features = ResNetEncoder(model=cfg.resnet_model,
                                 activation=cfg.activation)(x, train)
        pooled = jnp.mean(features, axis=(1, 2))  # (B, 512 * expansion)

        small_init = nn.initializers.variance_scaling(
            0.01 ** 2, "fan_avg", "uniform")  # ~ xavier_uniform gain 0.01
        rot = nn.Dense(3 * cfg.num_out_poses, use_bias=False,
                       kernel_init=small_init, name="fc_rot")(pooled)
        trans = nn.Dense(3 * cfg.num_out_poses,
                         kernel_init=small_init, name="fc_trans")(pooled)
        rot = 0.1 * rot  # rotation scaling for stable training (posenet.py:61)

        pose_params = jnp.concatenate([
            trans.reshape(b, cfg.num_out_poses, 3),
            rot.reshape(b, cfg.num_out_poses, 3)], axis=-1)
        return pose_params


POSENET.register("poseresnet", PoseResNet, PoseResNetConfig)
