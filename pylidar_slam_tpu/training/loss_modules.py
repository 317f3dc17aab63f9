"""Training losses for PoseNet (pure-functional JAX).

Capability match of reference slam/training/loss_modules.py:

* **Unsupervised point-to-plane** (loss_modules.py:39-129): normal map of the
  reference vertex map, predicted-pose transform of the target map, in-graph
  re-projection (the differentiable scatter: gradients flow through the
  gathered point values, straight-through on the scatter indices), masked
  robust point-to-plane residuals, squared-cost normalized mean.
* **Supervised** (loss_modules.py:210-279): L1/L2 on translation +
  rotation-in-degrees, with fixed weights or learned exponential
  uncertainty weighting ``sum_i l_i e^{-s_i} + s_i``.

Loss functions take explicit pytrees and return ``(loss, logs)``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.config import MISSING
from pylidar_slam_tpu.ops import geometry, optimization, projection, se3


@dataclass
class LossConfig:
    mode: str = MISSING


@dataclass
class PointToPlaneLossConfig(LossConfig):
    mode: str = "unsupervised"
    least_square_scheme: Dict[str, Any] = field(
        default_factory=lambda: dict(scheme="geman_mcclure", sigma=0.5))


@dataclass
class SupervisedLossConfig(LossConfig):
    mode: str = "supervised"
    loss_degrees: bool = True
    loss_weights: List[float] = field(default_factory=lambda: [1.0, 1.0])
    with_exp_weights: bool = False
    init_weights: List[float] = field(default_factory=lambda: [-3.0, -3.0])
    loss_option: str = "l2"


def point_to_plane_loss(vertex_maps: jnp.ndarray,
                        pose_params: jnp.ndarray,
                        proj: projection.SphericalProjection,
                        scheme: str = "geman_mcclure",
                        sigma: float = 0.5,
                        normals_kernel_size: int = 5):
    """Unsupervised loss. vertex_maps: (B, 2, 3, H, W) [ref, target];
    pose_params: (B, 6) predicted target->ref pose.  Returns (loss, logs)."""
    b, s, _, h, w = vertex_maps.shape
    assert s == 2
    # Channels-last per-frame images
    ref_vm = vertex_maps[:, 0].transpose(0, 2, 3, 1)  # (B, H, W, 3)
    tgt_vm = vertex_maps[:, 1].transpose(0, 2, 3, 1)

    ref_nm = jax.vmap(lambda v: geometry.compute_normal_map(v, normals_kernel_size))(ref_vm)

    pose_mats = se3.build_pose_matrix(pose_params)

    def per_example(tgt, ref, nrm, mat):
        pts = tgt.reshape(-1, 3)
        mask = jnp.max(jnp.abs(pts), axis=-1) > 0
        transformed = se3.apply_transformation(pts[None], mat[None])[0]
        transformed = jnp.where(mask[:, None], transformed, 0.0)
        # In-graph re-projection: indices are non-differentiable
        # (straight-through), values carry gradients.
        vm_trans = projection.build_vertex_map(transformed, proj, mask=mask)

        pc_t = vm_trans.reshape(-1, 3)
        pc_r = ref.reshape(-1, 3)
        n_r = nrm.reshape(-1, 3)
        m = (jnp.max(jnp.abs(pc_t), -1) > 0) & (jnp.max(jnp.abs(pc_r), -1) > 0) \
            & (jnp.max(jnp.abs(n_r), -1) > 0)
        residuals = jnp.where(
            m, jnp.abs(jnp.sum((pc_r - pc_t) * n_r, axis=-1)), 0.0)
        sq_dists = jnp.sum((pc_r - pc_t) ** 2, axis=-1)
        cost = optimization.robust_cost(scheme, residuals, sigma, sq_dists)
        # squared-cost normalized sum (reference loss_modules.py:104-105)
        return jnp.sum(cost * cost) / jnp.maximum(jnp.sum(m), 1)

    losses = jax.vmap(per_example)(tgt_vm, ref_vm, ref_nm, pose_mats)
    loss = losses.mean()
    return loss, {"loss_icp": loss}


def supervised_loss(pose_params: jnp.ndarray,
                    ground_truth: jnp.ndarray,
                    config: SupervisedLossConfig,
                    exp_s: Optional[jnp.ndarray] = None):
    """Supervised pose loss. pose_params (B, 6); ground_truth (B, 4, 4)
    relative GT; exp_s: optional (2,) learned log-variance weights."""
    gt_params = se3.from_pose_matrix(ground_truth.astype(pose_params.dtype))

    def l1(x, y):
        return jnp.abs(x - y).sum(axis=1).mean()

    def crit(x, y):
        if config.loss_option == "l1":
            return l1(x, y)
        return ((x - y) ** 2).sum(axis=1).mean()

    if config.loss_degrees:
        scale = 180.0 / jnp.pi
        loss_rot = crit(pose_params[:, 3:] * scale, gt_params[:, 3:] * scale)
        rot_l1 = l1(pose_params[:, 3:] * scale, gt_params[:, 3:] * scale)
    else:
        loss_rot = crit(pose_params[:, 3:], gt_params[:, 3:])
        rot_l1 = l1(pose_params[:, 3:], gt_params[:, 3:])

    loss_trans = crit(pose_params[:, :3], gt_params[:, :3])
    trans_l1 = l1(pose_params[:, :3], gt_params[:, :3])

    logs = {"loss_rot": loss_rot, "loss_trans": loss_trans,
            "loss_rot_l1": rot_l1, "loss_trans_l1": trans_l1}

    if config.with_exp_weights:
        assert exp_s is not None, "with_exp_weights requires the s parameters"
        # sum_i l_i e^{-s_i} + s_i (reference ExponentialWeights, 134-184)
        loss = (loss_trans * jnp.exp(-exp_s[0]) + exp_s[0]
                + loss_rot * jnp.exp(-exp_s[1]) + exp_s[1])
        logs["s_trans"] = exp_s[0]
        logs["s_rot"] = exp_s[1]
    else:
        w = config.loss_weights
        loss = loss_trans * w[0] + loss_rot * w[1]
    logs["loss"] = loss
    return loss, logs
