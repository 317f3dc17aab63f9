"""Robust weighted least squares + Gauss-Newton on SE(3) (JAX).

Replicates the reference's IRLS formulation (slam/common/optimization.py):
weights ``w_i = sqrt(C(|r_i|)) / clamp(|r_i|, eps)`` for a robust cost C,
then one or more Gauss-Newton steps ``dx = -(J^T J)^{-1} J^T r`` on the
weighted system.  Everything is masked fixed-shape: invalid correspondences
carry zero residual/Jacobian rows and drop out of the 6x6 normal equations,
which makes the whole solve a single fused XLA computation (and the J^T J
contraction an MXU matmul).

Supported schemes (reference optimization.py:61-226): least_square, huber,
exp, neighborhood, geman_mcclure, square_geman_mcclure, cauchy.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from pylidar_slam_tpu.ops import rotation, se3

SCHEMES = ("least_square", "default", "huber", "exp", "neighborhood",
           "geman_mcclure", "square_geman_mcclure", "cauchy")


def robust_cost(scheme: str, residuals: jnp.ndarray, sigma: float,
                sq_dists: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Robust cost C(r) for each residual (elementwise)."""
    r2 = residuals * residuals
    if scheme in ("least_square", "default"):
        return r2
    if scheme == "huber":
        abs_r = jnp.abs(residuals)
        return jnp.where(abs_r < sigma, r2, 2.0 * sigma * abs_r - sigma ** 2)
    if scheme == "exp":
        return r2 * jnp.exp(-r2 / sigma ** 2)
    if scheme == "neighborhood":
        # Weight by confidence in the data association: exp(-||q-p||^2 / sigma^2)
        assert sq_dists is not None, "neighborhood scheme requires sq_dists"
        return r2 * jnp.exp(-sq_dists / sigma ** 2)
    if scheme == "geman_mcclure":
        return sigma * r2 / (sigma + r2)
    if scheme == "square_geman_mcclure":
        return r2 * (sigma / (sigma + r2)) ** 2
    if scheme == "cauchy":
        return jnp.log(1.0 + (residuals / sigma) ** 2)
    raise ValueError(f"Unknown least-square scheme: {scheme}")


def robust_weights(scheme: str, residuals: jnp.ndarray, sigma: float,
                   sq_dists: Optional[jnp.ndarray] = None,
                   eps: float = 1.0e-4) -> jnp.ndarray:
    """IRLS attenuation weights sqrt(C(r)) / clamp(|r|, eps)."""
    if scheme in ("least_square", "default"):
        return jnp.ones_like(residuals)
    clamped = jnp.maximum(jnp.abs(residuals), eps)
    return jnp.sqrt(robust_cost(scheme, residuals, sigma, sq_dists)) / clamped


# ----------------------------------------------------------------------------
# Point-to-plane / point-to-point residuals and analytic Jacobians
# ----------------------------------------------------------------------------

def point_to_plane_residuals(params: jnp.ndarray,
                             target_points: jnp.ndarray,
                             ref_points: jnp.ndarray,
                             ref_normals: jnp.ndarray,
                             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Residuals ((T(params) p - q) . n) for (N, 3) correspondences -> (N,).

    `params` is (6,).  Masked rows are exactly zero.
    """
    mat = se3.build_pose_matrix(params[None])[0]
    transformed = se3.apply_transformation(target_points, mat)
    res = jnp.sum((transformed - ref_points) * ref_normals, axis=-1)
    if mask is not None:
        res = jnp.where(mask, res, 0.0)
    return res


def point_to_plane_jacobian(params: jnp.ndarray,
                            target_points: jnp.ndarray,
                            ref_normals: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Analytic Jacobian of the point-to-plane residuals: (N, 6).

    J[n, p] = (dT/dx_p @ p_n) . n_n  (the reference's einsum contraction,
    optimization.py:381-396, with the (6,4,4) pose-matrix Jacobian).
    """
    jac_mat = rotation.pose_matrix_jacobian(params[None])[0]  # (6, 4, 4)
    jac_rot = jac_mat[:, :3, :3]  # (6, 3, 3)
    jac_tr = jac_mat[:, :3, 3]  # (6, 3)
    # (6, N, 3): derivative of the transformed point wrt each parameter
    dpt = jnp.einsum("pij,nj->pni", jac_rot, target_points) + jac_tr[:, None, :]
    jac = jnp.einsum("pni,ni->np", dpt, ref_normals)  # (N, 6)
    if mask is not None:
        jac = jnp.where(mask[:, None], jac, 0.0)
    return jac


def point_to_point_residuals(params: jnp.ndarray,
                             target_points: jnp.ndarray,
                             ref_points: jnp.ndarray,
                             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Euclidean distance residuals ||T(params) p - q|| -> (N,)."""
    mat = se3.build_pose_matrix(params[None])[0]
    diff = se3.apply_transformation(target_points, mat) - ref_points
    sq = jnp.sum(diff * diff, axis=-1)
    if mask is not None:
        sq = jnp.where(mask, sq, 0.0)
    return jnp.sqrt(jnp.maximum(sq, 1e-20)) * (sq > 0)


def point_to_point_jacobian(params: jnp.ndarray,
                            target_points: jnp.ndarray,
                            ref_points: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Analytic Jacobian of the point-to-point NORM residuals: (N, 6).

    J[n, p] = (dT/dx_p @ p_n) . (T p_n - q_n) / ||T p_n - q_n||.
    (The reference's formulation, optimization.py:488-505, omits the
    normalization -- the Jacobian of the SQUARED distance against a norm
    residual -- which stalls Gauss-Newton; we use the consistent form.)
    """
    jac_mat = rotation.pose_matrix_jacobian(params[None])[0]
    jac_rot = jac_mat[:, :3, :3]
    jac_tr = jac_mat[:, :3, 3]
    dpt = jnp.einsum("pij,nj->pni", jac_rot, target_points) + jac_tr[:, None, :]
    mat = se3.build_pose_matrix(params[None])[0]
    diff = se3.apply_transformation(target_points, mat) - ref_points
    norms = jnp.maximum(jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-9)
    jac = jnp.einsum("pni,ni->np", dpt, diff / norms)
    if mask is not None:
        jac = jnp.where(mask[:, None], jac, 0.0)
    return jac


# ----------------------------------------------------------------------------
# Gauss-Newton
# ----------------------------------------------------------------------------

class GNResult(NamedTuple):
    params: jnp.ndarray  # (6,) optimized parameters
    loss: jnp.ndarray  # scalar: sum of squared weighted residuals
    delta_norm: jnp.ndarray  # scalar: norm of the last step
    singular: jnp.ndarray  # bool: hit a singular 6x6 Hessian


def gauss_newton_step(res: jnp.ndarray, jac: jnp.ndarray,
                      weights: jnp.ndarray,
                      det_threshold: float = 1.0e-7,
                      damping: float = 0.0,
                      axis_name=None,
                      prior_res=None,
                      prior_weight=None):
    """One weighted GN step from residuals (N,), Jacobian (N, 6), weights (N,).

    Returns (dx (6,), loss, singular-flag).  The 6x6 normal equations are
    solved in float32 with a Cholesky factorization; singular systems
    (|det| < det_threshold, the reference's guard optimization.py:334-336)
    return dx = 0 and singular=True.

    `damping` adds Levenberg regularization `damping * trace(H)/6 * I` --
    needed for sparse-map configurations whose normal equations are weakly
    constrained (exact-precision GN otherwise overshoots along the
    near-degenerate directions).

    `prior_res` (6,) + `prior_weight` (6,) add quadratic pose priors to the
    solve: per-parameter cost `prior_weight[i] * (prior_res[i] + dx[i])^2`,
    i.e. identity-Jacobian residuals anchoring the UPDATED pose toward a
    target pose whose current deviation (in the same left-delta parameter
    space as dx) is `prior_res`.  This is the TPU-native equivalent of
    CT-ICP's beta regularizers (constant-velocity / small-velocity /
    orientation-consistency soft constraints, pyct_icp CTICPOptions
    reflected by reference ct_icp_odometry.py:57-105): adds diag(w) to the
    normal matrix and w * prior_res to the gradient -- no extra residual
    rows, no shape changes.

    `axis_name`: inside ``shard_map`` with the point dimension sharded, the
    partial normal equations are psum-ed over this mesh axis before the
    solve (the tiny (6,6)+(6,)+() payload is the ONLY collective of a
    point-sharded ICP iteration -- SURVEY.md section 5.8b).
    """
    wres = res * weights
    wjac = jac * weights[:, None]
    # J^T J as an elementwise outer-product reduction (full f32 on the VPU).
    # The MXU default bf16 pass costs ~0.4% relative error on the normal
    # equations, which measurably degrades trajectory accuracy; N x 36 MACs
    # are trivial, so precision is free here.
    h = jnp.sum(wjac[:, :, None] * wjac[:, None, :], axis=0)
    g = jnp.sum(wjac * wres[:, None], axis=0)
    if axis_name is not None:
        h = jax.lax.psum(h, axis_name)
        g = jax.lax.psum(g, axis_name)
    if prior_res is not None and prior_weight is not None:
        # Prior terms join AFTER the psum: they are global, not per-shard.
        h = h + jnp.diag(prior_weight.astype(h.dtype))
        g = g + (prior_weight * prior_res).astype(g.dtype)
    if damping > 0.0:
        h = h + (damping * jnp.trace(h) / 6.0) * jnp.eye(6, dtype=h.dtype)
    det = jnp.linalg.det(h)
    singular = jnp.abs(det) < det_threshold
    h_safe = jnp.where(singular, jnp.eye(6, dtype=h.dtype), h)
    dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h_safe), g)
    dx = jnp.where(singular, jnp.zeros_like(dx), dx)
    loss = jnp.sum(wres * wres)
    if axis_name is not None:
        loss = jax.lax.psum(loss, axis_name)
    return dx, loss, singular


def gauss_newton(x0: jnp.ndarray,
                 res_fun,
                 jac_fun,
                 max_iters: int = 10,
                 norm_stop_criterion: float = 1.0e-3,
                 scheme: str = "least_square",
                 sigma: float = 0.5,
                 sq_dists: Optional[jnp.ndarray] = None,
                 eps: float = 1.0e-4) -> GNResult:
    """Gauss-Newton loop (lax.while_loop) on a 6-parameter pose.

    `res_fun(x) -> (N,)`, `jac_fun(x) -> (N, 6)`.  Replicates the reference's
    loop structure (optimization.py:296-344): weights from detached residuals,
    early exit on ||res|| < 1e-7 and on ||dx|| < norm_stop_criterion.
    """

    def body(state):
        x, _, _, _, it = state
        jac = jac_fun(x)
        res = res_fun(x)
        weights = robust_weights(scheme, res, sigma, sq_dists, eps)
        dx, loss, singular = gauss_newton_step(res, jac, weights)
        norm_res = jnp.linalg.norm(res)
        # ||res|| < 1e-7 -> keep x unchanged (reference bails out, 324-327)
        degenerate = norm_res < 1.0e-7
        dx = jnp.where(degenerate, jnp.zeros_like(dx), dx)
        new_x = x + dx
        dn = jnp.linalg.norm(dx)
        return new_x, loss, dn, singular, it + 1

    def cond(state):
        _, _, dn, singular, it = state
        return (it < max_iters) & (dn >= norm_stop_criterion) & (~singular)

    init = (x0, jnp.array(jnp.inf, x0.dtype), jnp.array(jnp.inf, x0.dtype),
            jnp.array(False), jnp.array(0, jnp.int32))
    # Always run at least one step (reference: max(max_iters, 1)).
    state = body(init)
    x, loss, dn, singular, it = lax.while_loop(cond, body, state)
    return GNResult(x, loss, dn, singular)
