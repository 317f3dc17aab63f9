"""SE(3) pose-graph optimization in pure JAX (the g2o replacement).

The reference's backend drives g2o's C++ SparseOptimizer
(BlockSolverSE3 + CHOLMOD + Levenberg, slam/backend.py:241-397).  The
TPU-native equivalent is a Gauss-Newton loop whose normal equations are
solved **matrix-free** with preconditioned conjugate gradients:

* per-edge residuals r_e = [t, log_rot] of (Z^-1 X_i^-1 X_j) and their 6+6
  Jacobians come from vmapped forward-mode autodiff at the zero perturbation
  (right-multiplicative local parameterization X <- X Exp(dx));
* H v products are one vmap over edges + two segment-sums -- no sparse
  matrix is ever materialized, so graphs of tens of thousands of poses fit
  trivially and every step is dense batched arithmetic (TPU-friendly);
* block-Jacobi (6x6 per pose) preconditioning, Levenberg damping, and a
  gauge fix on pose 0.

Absolute (GPS-style) constraints are unary priors with their own
information, equivalent to the reference's fixed-gps-vertex + identity-edge
construction (backend.py:313-329).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops import se3


def log_rotation(rot: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: (..., 3, 3) -> (..., 3) axis-angle.

    Differentiable at the identity: arccos'(1) is infinite, so the
    near-identity branch uses a Taylor expansion of theta/(2 sin theta) in
    (1 - cos theta) with the where-trick keeping both branches NaN-free
    (this log sits inside jacfwd in the pose-graph solver, where edge errors
    ARE near identity).
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    near = cos_theta > 1.0 - 1e-4
    # Safe input for the exact branch (gradients stay finite)
    c_safe = jnp.where(near, 1.0 - 1e-4, cos_theta)
    theta = jnp.arccos(c_safe)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - c_safe * c_safe, 1e-12))
    scale_exact = theta / (2.0 * sin_theta)
    # theta^2 ~ 2 (1 - c); theta/(2 sin) ~ 0.5 + theta^2/12 + 7 theta^4/720
    t2 = 2.0 * (1.0 - cos_theta)
    scale_taylor = 0.5 + t2 / 12.0 + 7.0 * t2 * t2 / 720.0
    scale = jnp.where(near, scale_taylor, scale_exact)

    w = jnp.stack([rot[..., 2, 1] - rot[..., 1, 2],
                   rot[..., 0, 2] - rot[..., 2, 0],
                   rot[..., 1, 0] - rot[..., 0, 1]], axis=-1)
    return w * scale[..., None]


def exp_rotation(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exp map: (..., 3) axis-angle -> (..., 3, 3) (Rodrigues)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    safe = jnp.where(small[..., None], 1.0, theta)
    axis = w / safe
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    zeros = jnp.zeros_like(axis[..., 0])
    k = jnp.stack([
        jnp.stack([zeros, -axis[..., 2], axis[..., 1]], axis=-1),
        jnp.stack([axis[..., 2], zeros, -axis[..., 0]], axis=-1),
        jnp.stack([-axis[..., 1], axis[..., 0], zeros], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    rot = eye + s * k + (1.0 - c) * (k @ k)
    return jnp.where(small[..., None, None], eye + k, rot)


def exp_se3(dx: jnp.ndarray) -> jnp.ndarray:
    """Small (..., 6) perturbation [t, w] -> (..., 4, 4) transform.

    First-order coupling (t applied directly) -- adequate for GN updates."""
    rot = exp_rotation(dx[..., 3:])
    mat = jnp.zeros((*dx.shape[:-1], 4, 4), dx.dtype)
    mat = mat.at[..., :3, :3].set(rot)
    mat = mat.at[..., :3, 3].set(dx[..., :3])
    mat = mat.at[..., 3, 3].set(1.0)
    return mat


def _edge_residual(xi: jnp.ndarray, xj: jnp.ndarray, z_inv: jnp.ndarray,
                   dxi: jnp.ndarray, dxj: jnp.ndarray) -> jnp.ndarray:
    """Residual of one edge at perturbations (dxi, dxj): (6,)."""
    xi_p = xi @ exp_se3(dxi)
    xj_p = xj @ exp_se3(dxj)
    err = z_inv @ se3.inverse_pose_matrix(xi_p[None])[0] @ xj_p
    return jnp.concatenate([err[:3, 3], log_rotation(err[:3, :3])])


class PoseGraph(NamedTuple):
    """Static-shape edge arrays (pad with zero-information edges)."""
    edge_i: jnp.ndarray  # (E,) int32 source pose index
    edge_j: jnp.ndarray  # (E,) int32 target pose index
    measurements: jnp.ndarray  # (E, 4, 4) Z_ij (j expressed in i)
    information: jnp.ndarray  # (E, 6, 6)
    prior_idx: jnp.ndarray  # (P,) int32 pose index of unary priors
    prior_measurements: jnp.ndarray  # (P, 4, 4)
    prior_information: jnp.ndarray  # (P, 6, 6)


def optimize_pose_graph(poses: jnp.ndarray,
                        graph: PoseGraph,
                        num_iters: int = 20,
                        cg_iters: int = 50,
                        damping: float = 1.0e-6,
                        fix_first: bool = True) -> jnp.ndarray:
    """Optimizes (M, 4, 4) absolute poses against the graph's constraints.

    Jit-compatible; shapes are static in (M, E, P).
    """
    m = poses.shape[0]
    dtype = poses.dtype
    z_inv = se3.inverse_pose_matrix(graph.measurements)
    pz_inv = se3.inverse_pose_matrix(graph.prior_measurements)

    def edge_res_jac(xi, xj, zi):
        zero = jnp.zeros(6, dtype)
        res = _edge_residual(xi, xj, zi, zero, zero)
        ji = jax.jacfwd(lambda d: _edge_residual(xi, xj, zi, d, zero))(zero)
        jj = jax.jacfwd(lambda d: _edge_residual(xi, xj, zi, zero, d))(zero)
        return res, ji, jj

    def prior_res_jac(xi, zi):
        zero = jnp.zeros(6, dtype)

        def res_fn(d):
            xp = xi @ exp_se3(d)
            err = zi @ xp
            return jnp.concatenate([err[:3, 3], log_rotation(err[:3, :3])])

        return res_fn(zero), jax.jacfwd(res_fn)(zero)

    def gn_step(poses, _):
        xi = poses[graph.edge_i]
        xj = poses[graph.edge_j]
        res, ji, jj = jax.vmap(edge_res_jac)(xi, xj, z_inv)
        pres, pjac = jax.vmap(prior_res_jac)(poses[graph.prior_idx], pz_inv)

        info = graph.information
        pinfo = graph.prior_information

        # Gradient g = J^T I r scattered to poses
        gi = jnp.einsum("epd,epq,eq->ed", ji, info, res)
        gj = jnp.einsum("epd,epq,eq->ed", jj, info, res)
        gp = jnp.einsum("epd,epq,eq->ed", pjac, pinfo, pres)
        g = jnp.zeros((m, 6), dtype)
        g = g.at[graph.edge_i].add(gi)
        g = g.at[graph.edge_j].add(gj)
        g = g.at[graph.prior_idx].add(gp)

        # Block-Jacobi preconditioner: per-pose 6x6 diagonal blocks
        hii = jnp.einsum("epa,epq,eqb->eab", ji, info, ji)
        hjj = jnp.einsum("epa,epq,eqb->eab", jj, info, jj)
        hpp = jnp.einsum("epa,epq,eqb->eab", pjac, pinfo, pjac)
        diag = jnp.zeros((m, 6, 6), dtype)
        diag = diag.at[graph.edge_i].add(hii)
        diag = diag.at[graph.edge_j].add(hjj)
        diag = diag.at[graph.prior_idx].add(hpp)
        diag = diag + damping * jnp.eye(6, dtype=dtype)
        diag_inv = jnp.linalg.inv(diag + 1e-8 * jnp.eye(6, dtype=dtype))

        def mask_fixed(v):
            return v.at[0].set(0.0) if fix_first else v

        def hv(v):
            vi = v[graph.edge_i]
            vj = v[graph.edge_j]
            # J v per edge then back through I and J^T
            jv = jnp.einsum("eab,eb->ea", ji, vi) + jnp.einsum("eab,eb->ea", jj, vj)
            ijv = jnp.einsum("eab,eb->ea", info, jv)
            out = jnp.zeros((m, 6), dtype)
            out = out.at[graph.edge_i].add(jnp.einsum("eba,eb->ea", ji, ijv))
            out = out.at[graph.edge_j].add(jnp.einsum("eba,eb->ea", jj, ijv))
            pv = jnp.einsum("eab,eb->ea", pjac, v[graph.prior_idx])
            ipv = jnp.einsum("eab,eb->ea", pinfo, pv)
            out = out.at[graph.prior_idx].add(jnp.einsum("eba,eb->ea", pjac, ipv))
            out = out + damping * v
            return mask_fixed(out)

        def precond(v):
            return mask_fixed(jnp.einsum("mab,mb->ma", diag_inv, v))

        b = mask_fixed(-g)

        def cg_body(state, _):
            x, r, z, p = state
            hp = hv(p)
            rz = jnp.sum(r * z)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-12)
            x = x + alpha * p
            r_new = r - alpha * hp
            z_new = precond(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-12)
            p_new = z_new + beta * p
            return (x, r_new, z_new, p_new), None

        x0 = jnp.zeros((m, 6), dtype)
        r0 = b
        z0 = precond(r0)
        (dx, _, _, _), _ = jax.lax.scan(cg_body, (x0, r0, z0, r0 * 0 + z0),
                                        None, length=cg_iters)
        dx = mask_fixed(dx)
        new_poses = jnp.einsum("mij,mjk->mik", poses, exp_se3(dx))
        return new_poses, jnp.linalg.norm(dx)

    poses, _ = jax.lax.scan(gn_step, poses, None, length=num_iters)
    return poses
