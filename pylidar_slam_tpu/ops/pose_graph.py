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


# ----------------------------------------------------------------------------
# Host-side float64 solver (the reference-precision path)
# ----------------------------------------------------------------------------
#
# The reference optimizes its graph in double precision through g2o's
# CHOLMOD (slam/backend.py:241-244).  TPUs have no native f64 and the
# tunneled backend pays a retrace + dispatch per graph growth, so the online
# backend solves the (small: <= tens of thousands of poses) graph on the
# host instead: exact-sparse Gauss-Newton with a scipy LU factorization of
# the 6Mx6M normal equations, float64 end-to-end.

def _np_exp_rotation(w):
    import numpy as np
    theta = np.linalg.norm(w, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-10
    safe = np.where(small[..., None], 1.0, theta)
    axis = w / safe
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    zeros = np.zeros_like(axis[..., 0])
    k = np.stack([
        np.stack([zeros, -axis[..., 2], axis[..., 1]], axis=-1),
        np.stack([axis[..., 2], zeros, -axis[..., 0]], axis=-1),
        np.stack([-axis[..., 1], axis[..., 0], zeros], axis=-1),
    ], axis=-2)
    eye = np.broadcast_to(np.eye(3), k.shape)
    rot = eye + s * k + (1.0 - c) * (k @ k)
    return np.where(small[..., None, None], eye + k, rot)


def _np_exp_se3(dx):
    import numpy as np
    mat = np.zeros((*dx.shape[:-1], 4, 4))
    mat[..., :3, :3] = _np_exp_rotation(dx[..., 3:])
    mat[..., :3, 3] = dx[..., :3]
    mat[..., 3, 3] = 1.0
    return mat


def _np_log_rotation(rot):
    import numpy as np
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = np.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = np.arccos(cos_theta)
    sin_theta = np.sqrt(np.maximum(1.0 - cos_theta * cos_theta, 0.0))
    near = cos_theta > 1.0 - 1e-8
    scale = np.where(near, 0.5 + (1.0 - cos_theta) / 6.0,
                     theta / np.maximum(2.0 * sin_theta, 1e-300))
    w = np.stack([rot[..., 2, 1] - rot[..., 1, 2],
                  rot[..., 0, 2] - rot[..., 2, 0],
                  rot[..., 1, 0] - rot[..., 0, 1]], axis=-1)
    return w * scale[..., None]


def _np_inv_pose(mats):
    import numpy as np
    rt = np.swapaxes(mats[..., :3, :3], -1, -2)
    out = np.zeros_like(mats)
    out[..., :3, :3] = rt
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", rt, mats[..., :3, 3])
    out[..., 3, 3] = 1.0
    return out


def optimize_pose_graph_host(poses, edge_i, edge_j, measurements, information,
                             prior_idx=None, prior_measurements=None,
                             prior_information=None,
                             num_iters: int = 30, damping: float = 1.0e-6,
                             fix_first: bool = True,
                             tol: float = 1.0e-10):
    """Float64 sparse Gauss-Newton over (M, 4, 4) absolute poses (host/numpy).

    Same residual definition as ``optimize_pose_graph`` (err =
    Z^-1 Xi^-1 Xj, res = [t, log R], right-multiplicative perturbation);
    Jacobians by vectorized central differences (f64: ~1e-9 accurate, and
    Jacobian error cannot bias the fixed point of GN).  Normal equations are
    solved exactly with scipy's sparse LU -- the CHOLMOD-class direct solve
    of the reference (backend.py:241-244).
    """
    import numpy as np
    from scipy.sparse import csc_matrix
    from scipy.sparse.linalg import splu

    poses = np.asarray(poses, np.float64).copy()
    edge_i = np.asarray(edge_i, np.int64)
    edge_j = np.asarray(edge_j, np.int64)
    z_inv = _np_inv_pose(np.asarray(measurements, np.float64))
    info = np.asarray(information, np.float64)
    m = poses.shape[0]
    e = edge_i.shape[0]
    has_priors = prior_idx is not None and len(np.atleast_1d(prior_idx)) > 0
    if has_priors:
        prior_idx = np.asarray(prior_idx, np.int64)
        pz = np.asarray(prior_measurements, np.float64)
        pinfo = np.asarray(prior_information, np.float64)

    def edge_res(xi, xj):
        err = np.einsum("eij,ejk,ekl->eil", z_inv, _np_inv_pose(xi), xj)
        return np.concatenate(
            [err[:, :3, 3], _np_log_rotation(err[:, :3, :3])], axis=-1)

    def prior_res(xp):
        err = np.einsum("eij,ejk->eik", pz, xp)
        return np.concatenate(
            [err[:, :3, 3], _np_log_rotation(err[:, :3, :3])], axis=-1)

    eps = 1.0e-6
    eye6 = np.eye(6)

    for _ in range(num_iters):
        xi = poses[edge_i]
        xj = poses[edge_j]
        res = edge_res(xi, xj)

        # Central-difference Jacobians, vectorized over all edges per axis.
        ji = np.empty((e, 6, 6))
        jj = np.empty((e, 6, 6))
        for k in range(6):
            d = _np_exp_se3(eps * eye6[k])
            dm = _np_exp_se3(-eps * eye6[k])
            ji[:, :, k] = (edge_res(xi @ d, xj) - edge_res(xi @ dm, xj)) / (2 * eps)
            jj[:, :, k] = (edge_res(xi, xj @ d) - edge_res(xi, xj @ dm)) / (2 * eps)

        # g = J^T I r ; H blocks = J^T I J, assembled as sparse COO.
        i_r = np.einsum("epq,eq->ep", info, res)
        g = np.zeros((m, 6))
        np.add.at(g, edge_i, np.einsum("epa,ep->ea", ji, i_r))
        np.add.at(g, edge_j, np.einsum("epa,ep->ea", jj, i_r))

        i_ji = np.einsum("epq,eqa->epa", info, ji)
        i_jj = np.einsum("epq,eqa->epa", info, jj)
        hii = np.einsum("epa,epb->eab", ji, i_ji)
        hij = np.einsum("epa,epb->eab", ji, i_jj)
        hji = np.swapaxes(hij, -1, -2)
        hjj = np.einsum("epa,epb->eab", jj, i_jj)

        blocks = [hii, hij, hji, hjj]
        rows_ = [edge_i, edge_i, edge_j, edge_j]
        cols_ = [edge_i, edge_j, edge_i, edge_j]

        if has_priors:
            xp = poses[prior_idx]
            pres = prior_res(xp)
            pjac = np.empty((len(prior_idx), 6, 6))
            for k in range(6):
                d = _np_exp_se3(eps * eye6[k])
                dm = _np_exp_se3(-eps * eye6[k])
                pjac[:, :, k] = (prior_res(xp @ d) - prior_res(xp @ dm)) / (2 * eps)
            ip_r = np.einsum("epq,eq->ep", pinfo, pres)
            np.add.at(g, prior_idx, np.einsum("epa,ep->ea", pjac, ip_r))
            i_pj = np.einsum("epq,eqa->epa", pinfo, pjac)
            blocks.append(np.einsum("epa,epb->eab", pjac, i_pj))
            rows_.append(prior_idx)
            cols_.append(prior_idx)

        # Assemble 6Mx6M sparse normal equations from the 6x6 blocks.
        off = np.arange(6)
        data, rr, cc = [], [], []
        for blk, bi, bj in zip(blocks, rows_, cols_):
            n_b = blk.shape[0]
            r_idx = (bi[:, None, None] * 6 + off[None, :, None])
            c_idx = (bj[:, None, None] * 6 + off[None, None, :])
            data.append(blk.reshape(n_b, -1).ravel())
            rr.append(np.broadcast_to(r_idx, (n_b, 6, 6)).ravel())
            cc.append(np.broadcast_to(c_idx, (n_b, 6, 6)).ravel())
        data = np.concatenate(data)
        rr = np.concatenate(rr)
        cc = np.concatenate(cc)

        b = -g.reshape(-1)
        if fix_first:
            # Gauge fix: drop pose-0 rows/cols, pin its block to identity.
            keep = (rr >= 6) & (cc >= 6)
            data, rr, cc = data[keep], rr[keep], cc[keep]
            data = np.concatenate([data, np.ones(6)])
            rr = np.concatenate([rr, off])
            cc = np.concatenate([cc, off])
            b[:6] = 0.0
        data = np.concatenate([data, np.full(6 * m, damping)])
        diag_all = np.arange(6 * m)
        rr = np.concatenate([rr, diag_all])
        cc = np.concatenate([cc, diag_all])

        h_mat = csc_matrix((data, (rr, cc)), shape=(6 * m, 6 * m))
        try:
            dx = splu(h_mat).solve(b).reshape(m, 6)
        except RuntimeError:  # singular factorization
            break
        if fix_first:
            dx[0] = 0.0
        poses = poses @ _np_exp_se3(dx)
        if float(np.linalg.norm(dx)) < tol:
            break

    # Re-orthonormalize rotations accumulated over many compositions.
    u, _, vt = np.linalg.svd(poses[:, :3, :3])
    det = np.linalg.det(u @ vt)
    d = np.stack([np.ones_like(det), np.ones_like(det), det], axis=-1)
    poses[:, :3, :3] = u @ (d[:, :, None] * vt)
    return poses
