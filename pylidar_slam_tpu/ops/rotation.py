"""Euler-angle rotation algebra with analytic Jacobians (JAX).

Convention: "xyz" intrinsic composition ``R = Rz(ez) @ Ry(ey) @ Rx(ex)`` with
parameters ordered ``(ex, ey, ez)`` -- the same convention as the reference
implementation (reference slam/common/rotation.py:138-150).  The analytic
``d(pose matrix)/d(params)`` Jacobian drives the point-to-plane Gauss-Newton
solver; a property test verifies it against ``jax.jacfwd``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _rx(c, s):
    """Batched rotation about x from cos/sin, each of shape (B,). Returns (B,3,3)."""
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([o, z, z], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
        jnp.stack([z, s, c], axis=-1),
    ], axis=-2)


def _ry(c, s):
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ], axis=-2)


def _rz(c, s):
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def _jac_rx(c, s):
    """d Rx / d angle, batched."""
    z = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([z, z, z], axis=-1),
        jnp.stack([z, -s, -c], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
    ], axis=-2)


def _jac_ry(c, s):
    z = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([-s, z, c], axis=-1),
        jnp.stack([z, z, z], axis=-1),
        jnp.stack([-c, z, -s], axis=-1),
    ], axis=-2)


def _jac_rz(c, s):
    z = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([-s, -c, z], axis=-1),
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([z, z, z], axis=-1),
    ], axis=-2)


def euler_to_mat(angles: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) [ex, ey, ez] -> rotation matrices (..., 3, 3).

    ``R = Rz(ez) @ Ry(ey) @ Rx(ex)``.
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    return _rz(c[..., 2], s[..., 2]) @ _ry(c[..., 1], s[..., 1]) @ _rx(c[..., 0], s[..., 0])


def np_euler_to_mat(angles) -> "np.ndarray":
    """Pure-numpy ``euler_to_mat`` (``R = Rz @ Ry @ Rx``) for host-side
    dataset code -- eager jnp ops dispatch to the (tunneled) device per call
    and cost milliseconds each in per-frame loader paths."""
    import numpy as np
    angles = np.asarray(angles, np.float64)
    cx, cy, cz = np.cos(angles[..., 0]), np.cos(angles[..., 1]), np.cos(angles[..., 2])
    sx, sy, sz = np.sin(angles[..., 0]), np.sin(angles[..., 1]), np.sin(angles[..., 2])
    out = np.empty(angles.shape[:-1] + (3, 3), np.float64)
    out[..., 0, 0] = cz * cy
    out[..., 0, 1] = cz * sy * sx - sz * cx
    out[..., 0, 2] = cz * sy * cx + sz * sx
    out[..., 1, 0] = sz * cy
    out[..., 1, 1] = sz * sy * sx + cz * cx
    out[..., 1, 2] = sz * sy * cx - cz * sx
    out[..., 2, 0] = -sy
    out[..., 2, 1] = cy * sx
    out[..., 2, 2] = cy * cx
    return out


def mat_to_euler(rot: jnp.ndarray, eps: float = 1.0e-6) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> euler angles (..., 3).

    Singularity-safe (gimbal lock at |cos(ey)| ~ 0) branchless formulation
    matching the reference decomposition (reference rotation.py:253-270).
    """
    sy = jnp.sqrt(rot[..., 0, 0] * rot[..., 0, 0] + rot[..., 1, 0] * rot[..., 1, 0])
    singular = sy < eps

    x_ns = jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2])
    y = jnp.arctan2(-rot[..., 2, 0], sy)
    z_ns = jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])

    x_s = jnp.arctan2(-rot[..., 1, 2], rot[..., 1, 1])

    x = jnp.where(singular, x_s, x_ns)
    z = jnp.where(singular, jnp.zeros_like(z_ns), z_ns)
    return jnp.stack([x, y, z], axis=-1)


def euler_jacobian(angles: jnp.ndarray) -> jnp.ndarray:
    """Analytic dR/d(ex,ey,ez): (B, 3) -> (B, 3, 3, 3).

    Output[b, p] = d R(angles[b]) / d angles[b, p].
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    rz = _rz(c[..., 2], s[..., 2])
    ry = _ry(c[..., 1], s[..., 1])
    rx = _rx(c[..., 0], s[..., 0])
    jx = rz @ ry @ _jac_rx(c[..., 0], s[..., 0])
    jy = rz @ _jac_ry(c[..., 1], s[..., 1]) @ rx
    jz = _jac_rz(c[..., 2], s[..., 2]) @ ry @ rx
    return jnp.stack([jx, jy, jz], axis=-3)


def pose_matrix_jacobian(pose_params: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(4x4 pose matrix)/d(6 params): (B, 6) -> (B, 6, 4, 4).

    Params ordered (tx, ty, tz, ex, ey, ez); the translation block is constant
    identity, the rotation block is `euler_jacobian` -- the contraction target
    of the point-to-plane Jacobian (cf. reference rotation.py:187-216).
    """
    b = pose_params.shape[0]
    dtype = pose_params.dtype
    jac = jnp.zeros((b, 6, 4, 4), dtype=dtype)
    jac = jac.at[:, 0, 0, 3].set(1.0)
    jac = jac.at[:, 1, 1, 3].set(1.0)
    jac = jac.at[:, 2, 2, 3].set(1.0)
    jac = jac.at[:, 3:, :3, :3].set(euler_jacobian(pose_params[:, 3:]))
    return jac


def orthonormalize(rot: jnp.ndarray) -> jnp.ndarray:
    """Projects (..., 3, 3) matrices onto SO(3) via euler round-trip.

    Mirrors the reference's manifold re-normalization
    (reference icp_odometry.py:296-297: from_pose_matrix -> build_pose_matrix).
    """
    return euler_to_mat(mat_to_euler(rot))
