"""SE(3) pose utilities (JAX) + host-side pose interpolation.

The pose parameterization is ``(tx, ty, tz, ex, ey, ez)`` (euler "xyz"),
matching the reference's ``Pose("euler")`` (reference slam/common/pose.py:52-272).
All device functions are batched and jit-friendly; ``PosesInterpolator`` is a
host-side numpy utility used by datasets (slerp + lerp over timestamps).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.ops import rotation

NUM_POSE_PARAMS = 6


def build_pose_matrix(params: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) params -> (B, 4, 4) pose matrices."""
    b = params.shape[0]
    rot = rotation.euler_to_mat(params[:, 3:])
    mat = jnp.zeros((b, 4, 4), dtype=params.dtype)
    mat = mat.at[:, :3, :3].set(rot)
    mat = mat.at[:, :3, 3].set(params[:, :3])
    mat = mat.at[:, 3, 3].set(1.0)
    return mat


def from_pose_matrix(matrices: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, 4) pose matrices -> (B, 6) params."""
    angles = rotation.mat_to_euler(matrices[:, :3, :3])
    return jnp.concatenate([matrices[:, :3, 3], angles], axis=-1)


def inverse_pose_matrix(matrices: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of (..., 4, 4) rigid transforms."""
    rt = jnp.swapaxes(matrices[..., :3, :3], -1, -2)
    t = matrices[..., :3, 3]
    inv = jnp.zeros_like(matrices)
    inv = inv.at[..., :3, :3].set(rt)
    inv = inv.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, t))
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def apply_transformation(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Applies (..., 4, 4) rigid transforms to (..., N, 3) point clouds."""
    rotated = jnp.einsum("...ij,...nj->...ni", pose[..., :3, :3], points)
    return rotated + pose[..., None, :3, 3]


def apply_rotation(vectors: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Applies the rotation part of (..., 4, 4) transforms to (..., N, 3) vectors."""
    return jnp.einsum("...ij,...nj->...ni", pose[..., :3, :3], vectors)


def normalize_pose_matrix(matrices: jnp.ndarray) -> jnp.ndarray:
    """Re-projects the rotation block onto SO(3) (euler round-trip)."""
    params = from_pose_matrix(matrices)
    return build_pose_matrix(params)


def pose_motion_magnitude(delta: jnp.ndarray, lever_m: float = 15.0):
    """Scalar motion of a (4, 4) relative pose: translation norm plus the
    rotation expressed as point displacement at a `lever_m` arm
    (||R - I||_F ~= sqrt(2) * angle for small angles).  Used by the
    motion-gated reassociation in the ICP local maps."""
    return jnp.linalg.norm(delta[:3, 3]) + (lever_m / 1.4142135) * \
        jnp.linalg.norm(delta[:3, :3] - jnp.eye(3, dtype=delta.dtype))


# ----------------------------------------------------------------------------
# Quaternion helpers (used for slerp-based motion de-skew on device)
# ----------------------------------------------------------------------------

def mat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrices -> (..., 4) unit quaternions (w, x, y, z).

    Branchless Shepperd-style extraction (safe for all rotations).
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best via argmax.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternions (w, x, y, z) -> (..., 3, 3) rotations."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Slerp between quaternions. alpha broadcastable (..., 1) or scalar per pair."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for near-parallel quaternions.
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.where(small, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def interpolate_pose(pose: jnp.ndarray, alphas: jnp.ndarray) -> jnp.ndarray:
    """Interpolates between identity and a (4, 4) pose at per-point fractions.

    Used by the motion de-skew ("Distortion") filter: each LiDAR point gets the
    pose ``slerp(I, pose, alpha)`` applied (cf. reference preprocessing.py:177-191).

    Args:
        pose: (4, 4) relative motion over the scan.
        alphas: (N,) in [0, 1] per-point normalized timestamps.

    Returns:
        (N, 3, 3) rotations and (N, 3) translations as a tuple.
    """
    q1 = mat_to_quat(pose[:3, :3])
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=q1.dtype)
    qs = quat_slerp(jnp.broadcast_to(q0, (alphas.shape[0], 4)),
                    jnp.broadcast_to(q1, (alphas.shape[0], 4)),
                    alphas[:, None])
    rots = quat_to_mat(qs)
    trs = alphas[:, None] * pose[:3, 3][None, :]
    return rots, trs


# ----------------------------------------------------------------------------
# Host-side (numpy) pose interpolation for datasets
# ----------------------------------------------------------------------------

def np_mat_to_quat(rot: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz, pure numpy (NO device dispatch: dataset
    loaders call this per frame and eager jnp ops through the tunneled chip
    cost seconds per call-chain)."""
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22
    qw0 = np.sqrt(np.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = np.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                   (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = np.sqrt(np.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = np.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                   (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = np.sqrt(np.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = np.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                   (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = np.sqrt(np.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = np.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                   (m12 + m21) / (4 * qz3), qz3], axis=-1)
    scores = np.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                       -m00 - m11 + m22], axis=-1)
    best = np.argmax(scores, axis=-1)
    qs = np.stack([q0, q1, q2, q3], axis=-2)
    q = np.take_along_axis(
        qs, np.repeat(best[..., None, None], 4, axis=-1), axis=-2)[..., 0, :]
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def np_quat_to_mat(q: np.ndarray) -> np.ndarray:
    """(..., 4) wxyz -> (..., 3, 3), pure numpy."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return np.stack([
        np.stack([r00, r01, r02], axis=-1),
        np.stack([r10, r11, r12], axis=-1),
        np.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def np_quat_slerp(q0: np.ndarray, q1: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    dot = np.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = np.where(dot < 0, -q1, q1)
    dot = np.clip(np.abs(dot), -1.0, 1.0)
    theta = np.arccos(dot)
    sin_theta = np.sin(theta)
    small = sin_theta < 1e-6
    safe_sin = np.where(small, 1.0, sin_theta)
    w0 = np.where(small, 1.0 - alpha, np.sin((1.0 - alpha) * theta) / safe_sin)
    w1 = np.where(small, alpha, np.sin(alpha * theta) / safe_sin)
    q = w0 * q0 + w1 * q1
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class PosesInterpolator:
    """Linear interpolation of (N, 4, 4) poses over timestamps (host-side).

    Slerp on rotations + lerp on translations, mirroring the reference's
    scipy-based ``PosesInterpolator`` (reference pose.py:11-37) without scipy.
    """

    def __init__(self, poses: np.ndarray, timestamps: np.ndarray):
        assert poses.ndim == 3 and poses.shape[1:] == (4, 4)
        order = np.argsort(timestamps)
        self.timestamps = timestamps[order]
        self.poses = poses[order]
        self.quats = np_mat_to_quat(self.poses[:, :3, :3])
        self.min_timestamp = self.timestamps.min()
        self.max_timestamp = self.timestamps.max()

    def __call__(self, query: np.ndarray) -> np.ndarray:
        query = np.clip(query, self.min_timestamp, self.max_timestamp)
        idx = np.searchsorted(self.timestamps, query, side="right") - 1
        idx = np.clip(idx, 0, len(self.timestamps) - 2)
        t0 = self.timestamps[idx]
        t1 = self.timestamps[idx + 1]
        denom = np.where(t1 - t0 <= 0, 1.0, t1 - t0)
        alpha = ((query - t0) / denom).reshape(-1, 1)
        quats = np_quat_slerp(self.quats[idx], self.quats[idx + 1], alpha)
        rots = np_quat_to_mat(quats)
        trs = (1 - alpha) * self.poses[idx, :3, 3] + alpha * self.poses[idx + 1, :3, 3]
        out = np.tile(np.eye(4, dtype=np.float64), (query.shape[0], 1, 1))
        out[:, :3, :3] = rots
        out[:, :3, 3] = trs
        return out


def transform_pointcloud(pointcloud: np.ndarray, tr: np.ndarray) -> np.ndarray:
    """Applies a (4, 4) transform to an (N, 3) numpy point cloud (host-side)."""
    return np.einsum("ij,nj->ni", tr[:3, :3], pointcloud) + tr[:3, 3].reshape(1, 3)
