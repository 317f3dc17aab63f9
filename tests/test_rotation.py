import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops import rotation, se3


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_euler_mat_round_trip(rng):
    angles = jnp.asarray(rng.uniform(-1.2, 1.2, (32, 3)), dtype=jnp.float32)
    mats = rotation.euler_to_mat(angles)
    # Valid rotations: R R^T = I, det = 1
    eye = jnp.einsum("bij,bkj->bik", mats, mats)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(mats)), 1.0, atol=1e-5)
    back = rotation.mat_to_euler(mats)
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_mat_to_euler_singular():
    # Gimbal-lock: ey = +-pi/2
    angles = jnp.array([[0.3, np.pi / 2, 0.0], [-0.2, -np.pi / 2, 0.0]], dtype=jnp.float32)
    mats = rotation.euler_to_mat(angles)
    back = rotation.mat_to_euler(mats)
    mats2 = rotation.euler_to_mat(back)
    np.testing.assert_allclose(mats2, mats, atol=1e-5)


def test_euler_jacobian_matches_autodiff(rng):
    angles = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3)), dtype=jnp.float32)
    analytic = rotation.euler_jacobian(angles)
    auto = jax.vmap(jax.jacfwd(lambda a: rotation.euler_to_mat(a[None])[0]))(angles)
    # auto: (B, 3, 3, 3) with last axis the parameter -> move to axis 1
    auto = jnp.moveaxis(auto, -1, 1)
    np.testing.assert_allclose(analytic, auto, atol=1e-5)


def test_pose_matrix_jacobian_matches_autodiff(rng):
    params = jnp.asarray(rng.uniform(-1.0, 1.0, (4, 6)), dtype=jnp.float32)
    analytic = rotation.pose_matrix_jacobian(params)
    auto = jax.vmap(jax.jacfwd(lambda p: se3.build_pose_matrix(p[None])[0]))(params)
    auto = jnp.moveaxis(auto, -1, 1)
    np.testing.assert_allclose(analytic, auto, atol=1e-5)


def test_se3_build_from_round_trip(rng):
    params = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 6)), dtype=jnp.float32)
    mats = se3.build_pose_matrix(params)
    back = se3.from_pose_matrix(mats)
    np.testing.assert_allclose(back, params, atol=1e-5)


def test_se3_inverse(rng):
    params = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 6)), dtype=jnp.float32)
    mats = se3.build_pose_matrix(params)
    inv = se3.inverse_pose_matrix(mats)
    prod = jnp.einsum("bij,bjk->bik", mats, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_pose_motion_magnitude():
    # Translation-only: the translation norm exactly.
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [3.0, 0.0, 4.0]
    np.testing.assert_allclose(
        float(se3.pose_motion_magnitude(jnp.asarray(t))), 5.0, atol=1e-5)
    # Rotation-only: ||R - I||_F ~= sqrt(2) * angle, so the measure is
    # angle * lever for small angles.
    ang = 0.01
    r = np.eye(4, dtype=np.float32)
    r[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    np.testing.assert_allclose(
        float(se3.pose_motion_magnitude(jnp.asarray(r), lever_m=15.0)),
        15.0 * ang, rtol=1e-3)
    # Identity: zero.
    assert float(se3.pose_motion_magnitude(jnp.eye(4))) == 0.0


def test_apply_transformation(rng):
    params = jnp.asarray(rng.uniform(-1.0, 1.0, (2, 6)), dtype=jnp.float32)
    points = jnp.asarray(rng.normal(size=(2, 50, 3)), dtype=jnp.float32)
    mats = se3.build_pose_matrix(params)
    out = se3.apply_transformation(points, mats)
    expected = np.einsum("bij,bnj->bni", np.asarray(mats[:, :3, :3]), np.asarray(points)) \
        + np.asarray(mats[:, :3, 3])[:, None, :]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quaternion_round_trip(rng):
    angles = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 3)), dtype=jnp.float32)
    mats = rotation.euler_to_mat(angles)
    quats = se3.mat_to_quat(mats)
    back = se3.quat_to_mat(quats)
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    angles = jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    pose = se3.build_pose_matrix(jnp.concatenate(
        [jnp.array([[1.0, 2.0, 3.0]]), angles], axis=1))[0]
    alphas = jnp.array([0.0, 0.5, 1.0], dtype=jnp.float32)
    rots, trs = se3.interpolate_pose(pose, alphas)
    np.testing.assert_allclose(rots[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rots[2], pose[:3, :3], atol=1e-5)
    # Midpoint of a pure z rotation of 1 rad is a z rotation of 0.5 rad
    half = rotation.euler_to_mat(jnp.array([[0.0, 0.0, 0.5]]))[0]
    np.testing.assert_allclose(rots[1], half, atol=1e-5)
    np.testing.assert_allclose(trs[1], 0.5 * pose[:3, 3], atol=1e-6)


def test_poses_interpolator():
    ts = np.array([0.0, 1.0, 2.0])
    poses = np.stack([np.eye(4)] * 3)
    poses[1][:3, 3] = [1.0, 0.0, 0.0]
    poses[2][:3, 3] = [2.0, 0.0, 0.0]
    interp = se3.PosesInterpolator(poses, ts)
    out = interp(np.array([0.5, 1.5]))
    np.testing.assert_allclose(out[0][:3, 3], [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1][:3, 3], [1.5, 0, 0], atol=1e-6)
