"""Gauss-Newton convergence oracles (modeled after the reference's
tests/test_optimization.py round-trip identity test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops import optimization, registration, se3, voxel


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _make_problem(rng, n=256, scale=0.1, dtype=jnp.float32):
    """A known small pose + synthetic plane correspondences."""
    gt_params = jnp.asarray(rng.uniform(-scale, scale, (6,)), dtype=dtype)
    ref_points = jnp.asarray(rng.normal(size=(n, 3)) * 5.0, dtype=dtype)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals, dtype=dtype)
    # target such that T(gt) target = ref  =>  target = T(gt)^-1 ref
    inv = se3.inverse_pose_matrix(se3.build_pose_matrix(gt_params[None]))[0]
    target = se3.apply_transformation(ref_points, inv)
    return gt_params, target, ref_points, normals


def test_point_to_plane_jacobian_matches_autodiff(rng):
    gt, target, ref, normals = _make_problem(rng, n=64)
    params = jnp.asarray(rng.uniform(-0.05, 0.05, (6,)), dtype=jnp.float32)
    analytic = optimization.point_to_plane_jacobian(params, target, normals)
    auto = jax.jacfwd(lambda p: optimization.point_to_plane_residuals(
        p, target, ref, normals))(params)
    np.testing.assert_allclose(analytic, auto, atol=1e-4)


def test_gauss_newton_recovers_pose(rng):
    """Round-trip identity oracle in float64 (the reference's
    tests/test_optimization.py asserts <=1e-7 error in double precision)."""
    gt, target, ref, normals = _make_problem(rng, dtype=jnp.float64)
    res_fun = lambda p: optimization.point_to_plane_residuals(p, target, ref, normals)
    jac_fun = lambda p: optimization.point_to_plane_jacobian(p, target, normals)
    result = optimization.gauss_newton(
        jnp.zeros(6, jnp.float64), res_fun, jac_fun,
        max_iters=20, norm_stop_criterion=1e-12, scheme="huber", sigma=1e-4)
    np.testing.assert_allclose(result.params, gt, atol=1e-7)
    assert float(result.loss) < 1e-10


def test_gauss_newton_recovers_pose_f32(rng):
    """Single precision (the TPU path) converges to ~1e-3."""
    gt, target, ref, normals = _make_problem(rng, dtype=jnp.float32)
    res_fun = lambda p: optimization.point_to_plane_residuals(p, target, ref, normals)
    jac_fun = lambda p: optimization.point_to_plane_jacobian(p, target, normals)
    result = optimization.gauss_newton(
        jnp.zeros(6, jnp.float32), res_fun, jac_fun,
        max_iters=20, norm_stop_criterion=1e-9, scheme="huber", sigma=1e-4)
    np.testing.assert_allclose(result.params, gt, atol=5e-3)


def test_gauss_newton_masked_padding(rng):
    """Padded (masked) rows must not change the solution."""
    gt, target, ref, normals = _make_problem(rng, n=128)
    pad = 64
    target_p = jnp.concatenate([target, jnp.asarray(rng.normal(size=(pad, 3)), jnp.float32)])
    ref_p = jnp.concatenate([ref, jnp.zeros((pad, 3), jnp.float32)])
    normals_p = jnp.concatenate([normals, jnp.ones((pad, 3), jnp.float32)])
    mask = jnp.concatenate([jnp.ones(128, bool), jnp.zeros(pad, bool)])

    res_fun = lambda p: optimization.point_to_plane_residuals(p, target_p, ref_p, normals_p, mask)
    jac_fun = lambda p: optimization.point_to_plane_jacobian(p, target_p, normals_p, mask)
    result = optimization.gauss_newton(
        jnp.zeros(6, jnp.float32), res_fun, jac_fun,
        max_iters=20, norm_stop_criterion=1e-9)
    np.testing.assert_allclose(result.params, gt, atol=1e-4)


def test_robust_weights_schemes(rng):
    res = jnp.asarray(rng.normal(size=(100,)), dtype=jnp.float32)
    sq = jnp.abs(jnp.asarray(rng.normal(size=(100,)), dtype=jnp.float32))
    for scheme in optimization.SCHEMES:
        w = optimization.robust_weights(scheme, res, sigma=0.5, sq_dists=sq)
        assert np.isfinite(np.asarray(w)).all()
        assert (np.asarray(w) >= 0).all()
    # least square weights are exactly 1
    np.testing.assert_allclose(
        optimization.robust_weights("least_square", res, 0.5), 1.0)
    # huber: quadratic region has weight ~1
    small = jnp.array([1e-3], jnp.float32)
    np.testing.assert_allclose(
        optimization.robust_weights("huber", small, sigma=0.5), 1.0, atol=1e-3)


def test_singular_hessian_guard():
    # All normals identical -> rank-1 system -> singular 6x6
    n = 32
    target = jnp.asarray(np.random.default_rng(1).normal(size=(n, 3)), jnp.float32)
    ref = target
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    jac = optimization.point_to_plane_jacobian(jnp.zeros(6), target, normals)
    res = optimization.point_to_plane_residuals(jnp.zeros(6), target, ref, normals)
    dx, loss, singular = optimization.gauss_newton_step(res, jac, jnp.ones(n))
    assert bool(singular)
    np.testing.assert_allclose(dx, 0.0)


def test_procrustes_recovers_transform(rng):
    params = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 6)), dtype=jnp.float32)
    mats = se3.build_pose_matrix(params)
    target = jnp.asarray(rng.normal(size=(2, 100, 3)), dtype=jnp.float32)
    ref = se3.apply_transformation(target, mats)
    est = registration.weighted_procrustes(ref, target)
    np.testing.assert_allclose(est, mats, atol=1e-4)


def test_procrustes_weighted_outliers(rng):
    params = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 6)), dtype=jnp.float32)
    mats = se3.build_pose_matrix(params)
    target = jnp.asarray(rng.normal(size=(1, 100, 3)), dtype=jnp.float32)
    ref = se3.apply_transformation(target, mats)
    # corrupt 20 points but weight them to zero
    ref = ref.at[0, :20].add(10.0)
    weights = jnp.concatenate([jnp.zeros((1, 20)), jnp.ones((1, 80))], axis=1)
    est = registration.weighted_procrustes(ref, target, weights)
    np.testing.assert_allclose(est, mats, atol=1e-4)


# ----------------------------------------------------------------------------
# Voxel ops
# ----------------------------------------------------------------------------

def _np_grid_sample_indices(points, voxel_size):
    """Reference numpy implementation (pointcloud.py:182-195 semantics)."""
    coords = np.round(points / voxel_size).astype(np.int64).astype(np.int32)
    hashes = (73856093 * coords[:, 0] + 19349669 * coords[:, 1]
              + 83492791 * coords[:, 2]).astype(np.int32)
    _, idx = np.unique(hashes, return_index=True)
    return np.sort(idx)


def test_grid_sample_matches_numpy_unique(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 5
    keep = np.asarray(voxel.grid_sample_mask(jnp.asarray(pts), 0.5))
    expected = _np_grid_sample_indices(pts, 0.5)
    np.testing.assert_array_equal(np.nonzero(keep)[0], expected)


def test_grid_sample_respects_mask(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:50] = True
    keep = np.asarray(voxel.grid_sample_mask(jnp.asarray(pts), 0.3,
                                             mask=jnp.asarray(mask)))
    assert not keep[50:].any()
    expected = _np_grid_sample_indices(pts[:50], 0.3)
    np.testing.assert_array_equal(np.nonzero(keep[:50])[0], expected)


def test_voxel_stats_mean_within_voxel(rng):
    """Statistical oracle from the reference's tests/test_pointcloud.py:
    voxel means stay within a voxel diagonal of member points."""
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    stats = voxel.voxel_normal_distribution(jnp.asarray(pts), 0.1)
    sizes = np.asarray(stats.sizes)
    means = np.asarray(stats.means)
    ids = np.asarray(stats.point_voxel_ids)
    for i in range(400):
        vid = ids[i]
        assert sizes[vid] >= 1
        assert np.linalg.norm(pts[i] - means[vid]) < 0.18

    # total count conserved
    assert sizes.sum() == 400
