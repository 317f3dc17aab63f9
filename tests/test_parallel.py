"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops import optimization, se3
from pylidar_slam_tpu.parallel import make_mesh, point_sharded_gauss_newton_step
from pylidar_slam_tpu.parallel.mesh import factorize_two

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_factorize_two():
    assert factorize_two(8) == (4, 2)
    assert factorize_two(7) == (7, 1)
    assert factorize_two(16) == (4, 4)


def test_point_sharded_gn_matches_single_device():
    rng = np.random.default_rng(0)
    n = 128 * 8
    gt_params = jnp.asarray(rng.uniform(-0.1, 0.1, (6,)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals, jnp.float32)
    inv = se3.inverse_pose_matrix(se3.build_pose_matrix(gt_params[None]))[0]
    target = se3.apply_transformation(ref, inv)
    mask = jnp.ones((n,), bool)

    # Single-device reference step
    res = optimization.point_to_plane_residuals(jnp.zeros(6), target, ref, normals, mask)
    jac = optimization.point_to_plane_jacobian(jnp.zeros(6), target, normals, mask)
    dx_ref, _, _ = optimization.gauss_newton_step(res, jac, jnp.ones(n))

    mesh = make_mesh([("sp", 8)])
    gn = point_sharded_gauss_newton_step(mesh, axis="sp")
    dx, loss = gn(jnp.zeros(6), target, ref, normals, mask)
    np.testing.assert_allclose(dx, dx_ref, atol=1e-4)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    g.dryrun_multichip(8)
