"""Pallas kernel tests (interpret mode on CPU; compiled path covered by the
TPU-side dev scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops import optimization
from pylidar_slam_tpu.ops.pallas.assoc_gn_kernel import window_assoc_gn_pallas
from pylidar_slam_tpu.slam.odometry import aggregated_map as am


def test_fused_assoc_gn_matches_xla_interpret():
    h, w = 16, 256
    rng = np.random.default_rng(0)
    base = np.cumsum(rng.normal(size=(h, w, 3)).astype(np.float32) * 0.1, axis=1)
    timg = base + rng.normal(size=(h, w, 3)).astype(np.float32) * 0.02
    model_xyz = base + rng.normal(size=(h, w, 3)).astype(np.float32) * 0.02
    normals = rng.normal(size=(h, w, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    mvalid = rng.random((h, w)) < 0.9
    model_xyz[~mvalid] = 0.0
    normals[~mvalid] = 0.0

    state = am.init_agg_map(h, w)
    state = state._replace(xyz=jnp.asarray(model_xyz),
                           normal=jnp.asarray(normals),
                           rng=jnp.where(jnp.asarray(mvalid), 1.0, 0.0))

    # XLA reference path (interior rows only -- the kernel duplicates border
    # tiles, so compare away from the borders)
    ref, nrm, ok, sq_d = am.window_associate(state, jnp.asarray(timg), 1, 2, 0.6)
    h_mat, g, loss, count, wmass = window_assoc_gn_pallas(
        jnp.asarray(timg), state.xyz, state.normal, state.rng > 0,
        wr=1, wc=2, max_nd=0.6, scheme="neighborhood", sigma=0.2,
        interpret=True)
    # association count must match exactly
    assert int(count) == int(jnp.sum(ok))
    tp = jnp.asarray(timg).reshape(-1, 3)
    res = optimization.point_to_plane_residuals(jnp.zeros(6), tp, ref, nrm, ok)
    jac = optimization.point_to_plane_jacobian(jnp.zeros(6), tp, nrm, ok)
    wgt = optimization.robust_weights("neighborhood", res, 0.2, sq_dists=sq_d)
    wgt = jnp.where(ok, wgt, 0.0)
    wjac = jac * wgt[:, None]
    h_ref = np.asarray(wjac.T @ wjac)
    np.testing.assert_allclose(np.asarray(h_mat), h_ref,
                               rtol=0.02, atol=0.02 * np.abs(h_ref).max())
