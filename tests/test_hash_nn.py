"""Voxel-hash candidate NN (ops/hash_nn.py) vs brute force.

The hash grid is a pre-filter for the surfel map's gated 1-NN: within the
gate radius (and absent bucket overflow) it must reproduce brute force
EXACTLY -- same winning distance for every query whose true NN is closer
than the radius (reference analog: the kd-tree query + residual gate,
/root/reference/slam/odometry/local_map.py:372-395).
"""
import numpy as np
import jax.numpy as jnp

from pylidar_slam_tpu.ops import icp3d
from pylidar_slam_tpu.ops.hash_nn import build_hash_grid, hash_grid_nn

RADIUS = 1.0
VOXEL = 2.0 * RADIUS


def _brute(queries, points, valid):
    idx, sq = icp3d.brute_force_nn(jnp.asarray(queries), jnp.asarray(points),
                                   jnp.asarray(valid))
    return np.asarray(idx), np.asarray(sq)


def test_hash_nn_matches_brute_force_within_radius():
    rng = np.random.default_rng(0)
    points = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    valid = np.ones(4096, bool)
    valid[::17] = False  # invalid map slots never win
    queries = (points[rng.integers(0, 4096, size=1024)]
               + rng.normal(0, 0.4, size=(1024, 3))).astype(np.float32)

    slots = build_hash_grid(jnp.asarray(points), jnp.asarray(valid),
                            VOXEL, n_buckets=4096, cap=64)
    h_idx, h_sq = hash_grid_nn(jnp.asarray(queries), jnp.asarray(points),
                               slots, VOXEL, 4096, 64, RADIUS)
    h_idx, h_sq = np.asarray(h_idx), np.asarray(h_sq)
    b_idx, b_sq = _brute(queries, points, valid)

    in_gate = b_sq < RADIUS ** 2
    assert in_gate.sum() > 800  # the fixture actually exercises the gate
    # Identical winning distances (ties may pick a different equal-distance
    # index; distances are the quantity ICP consumes).
    np.testing.assert_allclose(h_sq[in_gate], b_sq[in_gate], rtol=1e-6)
    agree = h_idx[in_gate] == b_idx[in_gate]
    ties = np.isclose(h_sq[in_gate], b_sq[in_gate])
    assert np.all(agree | ties)
    # Invalid map points are never returned inside the gate.
    assert valid[h_idx[in_gate]].all()


def test_hash_nn_no_candidates_returns_inf():
    points = np.zeros((512, 3), np.float32)
    valid = np.ones(512, bool)
    slots = build_hash_grid(jnp.asarray(points), jnp.asarray(valid),
                            VOXEL, n_buckets=256, cap=8)
    q = np.full((256, 3), 100.0, np.float32)  # far outside any bucket
    idx, sq = hash_grid_nn(jnp.asarray(q), jnp.asarray(points), slots,
                           VOXEL, 256, 8, RADIUS)
    assert np.all(np.isinf(np.asarray(sq)))
    assert np.all(np.asarray(idx) >= 0)  # safe gather index, gated by sq


def test_hash_knn_matches_brute_force_within_radius():
    rng = np.random.default_rng(2)
    points = rng.uniform(-10, 10, size=(2048, 3)).astype(np.float32)
    valid = np.ones(2048, bool)
    queries = (points[rng.integers(0, 2048, size=256)]
               + rng.normal(0, 0.2, size=(256, 3))).astype(np.float32)
    k = 8
    slots = build_hash_grid(jnp.asarray(points), jnp.asarray(valid),
                            VOXEL, n_buckets=4096, cap=64)
    from pylidar_slam_tpu.ops.hash_nn import hash_grid_knn
    idxk, sqk = hash_grid_knn(jnp.asarray(queries), jnp.asarray(points),
                              slots, VOXEL, 4096, 64, RADIUS, k)
    idxk, sqk = np.asarray(idxk), np.asarray(sqk)
    # ascending distances (where consecutive entries are both finite;
    # missing neighbors carry +inf and always sort last)
    finite = np.isfinite(sqk)
    both = finite[:, 1:] & finite[:, :-1]
    assert np.all(np.diff(sqk, axis=1)[both] >= -1e-6)
    assert np.all(finite[:, :-1] | ~finite[:, 1:])  # inf is a suffix
    # brute-force j-th neighbor distances; the j-th hash neighbor must match
    # while its true distance stays under the radius
    d_all = ((queries[:, None, :] - points[None]) ** 2).sum(-1)
    d_sorted = np.sort(d_all, axis=1)[:, :k]
    within = d_sorted < RADIUS ** 2
    np.testing.assert_allclose(sqk[within], d_sorted[within], rtol=1e-5)


def test_knn_plane_normals_recovers_plane():
    from pylidar_slam_tpu.ops.geometry import (knn_plane_normals,
                                               smallest_eigenvector_3x3)
    rng = np.random.default_rng(3)
    # smallest_eigenvector vs LAPACK eigh on random PSD matrices
    a = rng.normal(size=(200, 3, 3))
    covs = (a @ a.transpose(0, 2, 1)).astype(np.float32)
    v = np.asarray(smallest_eigenvector_3x3(jnp.asarray(covs)))
    _, vecs = np.linalg.eigh(covs)
    dots = np.abs(np.sum(v * vecs[:, :, 0], axis=1))
    assert dots.min() > 0.999
    # masked plane fit: tilted plane, invalid rows ignored
    normal = np.array([1.0, 2.0, 2.0]) / 3.0
    u = np.array([2.0, -1.0, 0.0]) / np.sqrt(5)
    w = np.cross(normal, u)
    coef = rng.uniform(-1, 1, size=(64, 10, 2))
    pts = (coef[..., :1] * u + coef[..., 1:] * w).astype(np.float32)
    pts[:, 7:] = 100.0  # poisoned rows, masked out
    valid = np.ones((64, 10), bool)
    valid[:, 7:] = False
    n = np.asarray(knn_plane_normals(jnp.asarray(pts), jnp.asarray(valid)))
    assert np.abs(n @ normal).min() > 0.999


def test_hash_grid_overflow_keeps_a_near_neighbor():
    # 64 coincident points overflow a cap-4 bucket; a same-voxel survivor
    # must still be found at (near-)zero distance.
    rng = np.random.default_rng(1)
    points = (1.0 + rng.normal(0, 0.01, size=(64, 3))).astype(np.float32)
    valid = np.ones(64, bool)
    slots = build_hash_grid(jnp.asarray(points), jnp.asarray(valid),
                            VOXEL, n_buckets=256, cap=4)
    assert int((np.asarray(slots) >= 0).sum()) == 4
    idx, sq = hash_grid_nn(jnp.asarray(points), jnp.asarray(points), slots,
                           VOXEL, 256, 4, RADIUS)
    assert np.all(np.asarray(sq) < 0.01 ** 2 * 64)


def test_packed_grid_bitwise_identical_to_raw_slots():
    """pack_grid is a pure data-layout change: 1-NN and k-NN results through
    the packed per-bucket coordinate table must be BIT-identical to the raw
    slot-table probe (surfel_map passes the packed form in its hot loops)."""
    from pylidar_slam_tpu.ops.hash_nn import hash_grid_knn, pack_grid
    rng = np.random.default_rng(3)
    points = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    valid = np.ones(4096, bool)
    valid[::13] = False
    queries = (points[rng.integers(0, 4096, size=512)]
               + rng.normal(0, 0.4, size=(512, 3))).astype(np.float32)

    slots = build_hash_grid(jnp.asarray(points), jnp.asarray(valid),
                            VOXEL, n_buckets=2048, cap=32)
    packed = pack_grid(jnp.asarray(points), slots, 32)

    i1, s1 = hash_grid_nn(jnp.asarray(queries), jnp.asarray(points), slots,
                          VOXEL, 2048, 32, RADIUS)
    i2, s2 = hash_grid_nn(jnp.asarray(queries), jnp.asarray(points), packed,
                          VOXEL, 2048, 32, RADIUS)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    ki1, ks1 = hash_grid_knn(jnp.asarray(queries), jnp.asarray(points),
                             slots, VOXEL, 2048, 32, RADIUS, 10)
    ki2, ks2 = hash_grid_knn(jnp.asarray(queries), jnp.asarray(points),
                             packed, VOXEL, 2048, 32, RADIUS, 10)
    np.testing.assert_array_equal(np.asarray(ki1), np.asarray(ki2))
    np.testing.assert_array_equal(np.asarray(ks1), np.asarray(ks2))
