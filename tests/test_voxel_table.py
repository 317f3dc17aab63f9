"""Unit tests for ops/voxel_table.py (the incremental voxel-surfel map)
and the voxel_local_map odometry built on it."""
import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops.voxel_table import (init_table, scatter_select,
                                              table_insert, table_knn,
                                              table_nn, table_reanchor,
                                              table_set_normals)


def _rand_points(n, scale=20.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(scale=scale, size=(n, 3)).astype(np.float32))


# -- scatter_select ----------------------------------------------------------

def test_scatter_select_one_per_voxel_and_deterministic():
    pts = _rand_points(5000, scale=5.0)
    valid = jnp.ones((5000,), bool)
    sel, idx, sel_valid = scatter_select(pts, valid, 0.5, 1024)
    sel2, idx2, _ = scatter_select(pts, valid, 0.5, 1024)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))

    # At most one selected point per voxel.
    got = np.asarray(sel)[np.asarray(sel_valid)]
    vox = np.floor(got / 0.5).astype(np.int64)
    keys = {tuple(v) for v in vox}
    assert len(keys) == len(got)

    # Every selected point is one of the inputs (by index).
    np.testing.assert_allclose(
        got, np.asarray(pts)[np.asarray(idx)[np.asarray(sel_valid)]])


def test_scatter_select_respects_validity_and_salt():
    pts = _rand_points(2000, scale=5.0, seed=1)
    valid = jnp.asarray(np.arange(2000) % 2 == 0)
    _, idx, sel_valid = scatter_select(pts, valid, 0.5, 512)
    assert np.all(np.asarray(idx)[np.asarray(sel_valid)] % 2 == 0)

    # A different salt rotates the winner set (overwhelmingly likely).
    _, idx_a, va = scatter_select(pts, valid, 0.5, 512,
                                  salt=jnp.int32(0))
    _, idx_b, vb = scatter_select(pts, valid, 0.5, 512,
                                  salt=jnp.int32(1))
    a = set(np.asarray(idx_a)[np.asarray(va)].tolist())
    b = set(np.asarray(idx_b)[np.asarray(vb)].tolist())
    assert a != b


# -- insert + NN probe -------------------------------------------------------

def _brute_nn(queries, points, radius):
    d = np.linalg.norm(queries[:, None] - points[None], axis=-1)
    best = d.argmin(axis=1)
    dist = d[np.arange(len(queries)), best]
    return best, np.where(dist <= radius, dist, np.inf)


def test_table_nn_exact_within_gate_sparse():
    """With a sparse cloud (few points, huge table) there are no hash
    collisions or overflows, so the probe must equal brute force + gate."""
    rng = np.random.default_rng(2)
    pts_np = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    table = init_table(1 << 16)
    table, won, slot = table_insert(table, pts, jnp.ones((300,), bool),
                                    jnp.int32(0), 30, 0.5)
    # Sparse: every point claims its own voxel.
    assert np.asarray(won).sum() >= 290  # allow a handful of voxel doubles

    q_np = rng.uniform(-10, 10, size=(64, 3)).astype(np.float32)
    slot_nn, sq = table_nn(table, jnp.asarray(q_np), jnp.int32(1), 30,
                           0.5, 0.5)
    got_pts = np.asarray(table.points)[np.asarray(slot_nn)]
    got_d = np.sqrt(np.asarray(sq))

    kept = np.asarray(won)
    ref_idx, ref_d = _brute_nn(q_np, pts_np[kept], 0.5)
    for i in range(64):
        if np.isfinite(ref_d[i]):
            assert np.isfinite(got_d[i]), i
            np.testing.assert_allclose(got_d[i], ref_d[i], rtol=1e-5)
            np.testing.assert_allclose(got_pts[i], pts_np[kept][ref_idx[i]],
                                       rtol=1e-5)
        else:
            assert not np.isfinite(got_d[i]), i


def test_table_keep_old_then_stale_eviction():
    p0 = jnp.asarray(np.array([[1.0, 1.0, 1.0]], np.float32))
    p1 = jnp.asarray(np.array([[1.1, 1.1, 1.1]], np.float32))  # same voxel @0.5
    ones = jnp.ones((1,), bool)
    table = init_table(1 << 10)
    table, won0, _ = table_insert(table, p0, ones, jnp.int32(0), 3, 0.5)
    assert bool(np.asarray(won0)[0])
    # Live resident: the second point is rejected (keep-old).
    table, won1, _ = table_insert(table, p1, ones, jnp.int32(1), 3, 0.5)
    assert not bool(np.asarray(won1)[0])
    np.testing.assert_allclose(np.asarray(table.points)[
        np.asarray(table.meta) == 0][0], [1.0, 1.0, 1.0])
    # After k_live frames the resident is stale and replaced.
    table, won2, _ = table_insert(table, p1, ones, jnp.int32(3), 3, 0.5)
    assert bool(np.asarray(won2)[0])
    # Probe at frame 3 sees the new point.
    slot, sq = table_nn(table, p1, jnp.int32(3), 3, 0.5, 0.5)
    assert float(sq[0]) < 1e-9


def test_table_staleness_masks_probe():
    pts = _rand_points(50, scale=3.0, seed=3)
    table = init_table(1 << 12)
    table, _, _ = table_insert(table, pts, jnp.ones((50,), bool),
                               jnp.int32(0), 5, 0.5)
    _, sq_live = table_nn(table, pts, jnp.int32(4), 5, 0.5, 0.5)
    assert np.isfinite(np.asarray(sq_live)).all()
    _, sq_dead = table_nn(table, pts, jnp.int32(5), 5, 0.5, 0.5)
    assert not np.isfinite(np.asarray(sq_dead)).any()


def test_table_knn_matches_brute_force_sparse():
    rng = np.random.default_rng(4)
    pts_np = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    table = init_table(1 << 16)
    table, won, _ = table_insert(table, jnp.asarray(pts_np),
                                 jnp.ones((200,), bool), jnp.int32(0),
                                 10, 0.8)
    kept = pts_np[np.asarray(won)]
    q = kept[:20]
    slots, sq = table_knn(table, jnp.asarray(q), jnp.int32(1), 10, 0.8,
                          0.8, 4)
    d = np.linalg.norm(q[:, None] - kept[None], axis=-1)
    for i in range(20):
        ref = np.sort(d[i][d[i] <= 0.8])[:4]
        got = np.sqrt(np.asarray(sq[i]))
        got = got[np.isfinite(got)]
        np.testing.assert_allclose(got, ref[:len(got)], rtol=1e-5)
        assert len(got) == len(ref)


def test_table_reanchor_preserves_live_surfels():
    rng = np.random.default_rng(5)
    pts_np = rng.uniform(-8, 8, size=(150, 3)).astype(np.float32)
    table = init_table(1 << 15)
    table, won, _ = table_insert(table, jnp.asarray(pts_np),
                                 jnp.ones((150,), bool), jnp.int32(0),
                                 30, 0.5)
    t = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.3), np.sin(0.3)
    t[:2, :2] = [[c, -s], [s, c]]
    t[:3, 3] = [5.0, -2.0, 0.5]
    table2 = table_reanchor(table, jnp.asarray(t), 0.5)

    kept = pts_np[np.asarray(won)]
    moved = kept @ t[:3, :3].T + t[:3, 3]
    slot, sq = table_nn(table2, jnp.asarray(moved), jnp.int32(1), 30,
                        0.5, 0.5)
    # Every live surfel survives at its transformed position (sparse: no
    # re-hash collisions at this density).
    assert np.isfinite(np.asarray(sq)).all()
    assert float(np.max(np.asarray(sq))) < 1e-8
    # Insert ages survive the re-anchor.
    assert (np.asarray(table2.meta) >= 0).sum() == \
        (np.asarray(table.meta) >= 0).sum()


# -- odometry end-to-end (CPU, small) ---------------------------------------

@pytest.mark.slow
def test_voxel_map_odometry_tracks_synthetic():
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticSequence)
    from pylidar_slam_tpu.ops.projection import SphericalProjection
    from pylidar_slam_tpu.slam.odometry.icp_odometry import (
        ICPFrameToModel, ICPFrameToModelConfig)

    cfg = SyntheticConfig(lidar_height=64, lidar_width=1024, num_frames=25,
                          num_walls=40, num_pillars=25)
    seq = SyntheticSequence(cfg, "s", seed=cfg.seed)
    gt = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                   for i in range(cfg.num_frames)])
    gt = np.linalg.inv(gt[0]) @ gt

    icp_cfg = ICPFrameToModelConfig(
        max_num_alignments=10, reassoc_every=100, reassoc_motion_m=0.2,
        local_map={"type": "voxel_local_map"},
        alignment={"gauss_newton_config": {"scheme": "neighborhood",
                                           "sigma": 0.2, "max_iters": 1}},
        num_points_padded=66560, data_key="numpy_pc", upload_format="rimg8")
    odom = ICPFrameToModel(icp_cfg,
                           projector=SphericalProjection(64, 1024, 3.0, -24.0))
    odom.init()
    last = np.eye(4, dtype=np.float32)
    for i in range(cfg.num_frames):
        pc = np.asarray(seq[i]["numpy_pc"], np.float32)
        d = {"numpy_pc": pc, "init_rpose": last,
             "encoded_upload": odom.encode_upload(pc)}
        odom.process_next_frame(d)
        last = d.get("odometry_pose", last)
    odom.finish()
    from pylidar_slam_tpu.eval.eval_odometry import compute_absolute_poses
    traj = compute_absolute_poses(odom.get_relative_poses())
    ate = float(np.linalg.norm(traj[:, :3, 3] - gt[:, :3, 3], axis=1).mean())
    assert ate < 0.05, f"voxel-map odometry lost tracking: ATE {ate}"
