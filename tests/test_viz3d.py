"""Headless 3D-viewer equivalent: PLY IO + map aggregation + rendering."""
import numpy as np

from pylidar_slam_tpu.viz import viz3d


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    colors = rng.uniform(0, 1, size=(1000, 3))
    for binary in (True, False):
        p = tmp_path / f"cloud_{binary}.ply"
        viz3d.write_ply(str(p), pts, colors=colors, binary=binary)
        back = viz3d.read_ply(str(p))
        np.testing.assert_allclose(back, pts, atol=1e-4)
    # no-color variant
    p = tmp_path / "plain.ply"
    viz3d.write_ply(str(p), pts)
    np.testing.assert_allclose(viz3d.read_ply(str(p)), pts, atol=1e-6)


def test_aggregate_map_cloud_chains_poses():
    # two frames: frame 1 is frame 0 shifted by -1 in x (sensor moved +1 x).
    cloud0 = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    cloud1 = cloud0 - np.array([1.0, 0.0, 0.0])
    rel = np.tile(np.eye(4), (2, 1, 1))
    rel[1, 0, 3] = 1.0  # new -> previous frame: x + 1
    merged = viz3d.aggregate_map_cloud([cloud0, cloud1], rel, voxel_size=0.01)
    # frame 1's points land exactly on frame 0's -> dedup to 2 points
    assert merged.shape[0] == 2
    np.testing.assert_allclose(np.sort(merged[:, 0]), [0.0, 1.0], atol=1e-6)


def test_render_map_views(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(5000, 3)).astype(np.float32) * 5
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.arange(10)
    written = viz3d.render_map_views(str(tmp_path / "seq"), pts, poses)
    assert len(written) == 2
    for w in written:
        from pathlib import Path
        assert Path(w).exists() and Path(w).stat().st_size > 1000
