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

def test_html_viewer_embeds_cloud_and_trajectory(tmp_path):
    """The interactive-3D artifact: data round-trips through the quantized
    base64 embedding and the document carries the full inline renderer."""
    import base64
    import json
    import re

    from pylidar_slam_tpu.viz.html_viewer import write_html_viewer

    rng = np.random.default_rng(2)
    pts = (rng.normal(size=(4096, 3)) * [20.0, 20.0, 2.0]).astype(np.float32)
    poses = np.tile(np.eye(4), (32, 1, 1))
    poses[:, 0, 3] = np.arange(32) * 0.5
    out = write_html_viewer(str(tmp_path / "map.html"), pts, trajectory=poses,
                            title="t")
    html = open(out).read()
    # structural: a full standalone WebGL document
    for marker in ("<!DOCTYPE html", "webgl", "VERTEX_SHADER", "gl.POINTS",
                   "LINE_STRIP", "requestAnimationFrame"):
        assert marker in html, marker
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["n"] == 4096 and meta["nTraj"] == 32
    # dequantized positions match the source within quantization step
    q = np.frombuffer(base64.b64decode(
        re.search(r'decode\("([A-Za-z0-9+/=]+)", Uint16Array\)', html)
        .group(1)), np.uint16).reshape(-1, 3)
    back = np.asarray(meta["lo"]) + q / 65535.0 * np.asarray(meta["span"])
    step = np.asarray(meta["span"]) / 65535.0
    assert np.all(np.abs(back - pts) <= step + 1e-6)
    # trajectory rides as exact float32
    traj = np.frombuffer(base64.b64decode(
        re.search(r'trajB64 = "([A-Za-z0-9+/=]+)"', html).group(1)),
        np.float32).reshape(-1, 3)
    np.testing.assert_allclose(traj, poses[:, :3, 3], atol=0)


def test_html_viewer_subsamples_and_colors(tmp_path):
    from pylidar_slam_tpu.viz.html_viewer import write_html_viewer

    pts = np.random.default_rng(3).normal(size=(10_000, 3)).astype(np.float32)
    out = write_html_viewer(str(tmp_path / "small.html"), pts,
                            max_points=1000)
    html = open(out).read()
    import json
    import re
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["n"] <= 1000 and meta["nTraj"] == 0
