"""Native C++ host-runtime tests (vs numpy reference implementations)."""
import numpy as np
import pytest

from pylidar_slam_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_kitti_scan_matches_numpy(lib, tmp_path):
    from pylidar_slam_tpu.dataset.kitti_dataset import correct_scan
    rng = np.random.default_rng(0)
    scan = rng.normal(size=(5000, 4)).astype(np.float32) * 15
    scan[7, 0] = np.nan  # a NaN row must be scrubbed
    path = tmp_path / "000000.bin"
    scan.tofile(str(path))

    out, n = native.load_kitti_scan(str(path), 8192)
    assert n == 4999
    expected = correct_scan(scan)
    expected = expected[~np.isnan(expected).any(axis=1)]
    np.testing.assert_allclose(out[:n], expected, atol=1e-4)
    np.testing.assert_allclose(out[n:], 0.0)


def test_native_quantized_load(lib, tmp_path):
    from pylidar_slam_tpu.dataset.kitti_dataset import correct_scan
    rng = np.random.default_rng(1)
    scan = rng.normal(size=(1000, 4)).astype(np.float32) * 15
    path = tmp_path / "000001.bin"
    scan.tofile(str(path))
    out, n = native.load_kitti_scan_quantized(str(path), 0.004, 2048)
    assert n == 1000
    expected = correct_scan(scan)
    np.testing.assert_allclose(out[:n] * 0.004, expected, atol=0.003)


def test_native_quantize_pad(lib):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 10
    pts[3] = np.nan
    out, n = native.quantize_pad(pts, 0.004, 1024)
    assert n == 499
    valid = pts[~np.isnan(pts).any(axis=1)]
    np.testing.assert_allclose(out[:n] * 0.004, valid, atol=0.003)


def test_native_grid_sample_matches_reference(lib):
    rng = np.random.default_rng(3)
    pts = (rng.normal(size=(2000, 3)) * 5).astype(np.float32)
    keep = native.grid_sample_mask(pts, 0.5)
    # reference semantics: first point per voxel hash
    coords = np.round(pts / 0.5).astype(np.int64)
    hashes = 73856093 * coords[:, 0] + 19349669 * coords[:, 1] \
        + 83492791 * coords[:, 2]
    _, first_idx = np.unique(hashes, return_index=True)
    expected = np.zeros(2000, bool)
    expected[first_idx] = True
    np.testing.assert_array_equal(keep, expected)
