"""Pose-file IO (capability match of reference slam/common/io.py:17-76).

Poses persist as csv rows of the flattened first 3 rows of the 4x4 matrix
(the KITTI poses layout); also provides plain-text KITTI poses.txt helpers.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from pylidar_slam_tpu.utils import assert_debug, check_tensor


def delimiter() -> str:
    return ","


def poses_to_df(poses_array: np.ndarray):
    """(N, 4, 4) -> DataFrame of the 12 first-3-row values."""
    import pandas as pd
    check_tensor(poses_array, [-1, 4, 4])
    n = poses_array.shape[0]
    return pd.DataFrame(poses_array[:, :3, :].reshape(n, 12))


def df_to_poses(df) -> np.ndarray:
    """DataFrame (N, 12) -> (N, 4, 4) poses."""
    array = df.to_numpy(dtype=np.float64)
    assert_debug(array.shape[1] == 12, f"Expected 12 columns, got {array.shape}")
    n = array.shape[0]
    poses = array.reshape(n, 3, 4)
    bottom = np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (n, 1, 1))
    return np.concatenate([poses, bottom], axis=1)


def write_poses_to_disk(file_path: str, poses: np.ndarray):
    check_tensor(poses, [-1, 4, 4])
    path = Path(file_path)
    assert_debug(path.parent.exists(), f"Parent dir of {file_path} missing")
    poses_to_df(poses).to_csv(file_path, sep=delimiter(), index=False)


def read_poses_from_disk(file_path: str,
                         _delimiter: str = ",") -> np.ndarray:
    import pandas as pd
    path = Path(file_path)
    assert_debug(path.exists() and path.is_file(), f"Missing {file_path}")
    return df_to_poses(pd.read_csv(path, sep=_delimiter, index_col=None))


def write_kitti_poses(file_path: str, poses: np.ndarray):
    """Space-separated KITTI poses.txt (no header)."""
    check_tensor(poses, [-1, 4, 4])
    np.savetxt(file_path, poses[:, :3, :].reshape(len(poses), 12))


def read_kitti_poses(file_path: str) -> np.ndarray:
    flat = np.loadtxt(file_path).reshape(-1, 12)
    return df_to_poses(__import__("pandas").DataFrame(flat))
