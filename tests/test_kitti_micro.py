"""KITTI-readiness proof without the dataset: fabricates a 5-frame on-disk
KITTI odometry micro-sequence (velodyne .bin + calib.txt Tr + poses txt) and
drives `run.py dataset=kitti` end to end through the REAL reader path --
.bin decode, the 0.205-degree `correct_scan` de-calibration, the Tr
conjugation of camera-frame GT into the LiDAR frame, SLAM, and evaluation
(reference kitti_dataset.py:93-391).  The day real data mounts, nothing but
the path changes."""
import numpy as np
import pytest

from pylidar_slam_tpu.config import compose, dataclass_from_dict
from pylidar_slam_tpu.slam.odometry_runner import SLAMRunner, SLAMRunnerConfig

N_FRAMES = 5


def _world_cloud(rng):
    """Structured world: ground + pillars + walls, enough for p2plane ICP."""
    ground = rng.uniform([-40, -40, -1.75], [40, 40, -1.65],
                         (6000, 3)).astype(np.float32)
    pieces = [ground]
    for cx, cy in [(6, 3), (-7, 5), (4, -8), (-5, -6), (12, 0), (0, 12)]:
        n = 1500
        wall = np.stack([
            np.full(n, cx) + rng.uniform(-0.05, 0.05, n),
            cy + rng.uniform(-4, 4, n),
            rng.uniform(-1.5, 2.5, n)], axis=1).astype(np.float32)
        pieces.append(wall)
        wall2 = np.stack([
            cx + rng.uniform(-4, 4, n),
            np.full(n, cy + 4.0) + rng.uniform(-0.05, 0.05, n),
            rng.uniform(-1.5, 2.5, n)], axis=1).astype(np.float32)
        pieces.append(wall2)
    return np.concatenate(pieces)


def _undo_correct_scan(pts):
    """Inverse of the HDL-64 0.205-degree de-calibration the reader applies
    (kitti_dataset.correct_scan): rotate each point by -0.205 deg about
    axis p x ez so the reader's correction restores the geometry."""
    theta = -0.205 * np.pi / 180.0
    c, s = np.cos(theta), np.sin(theta)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    nxy = np.maximum(np.sqrt(x * x + y * y), 1e-12)
    ax, ay = y / nxy, -x / nxy
    adotp = ax * x + ay * y
    cx_, cy_, cz_ = ay * z, -ax * z, ax * y - ay * x
    out = np.empty_like(pts)
    out[:, 0] = c * x + s * cx_ + (1 - c) * adotp * ax
    out[:, 1] = c * y + s * cy_ + (1 - c) * adotp * ay
    out[:, 2] = c * z + s * cz_
    return out


def _fabricate(root):
    rng = np.random.default_rng(3)
    world = _world_cloud(rng)

    seq_dir = root / "sequences" / "00"
    vel_dir = seq_dir / "velodyne"
    vel_dir.mkdir(parents=True)
    (root / "poses").mkdir()

    # Camera-from-lidar extrinsic Tr (a real-ish KITTI-style transform);
    # GT poses are written in the CAMERA frame so the reader must apply the
    # inv(Tr) @ P @ Tr conjugation to match the LiDAR trajectory.
    tr = np.eye(4)
    tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    tr[:3, 3] = [0.05, -0.07, -0.27]

    lidar_poses = []
    for k in range(N_FRAMES):
        pose = np.eye(4)
        yaw = 0.015 * k
        pose[:3, :3] = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        pose[:3, 3] = [0.8 * k, 0.05 * k, 0.0]
        lidar_poses.append(pose)
        # sensor-frame observation of the world
        inv = np.linalg.inv(pose)
        local = world @ inv[:3, :3].T + inv[:3, 3]
        keep = np.linalg.norm(local, axis=1) < 60.0
        local = _undo_correct_scan(local[keep])
        scan = np.concatenate(
            [local, np.full((len(local), 1), 0.5, np.float32)],
            axis=1).astype(np.float32)
        scan.tofile(vel_dir / f"{k:06}.bin")

    with open(seq_dir / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["1"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr[:3, :4].ravel()) + "\n")

    cam_poses = np.stack([tr @ p @ np.linalg.inv(tr) for p in lidar_poses])
    with open(root / "poses" / "00.txt", "w") as f:
        for p in cam_poses:
            f.write(" ".join(str(v) for v in p[:3, :4].ravel()) + "\n")
    return np.stack(lidar_poses)


def test_kitti_micro_sequence_end_to_end(tmp_path, monkeypatch):
    root = tmp_path / "kitti"
    root.mkdir()
    gt = _fabricate(root)

    monkeypatch.setenv("KITTI_ODOM_ROOT", str(root))
    cfg = compose("config", "slam", [
        "dataset=kitti", 'dataset.train_sequences=["00"]',
        "slam/odometry/local_map=aggregated",
        "slam.odometry.num_points_padded=32768",
        "slam.odometry.max_num_alignments=8",
        f"log_dir={tmp_path}/run"])
    runner = SLAMRunner(dataclass_from_dict(SLAMRunnerConfig, cfg))
    runner.run_odometry()

    # The runner wrote poses + metrics for the micro-sequence.
    out_dir = tmp_path / "run"
    poses_files = list(out_dir.rglob("00.poses.txt"))
    assert poses_files, f"no trajectory written under {out_dir}"
    # poses.txt carries the pandas header row and "," delimiter (same as
    # the reference's write_poses_to_disk, io.py:10-29)
    traj = np.loadtxt(poses_files[0], skiprows=1,
                      delimiter=",").reshape(-1, 12)
    assert traj.shape[0] == N_FRAMES

    # GT conjugation check: the dataset's absolute_pose_gt must equal the
    # LiDAR-frame trajectory (up to the shared first-frame gauge).
    from pylidar_slam_tpu.dataset.kitti_dataset import (KITTIConfig,
                                                        KITTIDatasetLoader)
    loader = KITTIDatasetLoader(KITTIConfig(
        kitti_sequence_dir=str(root), train_sequences=["00"]))
    seq = loader.sequences()[0][0][0]
    got = np.stack([np.asarray(seq[k]["absolute_pose_gt"])
                    for k in range(N_FRAMES)])
    rebased = np.linalg.inv(got[0]) @ got
    gt_rebased = np.linalg.inv(gt[0]) @ gt
    np.testing.assert_allclose(rebased, gt_rebased, atol=1e-9)

    # Sanity on the micro-world (sparse fabricated geometry -- this test
    # proves the READER path, not championship accuracy): the endpoint lands
    # within 0.5 m of GT over 3.2 m traveled, i.e. tracking never broke.
    est_T = np.eye(4)
    est_T[:3, :4] = traj[-1].reshape(3, 4)
    err = np.linalg.norm(est_T[:3, 3] - gt_rebased[-1][:3, 3])
    assert err < 0.5, f"micro-KITTI endpoint error {err:.3f} m"
