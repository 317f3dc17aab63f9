"""Training-stack tests: one real epoch of each loss mode + checkpoint resume."""
import numpy as np
import pytest

# Training runs are the nightly tier (pytest.ini): too expensive for the
# per-round slow budget, and convergence asserts want real step counts.
pytestmark = [pytest.mark.slow, pytest.mark.nightly]

from pylidar_slam_tpu.config import compose
import train as train_mod


def _cfg(tmp_path, extra):
    return compose("config", "train_posenet", [
        "dataset=synthetic", "dataset.num_frames=5", "dataset.lidar_height=16",
        "dataset.lidar_width=64", "num_epochs=1", "batch_size=2",
        "num_points_padded=1024", "average_meter_frequency=1",
        f"train_dir={tmp_path}/train"] + extra)


def test_supervised_training_and_resume(tmp_path):
    trainer = train_mod.build_trainer(_cfg(tmp_path, []))
    trainer.init()
    trainer.train(1)
    assert trainer.num_train_epochs == 1
    assert (tmp_path / "train" / "checkpoint.ckp").exists()
    assert (tmp_path / "train" / "config.yaml").exists()

    # Resume from checkpoint
    trainer2 = train_mod.build_trainer(_cfg(tmp_path, []))
    trainer2.init()
    assert trainer2.num_train_epochs == 1


def test_unsupervised_training(tmp_path):
    trainer = train_mod.build_trainer(_cfg(tmp_path, ["training/loss=unsupervised"]))
    trainer.init()
    avg = trainer.train_epoch(trainer.dataset_loader.sequences()[0][0],
                              np.random.default_rng(0))
    assert np.isfinite(avg)


def test_posenet_odometry_from_checkpoint(tmp_path):
    trainer = train_mod.build_trainer(_cfg(tmp_path, []))
    trainer.init()
    trainer.train(1)

    from pylidar_slam_tpu.slam.odometry.posenet_odometry import (
        PoseNetOdometry, PoseNetOdometryConfig)
    odom = PoseNetOdometry(PoseNetOdometryConfig(
        train_dir=str(tmp_path / "train"), num_points_padded=1024))
    odom.init()
    rng = np.random.default_rng(0)
    for _ in range(3):
        odom.process_next_frame(
            {"numpy_pc": rng.normal(size=(800, 3)).astype(np.float32) * 10})
    poses = odom.get_relative_poses()
    assert poses.shape == (3, 4, 4)
    assert np.isfinite(poses).all()
