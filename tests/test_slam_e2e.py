"""End-to-end SLAM regression tests on the synthetic raycast dataset.

The accuracy bound is the regression oracle (SURVEY.md section 4): the
aggregated-map odometry must track a full-resolution synthetic sequence with
centimeter-level per-frame error.
"""
import numpy as np
import pytest

from pylidar_slam_tpu.config import compose
from pylidar_slam_tpu.dataset.synthetic import SyntheticConfig, SyntheticDatasetLoader
from pylidar_slam_tpu.eval import eval_odometry as ev
from pylidar_slam_tpu.slam.odometry_runner import SLAMRunner, SLAMRunnerConfig
from pylidar_slam_tpu.config import dataclass_from_dict


def _run(tmp_path, overrides):
    cfg = compose("config", "slam", [
        "dataset=synthetic", "dataset.num_frames=14",
        "slam.odometry.num_points_padded=131072",
        f"log_dir={tmp_path}/run"] + overrides)
    runner = SLAMRunner(dataclass_from_dict(SLAMRunnerConfig, cfg))
    runner.run_odometry()
    return runner


@pytest.mark.slow
def test_aggregated_odometry_tracks_synthetic(tmp_path):
    runner = _run(tmp_path, ["slam/odometry/local_map=aggregated",
                             "slam.odometry.max_num_alignments=9"])
    loader = runner.dataset_loader
    rel_gt = loader.get_ground_truth("synth_00")[:14]
    # read back saved poses
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.05, f"aggregated odometry ATE too high: {ate}"


@pytest.mark.slow
def test_projective_odometry_tracks_synthetic(tmp_path):
    runner = _run(tmp_path, ["slam/odometry/local_map=projective",
                             "slam.odometry.local_map.local_map_size=10",
                             "slam.odometry.max_num_alignments=10"])
    assert (tmp_path / "run" / "synth_00.poses.txt").exists()


def test_config_composition_defaults():
    cfg = compose("config", "slam", ["dataset=synthetic"])
    assert cfg["slam"]["odometry"]["algorithm"] == "icp_F2M"
    assert cfg["slam"]["odometry"]["local_map"]["type"] == "projective_local_map"
    assert cfg["slam"]["initialization"]["type"] == "cv"
    assert cfg["dataset"]["dataset"] == "synthetic"
    # group override replaces the subtree choice
    cfg2 = compose("config", "slam", [
        "dataset=synthetic", "slam/odometry/local_map=aggregated"])
    assert cfg2["slam"]["odometry"]["local_map"]["type"] == "aggregated_local_map"
    # dotted override
    cfg3 = compose("config", "slam", [
        "dataset=synthetic", "slam.odometry.max_num_alignments=25"])
    assert cfg3["slam"]["odometry"]["max_num_alignments"] == 25


@pytest.mark.slow
def test_surfel_kdtree_odometry_tracks_synthetic(tmp_path):
    """The exact-NN surfel ring map ('kdtree_local_map') tracks synthetic."""
    runner = _run(tmp_path, [
        "slam/odometry/local_map=kdtree",
        "slam.odometry.local_map.points_per_frame=1024",
        "slam.odometry.local_map.target_samples=8192",
        "slam.odometry.max_num_alignments=10"])
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    rel_gt = runner.dataset_loader.get_ground_truth("synth_00")[:14]
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.1, f"surfel odometry ATE too high: {ate}"


def test_cli_scalar_parsing():
    from pylidar_slam_tpu.config import _parse_scalar
    assert _parse_scalar("2e-4") == 2e-4  # YAML 1.1 would keep this a string
    assert _parse_scalar("1.5") == 1.5
    assert _parse_scalar("42") == 42
    assert _parse_scalar("true") is True
    assert _parse_scalar("[1, 2]") == [1, 2]
    assert _parse_scalar("hello") == "hello"
