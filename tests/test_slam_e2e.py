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
def test_motion_gated_reassociation_tracks_synthetic(tmp_path):
    # Motion-gated reassociation (reassoc_motion_m): periodic reassoc off
    # (reassoc_every = iteration count), the gate alone must keep tracking.
    runner = _run(tmp_path, ["slam/odometry/local_map=aggregated",
                             "slam.odometry.max_num_alignments=8",
                             "slam.odometry.reassoc_every=8",
                             "slam.odometry.reassoc_motion_m=0.2"])
    loader = runner.dataset_loader
    rel_gt = loader.get_ground_truth("synth_00")[:14]
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.05, f"motion-gated odometry ATE too high: {ate}"


@pytest.mark.slow
def test_rimg16_tracks_jittered_beams(tmp_path):
    # Real sensors' beams do not land on pixel centers; the rimg16 upload
    # codec (per-pixel 8+8-bit sub-pixel offsets) must keep tracking under
    # per-beam angular de-calibration, where the separable-plane rimg8
    # format measurably degrades (docs/benchmark.md round-3 finding).
    runner = _run(tmp_path, ["slam/odometry/local_map=aggregated",
                             "dataset.beam_jitter_deg=0.1",
                             "slam.odometry.upload_format=rimg16",
                             "slam.odometry.num_points_padded=66560",
                             "slam.odometry.batch_size=7",
                             "slam.odometry.max_num_alignments=9"])
    loader = runner.dataset_loader
    rel_gt = loader.get_ground_truth("synth_00")[:14]
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.05, f"rimg16 jittered-beam ATE too high: {ate}"


def test_grid_regular_drives_codec_choice():
    # The codec rule lives in code, not docs: rimg8 (separable mean-offset
    # planes) is only claimed for grid-regular firing patterns; any
    # simulated de-calibration or a real dataset must declare
    # grid_regular=False so bench.py/tooling default to per-pixel-offset
    # formats (reference kitti_dataset.py:201-231 is exactly such a
    # de-calibrated sensor).
    regular = SyntheticDatasetLoader(SyntheticConfig(num_frames=1))
    jittered = SyntheticDatasetLoader(
        SyntheticConfig(num_frames=1, beam_jitter_deg=0.1))
    assert regular.grid_regular is True
    assert jittered.grid_regular is False
    from pylidar_slam_tpu.dataset.configuration import DatasetLoader
    # Real-sensor loaders inherit the conservative base default.
    base = DatasetLoader(SyntheticConfig(num_frames=1))
    assert base.grid_regular is False


@pytest.mark.slow
def test_bench_config_rimg_tracks_jittered_beams(tmp_path):
    # The bench accuracy config must survive de-calibrated beams when the
    # codec rule selects the per-pixel-offset rimg format (what bench.py
    # now auto-picks when loader.grid_regular is False): the accuracy
    # clause may not silently depend on a grid-regular sensor.
    runner = _run(tmp_path, ["slam/odometry/local_map=aggregated",
                             "dataset.beam_jitter_deg=0.1",
                             "slam.odometry.upload_format=rimg",
                             "slam.odometry.num_points_padded=65536",
                             "slam.odometry.batch_size=7",
                             "slam.odometry.max_num_alignments=8",
                             "slam.odometry.reassoc_every=8",
                             "slam.odometry.reassoc_motion_m=0.2"])
    loader = runner.dataset_loader
    rel_gt = loader.get_ground_truth("synth_00")[:14]
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.05, f"bench-config rimg jittered-beam ATE too high: {ate}"


@pytest.mark.slow
def test_projective_odometry_tracks_synthetic(tmp_path):
    runner = _run(tmp_path, ["slam/odometry/local_map=projective",
                             "slam.odometry.local_map.local_map_size=10",
                             "slam.odometry.max_num_alignments=10"])
    assert (tmp_path / "run" / "synth_00.poses.txt").exists()


def test_config_composition_defaults():
    cfg = compose("config", "slam", ["dataset=synthetic"])
    assert cfg["slam"]["odometry"]["algorithm"] == "icp_F2M"
    # Round-4 default: the surfel ("kdtree") champion map (config/slam.yaml)
    assert cfg["slam"]["odometry"]["local_map"]["type"] == "kdtree_local_map"
    assert cfg["slam"]["odometry"]["local_map"]["nn_backend"] == "hash"
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


def test_config_nested_defaults():
    """A group option file may select its own subgroups (hydra nested
    defaults) -- the ct_icp profile picks aggregated map + elastic alignment,
    while explicit CLI subgroup overrides still win."""
    cfg = compose("config", "slam", ["dataset=synthetic",
                                     "slam/odometry=ct_icp"])
    odo = cfg["slam"]["odometry"]
    assert odo["local_map"]["type"] == "aggregated_local_map"
    assert odo["alignment"]["elastic"] is True
    cfg2 = compose("config", "slam", [
        "dataset=synthetic", "slam/odometry=ct_icp",
        "slam/odometry/local_map=projective"])
    assert cfg2["slam"]["odometry"]["local_map"]["type"] == "projective_local_map"


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
    # Regression pin for the hash-ordered uniform grid-sample subsetting
    # (round-1's scan-order truncation kept a spatially biased 13% of the
    # winners and made this map window-fragile; measured ATE is ~0.006).
    assert ate < 0.02, f"surfel odometry ATE too high: {ate}"


@pytest.mark.slow
def test_surfel_motion_gated_reassociation_tracks(tmp_path):
    # Surfel map with periodic NN re-search off: the motion gate alone must
    # keep the exact-NN correspondences fresh enough to track.
    runner = _run(tmp_path, [
        "slam/odometry/local_map=kdtree",
        "slam.odometry.local_map.points_per_frame=1024",
        "slam.odometry.local_map.target_samples=8192",
        "slam.odometry.max_num_alignments=10",
        "slam.odometry.reassoc_every=10",
        "slam.odometry.reassoc_motion_m=0.2"])
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    rel_gt = runner.dataset_loader.get_ground_truth("synth_00")[:14]
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.02, f"surfel motion-gated ATE too high: {ate}"


@pytest.mark.slow
def test_surfel_hash_nn_tracks(tmp_path):
    # Voxel-hash candidate NN (ops/hash_nn.py): O(M+V) bucketed search in
    # place of the O(M*V) brute-force pass; must track the same sequence at
    # the same accuracy bar as the exact backend.
    runner = _run(tmp_path, [
        "slam/odometry/local_map=kdtree",
        "slam.odometry.local_map.points_per_frame=1024",
        "slam.odometry.local_map.target_samples=8192",
        "slam.odometry.local_map.nn_backend=hash",
        "slam.odometry.local_map.hash_buckets=8192",
        "slam.odometry.local_map.hash_capacity=32",
        "slam.odometry.max_num_alignments=10",
        "slam.odometry.reassoc_every=10",
        "slam.odometry.reassoc_motion_m=0.2"])
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    rel_gt = runner.dataset_loader.get_ground_truth("synth_00")[:14]
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    assert ate < 0.02, f"surfel hash-NN ATE too high: {ate}"


@pytest.mark.slow
def test_batched_odometry_matches_per_frame_constraints():
    """batch_size>1 must feed loop closure + backend the same per-frame
    constraint stream as batch_size=1 (round-1 weak #4): per-frame poses are
    fetched once per flush and downstream stages run deferred."""
    from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig

    def run(batch_size, n=12):
        cfg = compose("config", "slam", [
            "dataset=synthetic", f"dataset.num_frames={n}",
            "slam/odometry/local_map=aggregated",
            "slam.odometry.max_num_alignments=6",
            "slam.odometry.num_points_padded=65536",
            f"slam.odometry.batch_size={batch_size}",
            "slam/loop_closure=elevation_image",
            "slam.loop_closure.local_map_size=4",
            "slam.loop_closure.overlap=1",
            "slam.loop_closure.min_id_distance=6",
            "slam/backend=graph_slam"])
        loader = SyntheticDatasetLoader(
            dataclass_from_dict(SyntheticConfig, cfg["dataset"]))
        slam = SLAM(dataclass_from_dict(SLAMConfig, cfg["slam"]),
                    projector=loader.projector())
        slam.init()
        (datasets, _), _, _, _ = loader.sequences()
        ds = datasets[0]
        for i in range(n):
            slam.process_next_frame(ds[i])
        slam.finish()
        return slam

    slam1 = run(1)
    slam4 = run(4)
    c1 = slam1.backend.registered_odometry_constraints()
    c4 = slam4.backend.registered_odometry_constraints()
    assert len(c1) == len(c4) and len(c1) > 0, \
        f"constraint count mismatch: {len(c1)} vs {len(c4)}"
    for (i1, m1, _), (i4, m4, _) in zip(c1, c4):
        assert i1 == i4
        np.testing.assert_allclose(m1, m4, atol=1e-4)
    # Deferred queue fully drained; poses available for every frame.
    assert len(slam4._deferred_frames) == 0
    assert len(slam4.get_relative_poses()) == len(slam1.get_relative_poses())


def test_batched_mode_rejects_per_frame_init_priors():
    """batch_size>1 chains CV priors on device and never reads init_rpose,
    so pairing it with EI/PoseNet initialization must fail loudly instead of
    silently dropping the priors (VERDICT r2 weak #4)."""
    from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig
    cfg = SLAMConfig(
        initialization={"type": "ei"},
        odometry={"algorithm": "icp_F2M", "batch_size": 4,
                  "local_map": {"type": "aggregated_local_map"}})
    proj = SyntheticDatasetLoader(SyntheticConfig(num_frames=2)).projector()
    slam = SLAM(cfg, projector=proj)
    with pytest.raises(ValueError, match="batch_size"):
        slam.init()
    # CV stays fine at any batch size
    cfg_ok = SLAMConfig(
        initialization={"type": "cv"},
        odometry={"algorithm": "icp_F2M", "batch_size": 4,
                  "local_map": {"type": "aggregated_local_map"}})
    SLAM(cfg_ok, projector=proj).init()


@pytest.mark.slow
def test_elastic_ct_icp_tracks_skewed_synthetic(tmp_path):
    """The elastic (CT-ICP-class) profile tracks a rolling-shutter sequence
    with intra-scan rotation (reference ct_icp capability,
    ct_icp_odometry.py:311-336).  Measured on TPU, 100 frames, turn 0.08:
    elastic 0.99% tr_err vs plain 3.07% vs first-order deskew 12.7%."""
    runner = _run(tmp_path, [
        "dataset.skew=true", "dataset.turn_rate=0.08", "dataset.speed=1.2",
        "slam/odometry=ct_icp",
        "slam.odometry.num_points_padded=65536"])
    import pandas as pd
    df = pd.read_csv(tmp_path / "run" / "synth_00.poses.txt", sep=",")
    absolute = np.concatenate(
        [df.values.reshape(-1, 3, 4),
         np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(df), 1, 1))], axis=1)
    rel_pred = ev.compute_relative_poses(absolute)
    rel_gt = runner.dataset_loader.get_ground_truth("synth_00")[:14]
    ate, _ = ev.compute_ate(rel_pred, rel_gt)
    # Short windows are dominated by the first frames (identity prior); the
    # elastic-vs-plain margin (0.99% vs 3.07% tr_err) needs 100+ frames and
    # is documented in docs/benchmark.md.  This pins tracking (~0.078
    # measured; losing tracking at this spin gives > 0.3).
    assert ate < 0.12, f"elastic odometry ATE too high on skewed data: {ate}"


def test_cli_scalar_parsing():
    from pylidar_slam_tpu.config import _parse_scalar
    assert _parse_scalar("2e-4") == 2e-4  # YAML 1.1 would keep this a string
    assert _parse_scalar("1.5") == 1.5
    assert _parse_scalar("42") == 42
    assert _parse_scalar("true") is True
    assert _parse_scalar("[1, 2]") == [1, 2]
    assert _parse_scalar("hello") == "hello"


@pytest.mark.slow
def test_kitti_with_data_if_mounted(tmp_path):
    """Runs 120 frames of KITTI seq 00 end-to-end when $KITTI_ODOM_ROOT is
    mounted (VERDICT item 5: real-data wiring); skipped otherwise."""
    import os
    root = os.environ.get("KITTI_ODOM_ROOT")
    if not root or not __import__("pathlib").Path(root).exists():
        pytest.skip("KITTI_ODOM_ROOT not mounted")
    cfg = compose("config", "slam", [
        "dataset=kitti", 'dataset.train_sequences=["00"]',
        "max_num_frames=120",
        "slam/odometry/local_map=aggregated",
        "slam.odometry.num_points_padded=131072",
        f"log_dir={tmp_path}/kitti"])
    runner = SLAMRunner(dataclass_from_dict(SLAMRunnerConfig, cfg))
    metrics = runner.run_odometry()
    assert "00" in metrics
    # 120 frames ~ 130 m: at least one 100 m segment must evaluate, and the
    # pipeline must track (tr_err is a ratio; > 0.2 means tracking lost).
    assert metrics["00"]["tr_err"] < 0.2


@pytest.mark.slow
def test_batched_mid_sequence_loop_closure_optimization():
    """A loop-closure constraint fires MID-SEQUENCE at batch_size=4 (while
    later frames are already odometry-processed and deferred), the backend
    optimizes, update_positions rewrites submap poses -- and the final
    trajectory matches the batch_size=1 run (VERDICT r2 weak #7: constraint
    equivalence alone did not cover a mid-sequence optimization)."""
    from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig

    n = 40

    def run(batch_size):
        cfg = compose("config", "slam", [
            "dataset=synthetic", f"dataset.num_frames={n}",
            "dataset.turn_rate=0.01",
            "slam/odometry/local_map=aggregated",
            "slam.odometry.max_num_alignments=6",
            "slam.odometry.num_points_padded=65536",
            f"slam.odometry.batch_size={batch_size}",
            "slam/loop_closure=elevation_image",
            "slam.loop_closure.local_map_size=4",
            "slam.loop_closure.overlap=1",
            "slam.loop_closure.min_id_distance=9",
            "slam.loop_closure.max_distance=1e6",
            "slam/backend=graph_slam"])
        loader = SyntheticDatasetLoader(
            dataclass_from_dict(SyntheticConfig, cfg["dataset"]))
        slam = SLAM(dataclass_from_dict(SLAMConfig, cfg["slam"]),
                    projector=loader.projector())
        slam.init()
        (datasets, _), _, _, _ = loader.sequences()
        ds = datasets[0]
        edges_before_last = 0
        for i in range(n):
            slam.process_next_frame(ds[i])
            if i == n - 2:
                edges_before_last = len(slam.backend._edges)
        slam.finish()
        return slam, edges_before_last

    slam1, _ = run(1)
    slam4, edges_mid = run(4)

    loops1 = slam1.backend.registered_loop_constraints()
    loops4 = slam4.backend.registered_loop_constraints()
    assert len(loops1) > 0, "no loop constraint fired -- test setup broken"
    assert [(i, j) for i, j, *_ in loops4] == [(i, j) for i, j, *_ in loops1]
    # The batched run accumulated constraints BEFORE sequence end (the
    # deferred drain ran mid-sequence, not only in finish()).
    assert edges_mid > 0, "batched drain only happened at finish()"

    # Optimized trajectories agree between the two modes.
    t1 = np.asarray(slam1.get_absolute_poses())
    t4 = np.asarray(slam4.get_absolute_poses())
    assert t1.shape == t4.shape
    np.testing.assert_allclose(t4[:, :3, 3], t1[:, :3, 3], atol=2e-2)
