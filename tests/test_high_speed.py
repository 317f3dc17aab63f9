"""High-speed (KITTI-01-class) motion regression: the EI bootstrap.

The constant-velocity prior is identity at frame 1; when per-frame motion
exceeds the ICP correspondence gate, frame 1 never locks and the poisoned
pose feeds back through the CV prior forever (measured: surfel map at
2 m/frame scored ~100% tr_err before the bootstrap).  The BEV
phase-correlation bootstrap (icp_odometry.py::_ei_bootstrap_pose,
capability of reference initialization.py EI init) restores tracking; these
tests pin it at 2 m/frame for both map families.
"""
import numpy as np
import pytest

from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                SyntheticSequence)
from pylidar_slam_tpu.eval.eval_odometry import compute_absolute_poses
from pylidar_slam_tpu.ops.projection import SphericalProjection
from pylidar_slam_tpu.slam.odometry.icp_odometry import (
    ICPFrameToModel, ICPFrameToModelConfig)


SPEED = 2.0
FRAMES = 14


@pytest.fixture(scope="module")
def fast_seq():
    cfg = SyntheticConfig(lidar_height=64, lidar_width=1024,
                          num_frames=FRAMES, num_walls=40, num_pillars=25,
                          speed=SPEED)
    seq = SyntheticSequence(cfg, "synth_fast", seed=cfg.seed)
    frames = [np.asarray(seq[i]["numpy_pc"], np.float32)
              for i in range(FRAMES)]
    gt = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                   for i in range(FRAMES)])
    return frames, np.linalg.inv(gt[0]) @ gt


def _run(frames, icp_cfg, feed_init=True):
    odom = ICPFrameToModel(icp_cfg, projector=SphericalProjection(
        64, 1024, 3.0, -24.0))
    odom.init()
    last = np.eye(4, dtype=np.float32)
    for pc in frames:
        d = {"numpy_pc": pc, "encoded_upload": odom.encode_upload(pc)}
        if feed_init:
            d["init_rpose"] = last
        odom.process_next_frame(d)
        last = d.get("odometry_pose", last)
    odom.finish()
    return compute_absolute_poses(odom.get_relative_poses())


def _ate(traj, gt):
    return float(np.linalg.norm(traj[:, :3, 3] - gt[:len(traj), :3, 3],
                                axis=1).mean())


def test_ei_bootstrap_estimate_accuracy(fast_seq):
    """The frame-0 -> frame-1 BEV estimate itself is cm-accurate at
    2 m/frame (the raw single-scan phase correlation without ground
    suppression locks onto the egocentric ground pattern at ZERO shift)."""
    frames, gt = fast_seq
    cfg = ICPFrameToModelConfig(
        max_num_alignments=1, local_map={"type": "aggregated_local_map"},
        alignment={"gauss_newton_config": {}}, num_points_padded=66560,
        data_key="numpy_pc", upload_format="rimg8", batch_size=1)
    odom = ICPFrameToModel(cfg, projector=SphericalProjection(
        64, 1024, 3.0, -24.0))
    odom._boot_cloud = frames[0][:, :3]
    est = odom._ei_bootstrap_pose({"numpy_pc": frames[1]})
    assert est is not None
    gt_rel = np.linalg.inv(gt[0]) @ gt[1]
    err = np.linalg.norm(np.asarray(est)[:3, 3] - gt_rel[:3, 3])
    assert err < 0.15, f"bootstrap translation error {err:.3f} m"


@pytest.mark.slow
def test_surfel_hash_tracks_at_speed(fast_seq):
    """Surfel champion (hash NN + held pairs, 1.0 m gate) at 2 m/frame:
    lost tracking irrecoverably before the EI bootstrap."""
    frames, gt = fast_seq
    cfg = ICPFrameToModelConfig(
        max_num_alignments=10, reassoc_every=100, reassoc_motion_m=0.2,
        local_map={"type": "kdtree_local_map", "local_map_size": 30,
                   "points_per_frame": 4096, "sample_voxel_size": 0.3,
                   "target_samples": 16384, "target_voxel_size": 0.4,
                   "max_neighbor_dist": 1.0, "levenberg_damping": 0.0,
                   "normals_mode": "knn", "nn_backend": "hash"},
        alignment={"gauss_newton_config": {"scheme": "neighborhood",
                                           "sigma": 0.2, "max_iters": 1}},
        num_points_padded=66560, data_key="numpy_pc",
        upload_format="rimg8", batch_size=1)
    traj = _run(frames, cfg)
    ate = _ate(traj, gt)
    assert ate < 0.1, f"surfel lost tracking at speed {SPEED}: ATE {ate:.3f}"


@pytest.mark.slow
def test_aggregated_batched_tracks_at_speed(fast_seq):
    """Aggregated map through the BATCHED pipeline (the bench path): the
    bootstrap must reach the device CV chain via last_rpose_device."""
    frames, gt = fast_seq
    cfg = ICPFrameToModelConfig(
        max_num_alignments=12, reassoc_every=2,
        local_map={"type": "aggregated_local_map", "local_map_size": 20,
                   "window_rows": 1, "window_cols": 2,
                   "max_neighbor_dist": 0.6},
        alignment={"gauss_newton_config": {"scheme": "geman_mcclure",
                                           "sigma": 0.3, "max_iters": 1}},
        num_points_padded=66560, data_key="numpy_pc",
        upload_format="rimg8", batch_size=4)
    traj = _run(frames, cfg, feed_init=False)
    ate = _ate(traj, gt)
    assert ate < 0.35, f"aggregated lost tracking at speed {SPEED}: " \
        f"ATE {ate:.3f}"


def test_ei_initialization_module_sees_large_motion(fast_seq):
    """The registered EI initialization module (slam/initialization.py) is
    cm-accurate at 2 m/frame.  Without ground suppression it locked onto
    the egocentric ground pattern and estimated ~0 motion."""
    from pylidar_slam_tpu.slam.initialization import (
        EIConfig, ElevationImageInitialization)
    frames, gt = fast_seq
    init = ElevationImageInitialization(EIConfig())
    init.init()
    assert init.next_initial_pose({"numpy_pc": frames[0]}) is None
    est = init.next_initial_pose({"numpy_pc": frames[1]})
    gt_rel = np.linalg.inv(gt[0]) @ gt[1]
    err = np.linalg.norm(np.asarray(est)[:3, 3] - gt_rel[:3, 3])
    assert err < 0.15, f"EI init translation error {err:.3f} m"

    # ...and ground suppression off reproduces the zero-lock failure,
    # proving the mask is the load-bearing ingredient.
    raw = ElevationImageInitialization(EIConfig(ground_margin=0.0))
    raw.init()
    raw.next_initial_pose({"numpy_pc": frames[0]})
    est_raw = raw.next_initial_pose({"numpy_pc": frames[1]})
    assert np.linalg.norm(np.asarray(est_raw)[:3, 3]) < 0.5


@pytest.mark.slow
def test_projective_tracks_at_speed(fast_seq):
    """The projective map (run.py default) through the vertex-map path:
    the bootstrap reaches it via process_next_frame's init selection."""
    import jax.numpy as jnp
    from pylidar_slam_tpu.ops import projection
    frames, gt = fast_seq
    proj = SphericalProjection(64, 1024, 3.0, -24.0)
    cfg = ICPFrameToModelConfig(
        max_num_alignments=10,
        local_map={"type": "projective_local_map", "local_map_size": 20},
        alignment={"gauss_newton_config": {"scheme": "geman_mcclure",
                                           "sigma": 0.3, "max_iters": 1}},
        data_key="vertex_map")
    odom = ICPFrameToModel(cfg, projector=proj)
    odom.init()
    last = None
    for pc in frames[:8]:
        vmap = projection.build_vertex_map(
            jnp.asarray(pc[:, :3]), proj,
            jnp.max(jnp.abs(jnp.asarray(pc[:, :3])), axis=-1) > 0)
        d = {"vertex_map": vmap}
        if last is not None:
            d["init_rpose"] = last
        odom.process_next_frame(d)
        last = np.asarray(d["odometry_pose"])
    traj = compute_absolute_poses(odom.get_relative_poses())
    ate = _ate(traj, gt)
    assert ate < 0.35, f"projective lost tracking at speed {SPEED}: " \
        f"ATE {ate:.3f}"


def test_informative_init_wins(fast_seq):
    """A caller-supplied non-identity init (PoseNet/NI) must NOT be
    overridden by the bootstrap."""
    frames, gt = fast_seq
    cfg = ICPFrameToModelConfig(
        max_num_alignments=1, local_map={"type": "aggregated_local_map"},
        alignment={"gauss_newton_config": {}}, num_points_padded=66560,
        data_key="numpy_pc", upload_format="rimg8", batch_size=1)
    odom = ICPFrameToModel(cfg, projector=SphericalProjection(
        64, 1024, 3.0, -24.0))
    odom._boot_cloud = frames[0][:, :3]
    odom._iter = 1
    supplied = np.eye(4, dtype=np.float32)
    supplied[0, 3] = 1.23
    out = odom._maybe_bootstrap({"numpy_pc": frames[1]}, supplied)
    np.testing.assert_allclose(np.asarray(out), supplied)


@pytest.mark.slow
def test_aggregated_highway_profile_meets_envelope_bar(fast_seq):
    """The aggregated_highway profile holds the 2 m/frame 120 m envelope:
    0.53% tr_err on the TPU (the target platform; envelope bar 0.8%, the
    reference's own KITTI seq-01 is 0.79%, BASELINE.md), 0.85% on this CPU
    harness -- the f32 window normal fits diverge by platform reduction
    order, see docs/benchmark.md.  The lever is model NORMAL quality, not
    association staleness: merged-model refits (`model_normals`) + the
    centered f32-robust window solve (`normals_fit: centered`) + a shorter
    model age; see config/slam/odometry/aggregated_highway.yaml.  The CPU
    assertion pins regressions with a platform margin."""
    from pylidar_slam_tpu.eval.eval_odometry import compute_kitti_metrics

    frames_14, _ = fast_seq
    del frames_14  # the tr_err metric needs >= 100 m: build the long run
    n = 60
    cfg = SyntheticConfig(lidar_height=64, lidar_width=1024,
                          num_frames=n, num_walls=40, num_pillars=25,
                          speed=SPEED)
    seq = SyntheticSequence(cfg, "synth_hwy", seed=cfg.seed)
    frames = [np.asarray(seq[i]["numpy_pc"], np.float32) for i in range(n)]
    gt = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                   for i in range(n)])
    gt = np.linalg.inv(gt[0]) @ gt

    icp_cfg = ICPFrameToModelConfig(
        max_num_alignments=12, reassoc_every=8, reassoc_motion_m=0.2,
        local_map={"type": "aggregated_local_map", "local_map_size": 10,
                   "window_rows": 1, "window_cols": 2,
                   "max_neighbor_dist": 0.6, "model_normals": True,
                   "normals_fit": "centered"},
        alignment={"gauss_newton_config": {"scheme": "geman_mcclure",
                                           "sigma": 0.4, "max_iters": 1}},
        num_points_padded=66560, data_key="numpy_pc",
        upload_format="rimg8", batch_size=12)
    traj = _run(frames, icp_cfg, feed_init=False)
    tr_err, _, _ = compute_kitti_metrics(traj, gt)
    assert tr_err is not None
    assert 100 * tr_err <= 0.95, \
        f"highway profile tr_err {100 * tr_err:.3f}% at {SPEED} m/frame " \
        f"(CPU pin 0.95; measured 0.85 CPU / 0.53 TPU at recording time)"
