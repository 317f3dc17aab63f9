"""CT-ICP continuous-time pose surface (reference ct_icp_odometry.py:173,
326-336): begin/mid/end per-frame poses and the tuned profile configs."""
import numpy as np
import pytest

from pylidar_slam_tpu.config import compose
from pylidar_slam_tpu.slam.odometry.icp_odometry import (_ct_relative_poses,
                                                         _pose_fraction_f64,
                                                         _pose_matrix_f64)


def _rot_z(a):
    m = np.eye(4)
    m[0, 0] = m[1, 1] = np.cos(a)
    m[0, 1] = -np.sin(a)
    m[1, 0] = np.sin(a)
    return m


def test_pose_fraction_endpoints_and_midpoint():
    mat = _rot_z(0.3)
    mat[:3, 3] = [1.0, 2.0, 0.5]
    np.testing.assert_allclose(_pose_fraction_f64(mat, 0.0), np.eye(4),
                               atol=1e-12)
    np.testing.assert_allclose(_pose_fraction_f64(mat, 1.0), mat, atol=1e-9)
    half = _pose_fraction_f64(mat, 0.5)
    # rotation halves on the geodesic; translation lerps
    np.testing.assert_allclose(half[:3, :3] @ half[:3, :3], mat[:3, :3],
                               atol=1e-9)
    np.testing.assert_allclose(half[:3, 3], 0.5 * mat[:3, 3], atol=1e-12)


def test_pose_fraction_identity_is_identity():
    np.testing.assert_allclose(_pose_fraction_f64(np.eye(4), 0.5), np.eye(4),
                               atol=1e-12)


def test_ct_relative_poses_constant_velocity_chain():
    """Under truly constant velocity, begin/mid/end relative poses are all
    the same motion -- the mid/end surfaces shift WHERE the pose is sampled,
    not the per-frame delta."""
    step = _rot_z(0.05)
    step[:3, 3] = [1.0, 0.1, 0.0]
    rel = np.stack([np.eye(4)] + [step] * 5)
    for frac in (0.5, 1.0):
        out = _ct_relative_poses(rel, frac)
        np.testing.assert_allclose(out[0], np.eye(4), atol=1e-12)
        # frames 2..n: steady state, delta == step conjugated into the
        # frac-shifted frame (inv(f) @ step @ f, f = fraction(step, frac))
        f = _pose_fraction_f64(step, frac)
        expected = np.linalg.solve(f, step @ f)
        for k in range(2, 6):
            np.testing.assert_allclose(out[k], expected, atol=1e-9)
        # frame 1: ramps from rest -- the mid/end pose absorbs the partial
        # sweep motion, so the first delta exceeds the begin-pose delta
        d1 = np.linalg.norm(out[1][:3, 3])
        assert d1 >= np.linalg.norm(step[:3, 3]) - 1e-9


def test_ct_relative_poses_compose_to_same_endpoint_class():
    """Accumulating mid-pose deltas lands within one half-step of the
    begin-pose endpoint (the surfaces differ by the final half-sweep)."""
    rng = np.random.default_rng(0)
    rel = [np.eye(4)]
    for _ in range(8):
        m = _rot_z(rng.uniform(-0.05, 0.05))
        m[:3, 3] = rng.uniform(-0.2, 1.0, 3)
        rel.append(m)
    rel = np.stack(rel)
    ends = {}
    for name, frac in [("begin", None), ("mid", 0.5), ("end", 1.0)]:
        seq = rel if frac is None else _ct_relative_poses(rel, frac)
        acc = np.eye(4)
        for m in seq:
            acc = acc @ m
        ends[name] = acc
    max_step = max(np.linalg.norm(m[:3, 3]) for m in rel)
    assert np.linalg.norm(ends["mid"][:3, 3] - ends["begin"][:3, 3]) <= max_step
    assert np.linalg.norm(ends["end"][:3, 3] - ends["begin"][:3, 3]) <= max_step


def test_ct_profiles_compose(monkeypatch):
    monkeypatch.setenv("KITTI_ODOM_ROOT", "/tmp")
    expectations = {
        "ct_icp": dict(pose_type="mid_pose"),
        "ct_icp_drive": dict(pose_type="mid_pose"),
        "ct_icp_robust_drive": dict(anneal=True),
        "ct_icp_slow_outdoor": dict(max_nd=0.6),
        "ct_icp_robust_shaky": dict(anneal=True, window_cols=3),
    }
    for name, exp in expectations.items():
        cfg = compose("config", "slam", overrides=[f"slam/odometry={name}"])
        od = cfg["slam"]["odometry"]
        assert od["alignment"].get("elastic") is True, name
        if "pose_type" in exp:
            assert od.get("pose_type") == exp["pose_type"], name
        if exp.get("anneal"):
            assert od["alignment"]["gauss_newton_config"]["sigma_start"] > 0, name
            assert od["local_map"]["max_neighbor_dist_start"] > 0, name
        if "window_cols" in exp:
            assert od["local_map"]["window_cols"] == exp["window_cols"], name
        if "max_nd" in exp:
            assert od["local_map"]["max_neighbor_dist"] == exp["max_nd"], name
        # Every profile carries the pyct_icp solver option surface
        # (plane-residual gate + at least one beta prior).
        gn = od["alignment"]["gauss_newton_config"]
        assert gn.get("max_dist_to_plane", 0) > 0, name
        assert any(gn.get(k, 0) > 0 for k in (
            "beta_location_consistency", "beta_constant_velocity",
            "beta_small_velocity", "beta_orientation_consistency")), name


def test_elastic_odometry_reports_selected_pose_type():
    """pose_type=mid_pose changes the reported relative poses of an elastic
    run; begin_pose matches the raw params ledger."""
    from pylidar_slam_tpu.slam.odometry.icp_odometry import (
        ICPFrameToModel, ICPFrameToModelConfig)
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticDatasetLoader)
    loader = SyntheticDatasetLoader(SyntheticConfig(
        lidar_height=16, lidar_width=128, num_frames=5, num_walls=12,
        num_pillars=8))
    seq = loader.sequences()[0][0][0]
    cfg = ICPFrameToModelConfig(
        max_num_alignments=4, num_points_padded=4096, data_key="numpy_pc",
        pose_type="mid_pose",
        local_map={"type": "aggregated_local_map", "local_map_size": 10},
        alignment={"elastic": True,
                   "gauss_newton_config": {"scheme": "geman_mcclure",
                                           "sigma": 0.5}})
    odom = ICPFrameToModel(cfg, projector=loader.projector())
    odom.init()
    last = np.eye(4, dtype=np.float32)
    for i in range(5):
        d = {"numpy_pc": seq[i]["numpy_pc"], "init_rpose": last}
        odom.process_next_frame(d)
        last = d.get("odometry_pose", last)
    mid = odom.get_relative_poses()
    begin = odom.get_ct_relative_poses("begin_pose")
    end = odom.get_ct_relative_poses("end_pose")
    params = odom.fetch_params_log()
    raw = np.stack([_pose_matrix_f64(p) for p in params])
    np.testing.assert_allclose(begin, raw, atol=1e-12)
    # the sequence moves ~0.5 m/frame: the three surfaces must differ
    assert not np.allclose(mid, begin, atol=1e-6)
    assert not np.allclose(end, mid, atol=1e-6)


# ----------------------------------------------------------------------------
# CT solver option surface (pyct_icp CTICPOptions equivalents:
# max_dist_to_plane gate + beta pose priors -- ct_icp_odometry.py:57-160)
# ----------------------------------------------------------------------------

def _run_elastic(gn_extra, frames=5, init=None, fixed_init=None,
                 odo_extra=None):
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticDatasetLoader)
    from pylidar_slam_tpu.slam.odometry.icp_odometry import (
        ICPFrameToModel, ICPFrameToModelConfig)
    loader = SyntheticDatasetLoader(SyntheticConfig(
        lidar_height=16, lidar_width=128, num_frames=frames, num_walls=12,
        num_pillars=8))
    seq = loader.sequences()[0][0][0]
    gn = {"scheme": "geman_mcclure", "sigma": 0.5}
    gn.update(gn_extra)
    cfg = ICPFrameToModelConfig(
        max_num_alignments=4, num_points_padded=4096, data_key="numpy_pc",
        local_map={"type": "aggregated_local_map", "local_map_size": 10},
        alignment={"elastic": True, "gauss_newton_config": gn},
        **(odo_extra or {}))
    odom = ICPFrameToModel(cfg, projector=loader.projector())
    odom.init()
    last = np.eye(4, dtype=np.float32) if init is None else init
    for i in range(frames):
        d = {"numpy_pc": seq[i]["numpy_pc"],
             "init_rpose": last if fixed_init is None else fixed_init}
        odom.process_next_frame(d)
        last = d.get("odometry_pose", last)
    return odom.get_relative_poses()


def test_gn_prior_terms_solve_exactly():
    """With no data residuals, the prior terms ARE the solve: dx == -d
    (h = diag(w), g = w d -- identity-Jacobian quadratic prior)."""
    import jax.numpy as jnp

    from pylidar_slam_tpu.ops import optimization
    res = jnp.zeros((8,))
    jac = jnp.zeros((8, 6))
    w = jnp.zeros((8,))
    d = jnp.array([0.1, -0.2, 0.3, 0.01, -0.02, 0.03])
    pw = jnp.full((6,), 5.0)
    dx, _, singular = optimization.gauss_newton_step(
        res, jac, w, prior_res=d, prior_weight=pw)
    assert not bool(singular)
    np.testing.assert_allclose(np.asarray(dx), -np.asarray(d), atol=1e-6)


def test_beta_small_velocity_pins_motion():
    """An overwhelming small-velocity prior must pin the solved motion at
    (near) zero even though the scene moves ~1 m/frame -- proof the beta
    term enters the normal equations with the intended geometry."""
    free = _run_elastic({})
    pinned = _run_elastic({"beta_small_velocity": 1.0e6})
    free_motion = np.linalg.norm(free[1:, :3, 3], axis=1).mean()
    pinned_motion = np.linalg.norm(pinned[1:, :3, 3], axis=1).mean()
    assert free_motion > 0.3  # the sequence really moves
    assert pinned_motion < 0.05 * free_motion


def test_beta_constant_velocity_pulls_to_prior():
    """An overwhelming constant-velocity prior keeps the solution at the
    caller-supplied init pose (the CV-extrapolated prior)."""
    prior = np.eye(4, dtype=np.float32)
    prior[0, 3] = 0.7
    pulled = _run_elastic({"beta_constant_velocity": 1.0e6},
                          fixed_init=prior)
    # every registered frame: solved pose == the supplied prior, not the
    # data fit (the free run tracks ~0.35 m/frame on this sequence)
    np.testing.assert_allclose(pulled[1:, 0, 3], 0.7, atol=0.02)


def test_max_dist_to_plane_gates_all_when_tiny():
    """A vanishing plane-residual gate rejects every correspondence: the GN
    system goes singular and ICP must keep the init pose (identity) rather
    than stepping on garbage."""
    gated = _run_elastic({"max_dist_to_plane": 1.0e-7},
                         odo_extra={"ei_bootstrap": False})
    np.testing.assert_allclose(gated[1:], np.broadcast_to(
        np.eye(4), gated[1:].shape), atol=1e-5)


def test_max_dist_to_plane_wide_gate_is_noop():
    """A gate wider than any residual leaves the trajectory unchanged --
    the option surface costs nothing when inactive."""
    base = _run_elastic({})
    wide = _run_elastic({"max_dist_to_plane": 1.0e4})
    np.testing.assert_allclose(wide, base, atol=1e-6)
