"""Pose-graph backend test: noisy circle + loop closure converges to GT
(headless version of the reference's tests/test_backend.py oracle)."""
import numpy as np
import pytest

from pylidar_slam_tpu.ops import pose_graph as pg
from pylidar_slam_tpu.slam.backend import GraphSLAM, GraphSLAMConfig

import jax.numpy as jnp


def _circle_poses(n=101, radius=10.0):
    """Absolute GT poses around a circle, heading tangent."""
    poses = []
    for k in range(n):
        theta = 2 * np.pi * k / (n - 1)
        c, s = np.cos(theta), np.sin(theta)
        mat = np.eye(4)
        mat[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        mat[:3, 3] = [radius * c, radius * s, 0.0]
        poses.append(mat)
    return np.stack(poses)


def test_log_exp_rotation_round_trip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(-2, 2, (32, 3)), jnp.float32)
    rots = pg.exp_rotation(w)
    back = pg.log_rotation(rots)
    rots2 = pg.exp_rotation(back)
    # f32 precision degrades near theta = pi (sin theta -> 0)
    np.testing.assert_allclose(rots2, rots, atol=1e-3)


def test_graph_slam_circle_with_loop_closure():
    rng = np.random.default_rng(3)
    gt = _circle_poses(61)
    relatives = np.linalg.inv(gt[:-1]) @ gt[1:]
    # Backend's world frame starts at its first pose (identity)
    gt = np.linalg.inv(gt[0]) @ gt

    backend = GraphSLAM(GraphSLAMConfig(max_optim_iterations=15,
                                        cg_iterations=40))
    backend.init()

    # Feed noisy odometry constraints frame by frame
    for k, rel in enumerate(relatives):
        noisy = rel.copy()
        noisy[:3, 3] += rng.normal(scale=0.03, size=3)
        data_dict = {backend.se3_odometry_constraint(k): (noisy, None)}
        backend.next_frame(data_dict)

    drift_before = np.linalg.norm(
        backend.absolute_poses()[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_before > 0.05  # odometry alone has accumulated drift

    # Loop closure: last pose == first pose (identity relative transform)
    data_dict = {backend.se3_loop_closure_constraint(0, 60):
                 (np.eye(4), np.diag([10.0] * 3 + [10.0] * 3))}
    backend.next_frame(data_dict)
    assert backend.need_to_update_pose

    optimized = backend.absolute_poses()
    drift_after = np.linalg.norm(optimized[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_after < 0.3 * drift_before, \
        f"loop closure did not reduce drift: {drift_before} -> {drift_after}"
    # intermediate poses stay near the circle
    mid_err = np.linalg.norm(optimized[30][:3, 3] - gt[30][:3, 3])
    assert mid_err < 1.0


def test_constraint_regex_protocol():
    backend = GraphSLAM(GraphSLAMConfig())
    backend.init()
    d = {
        backend.se3_odometry_constraint(0): (np.eye(4), None),
        backend.se3_loop_closure_constraint(0, 1): (np.eye(4), None),
        backend.se3_absolute_constraint(1): (np.eye(4), None),
        "unrelated_key": 42,
    }
    backend.next_frame(d)
    assert len(backend.registered_odometry_constraints()) == 1
    assert len(backend.registered_loop_constraints()) == 1
    assert len(backend.registered_absolute_constraints()) == 1


def test_default_information_by_constraint_type():
    """Default information matrices are keyed on constraint TYPE, not index
    distance (reference backend.py:348-358): a loop closure between nearby
    frames must still get loop-closure-grade (low) weight."""
    slam = GraphSLAM(GraphSLAMConfig(online_optimization=False))
    slam.init()
    rel = np.eye(4)
    rel[0, 3] = 1.0
    for k in range(4):
        d = {f"se3_odometry_constraint_{k}": (rel, None)}
        slam.next_frame(d)
    # A loop closure between NEARBY frames (|i-j| = 3 < 10)
    d = {"se3_loop_closure_constraint_0_3": (np.eye(4), None)}
    slam.next_frame(d)

    odo_edges = [e for e in slam._edges if e[1] - e[0] == 1]
    loop_edges = [e for e in slam._edges if (e[0], e[1]) == (0, 3)]
    assert len(odo_edges) == 4 and len(loop_edges) == 1
    np.testing.assert_allclose(np.diag(odo_edges[0][3]),
                               [2, 2, 2, 5, 5, 5])
    np.testing.assert_allclose(np.diag(loop_edges[0][3]),
                               [0.1, 0.1, 0.1, 0.5, 0.5, 0.5])
