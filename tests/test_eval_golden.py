"""Golden tests for the evaluation metrics (the acceptance instrument):
analytically-known trajectories must produce exactly-predictable errors."""
import numpy as np
import pytest

from pylidar_slam_tpu.eval import eval_odometry as ev


def _straight_line(n, step=1.0):
    """Absolute poses marching along +x, `step` meters per frame."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_relative_absolute_round_trip():
    rng = np.random.default_rng(0)
    n = 50
    poses = np.tile(np.eye(4), (n, 1, 1))
    angle = 0.0
    pos = np.zeros(3)
    for k in range(1, n):
        angle += rng.uniform(-0.05, 0.05)
        pos += [np.cos(angle), np.sin(angle), 0.01]
        poses[k, :3, :3] = np.array([[np.cos(angle), -np.sin(angle), 0],
                                     [np.sin(angle), np.cos(angle), 0],
                                     [0, 0, 1]])
        poses[k, :3, 3] = pos
    rel = ev.compute_relative_poses(poses)
    back = ev.compute_absolute_poses(rel)
    np.testing.assert_allclose(back, poses, atol=1e-9)


def test_kitti_metric_pure_scale_drift():
    """A trajectory that covers exactly 99 m per 100 m of GT distance must
    show tr_err = 1 m / 100 m = 0.01 on every segment."""
    n = 1000
    gt = _straight_line(n, step=1.0)
    pred = _straight_line(n, step=0.99)
    tr_err, rot_err, errors = ev.compute_kitti_metrics(pred, gt)
    # the segment spans the first frame EXCEEDING the length (e.g. 101 m for
    # a 100 m segment), so each error is 0.01 * span / segment
    assert abs(tr_err - 0.01) < 2e-4
    assert abs(rot_err) < 1e-9
    assert len(errors) > 0
    for e in errors:
        span = e["last_frame"] - e["first_frame"]
        expected = 0.01 * span / e["segment"]
        assert abs(e["tr_err"] - expected) < 1e-9


def test_kitti_metric_rotation_error():
    """A constant yaw bias of 0.01 rad at segment ends -> r_err =
    0.01 / segment_length per segment."""
    n = 300
    gt = _straight_line(n, step=1.0)
    pred = gt.copy()
    yaw = 0.01
    rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    # rotate every pose by the same bias: relative segment error has the
    # identity rotation... instead rotate only the even poses
    pred[1::2, :3, :3] = rot
    _, rot_err, errors = ev.compute_kitti_metrics(pred, gt)
    # start frames are even (step 10): segment [even -> odd or even]
    for e in errors:
        expected = yaw / e["segment"] if (e["last_frame"] % 2 == 1) else 0.0
        assert abs(e["r_err"] - expected) < 1e-6


def test_ate_are_known_values():
    n = 10
    gt_rel = np.tile(np.eye(4), (n, 1, 1))
    gt_rel[:, 0, 3] = 1.0
    pred_rel = gt_rel.copy()
    pred_rel[:, 1, 3] = 0.3  # constant 0.3 m lateral error per frame
    ate, std_ate = ev.compute_ate(pred_rel, gt_rel)
    assert abs(ate - 0.3) < 1e-9
    assert abs(std_ate) < 1e-9

    yaw = 0.02
    pred_rel[:, :3, :3] = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    are, std_are = ev.compute_are(pred_rel, gt_rel)
    # ||R_err - I||_F for a yaw rotation = 2 |sin(yaw/2)| * sqrt(2)
    expected = 2 * abs(np.sin(yaw / 2)) * np.sqrt(2)
    np.testing.assert_allclose(are, expected, rtol=1e-6)


def test_segments_need_100m():
    """Short trajectories produce no KITTI segments (reference behavior)."""
    gt = _straight_line(50, step=1.0)  # 49 m total
    tr_err, rot_err, errors = ev.compute_kitti_metrics(gt, gt)
    assert tr_err is None and len(errors) == 0


def test_rescale_mode():
    gt_rel = np.tile(np.eye(4), (20, 1, 1))
    gt_rel[:, 0, 3] = 2.0
    pred_rel = gt_rel.copy()
    pred_rel[:, 0, 3] = 1.0  # scale-free prediction at half scale
    rescaled = ev.rescale_prediction(pred_rel, gt_rel)
    np.testing.assert_allclose(rescaled[:, 0, 3], 2.0, atol=1e-9)


def test_short_sequences_still_report_ate(tmp_path):
    """Sequences under 100 m carry ATE/ARE in metrics.yaml (the KITTI
    segment metrics are simply absent); the AVG row averages each key over
    the sequences that report it."""
    import yaml

    results = ev.OdometryResults(str(tmp_path))
    short = _straight_line(30, step=1.0)   # 29 m: no KITTI segments
    longr = _straight_line(150, step=1.0)  # > 100 m: full metrics
    rel_short = np.linalg.inv(short[:-1]) @ short[1:]
    rel_long = np.linalg.inv(longr[:-1]) @ longr[1:]
    results.add_sequence("short", rel_short, rel_short)
    results.add_sequence("long", rel_long, rel_long)
    results.close()
    m = yaml.safe_load(open(tmp_path / "metrics.yaml"))
    assert "ATE" in m["short"] and "tr_err" not in m["short"]
    assert "tr_err" in m["long"]
    # AVG's tr_err averages only the long sequence's value
    np.testing.assert_allclose(m["AVG"]["tr_err"], m["long"]["tr_err"])
    np.testing.assert_allclose(
        m["AVG"]["ATE"], (m["short"]["ATE"] + m["long"]["ATE"]) / 2)
