"""Trajectory evaluation: KITTI relative errors, ATE/ARE, results aggregation.

Host-side numpy, numerically faithful to the reference's evaluation
(slam/eval/eval_odometry.py) -- this module is the acceptance instrument for
trajectory parity, so the metric definitions match to the digit:

* KITTI metric: per-(start, segment in {100..800 m}) windows over cumulative
  GT arc length, pose error inv(delta_traj) @ delta_gt, rotation via
  trace-acos, translation norm, averaged (reference eval_odometry.py:99-182).
* ATE/ARE: mean +- std of per-frame relative translation/rotation diffs.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import yaml

from pylidar_slam_tpu.utils import assert_debug, check_tensor

DEFAULT_SEGMENTS = [100, 200, 300, 400, 500, 600, 700, 800]


def list_poses_to_poses_array(poses_list: list) -> np.ndarray:
    return np.concatenate([np.expand_dims(p, axis=0) for p in poses_list], axis=0)


def shift_poses(poses: np.ndarray) -> np.ndarray:
    shifted = poses[:-1, :4, :4]
    return np.concatenate([np.expand_dims(np.eye(4), axis=0), shifted], axis=0)


def compute_relative_poses(poses: np.ndarray) -> np.ndarray:
    return np.linalg.inv(shift_poses(poses)) @ poses


def compute_absolute_poses(relative_poses: np.ndarray) -> np.ndarray:
    absolute = relative_poses.copy()
    for i in range(absolute.shape[0] - 1):
        absolute[i + 1] = absolute[i] @ relative_poses[i + 1]
    return absolute


def compute_cumulative_trajectory_length(trajectory: np.ndarray) -> np.ndarray:
    shifted = shift_poses(trajectory)
    lengths = np.linalg.norm(shifted[:, :3, 3] - trajectory[:, :3, 3], axis=1)
    return np.cumsum(lengths)


def rotation_error(pose_err: np.ndarray) -> np.ndarray:
    a = pose_err[..., 0, 0]
    b = pose_err[..., 1, 1]
    c = pose_err[..., 2, 2]
    d = 0.5 * (a + b + c - 1.0)
    return np.arccos(np.clip(d, -1.0, 1.0))


def translation_error(pose_err: np.ndarray) -> np.ndarray:
    return np.linalg.norm(pose_err[..., :3, 3], axis=-1)


def last_frame_from_segment_length(dist: np.ndarray, first_frame: int,
                                   segment: float) -> int:
    for i in range(first_frame, len(dist)):
        if dist[i] > dist[first_frame] + segment:
            return i
    return -1


def calc_sequence_errors(trajectory: np.ndarray, ground_truth: np.ndarray,
                         all_segments=DEFAULT_SEGMENTS,
                         step_size: int = 10) -> List[dict]:
    dist = compute_cumulative_trajectory_length(ground_truth)
    n_poses = ground_truth.shape[0]
    errors = []
    for first_frame in range(0, n_poses, step_size):
        for segment_len in all_segments:
            last_frame = last_frame_from_segment_length(dist, first_frame, segment_len)
            if last_frame == -1:
                continue
            delta_gt = np.linalg.inv(ground_truth[first_frame]) @ ground_truth[last_frame]
            delta_traj = np.linalg.inv(trajectory[first_frame]) @ trajectory[last_frame]
            pose_err = np.linalg.inv(delta_traj) @ delta_gt
            r_err = float(rotation_error(pose_err))
            t_err = float(translation_error(pose_err))
            num_frames = last_frame - first_frame + 1
            errors.append({
                "tr_err": t_err / segment_len,
                "r_err": r_err / segment_len,
                "segment": segment_len,
                "speed": segment_len / (0.1 * num_frames),
                "first_frame": first_frame,
                "last_frame": last_frame,
            })
    return errors


def compute_kitti_metrics(trajectory: np.ndarray, ground_truth: np.ndarray,
                          segments_sizes=DEFAULT_SEGMENTS) -> tuple:
    errors = calc_sequence_errors(trajectory, ground_truth, segments_sizes)
    if len(errors) > 0:
        tr_err = sum(e["tr_err"] for e in errors) / len(errors)
        rot_err = sum(e["r_err"] for e in errors) / len(errors)
        return tr_err, rot_err, errors
    return None, None, []


def compute_ate(relative_predicted: np.ndarray,
                relative_ground_truth: np.ndarray) -> Tuple[float, float]:
    tr_err = np.linalg.norm(relative_predicted[:, :3, 3]
                            - relative_ground_truth[:, :3, 3], axis=1)
    ate = tr_err.mean()
    std_dev = np.sqrt(np.power(tr_err - ate, 2).mean())
    return float(ate), float(std_dev)


def compute_are(relative_trajectory: np.ndarray,
                relative_ground_truth: np.ndarray) -> Tuple[float, float]:
    diff = np.linalg.inv(relative_ground_truth[:, :3, :3]) @ \
        relative_trajectory[:, :3, :3] - np.eye(3)
    r_err = np.linalg.norm(diff, axis=(1, 2))
    are = r_err.mean()
    std_dev = np.sqrt(np.power(r_err - are, 2).mean())
    return float(are), float(std_dev)


def rescale_prediction(sequence_pred: np.ndarray,
                       sequence_gt: np.ndarray) -> np.ndarray:
    """Scale-aligns per-frame translations (for scale-free deep odometry)."""
    check_tensor(sequence_pred, [-1, 4, 4])
    check_tensor(sequence_gt, [-1, 4, 4])
    rescaled = []
    for pred, gt in zip(sequence_pred, sequence_gt):
        norm_pred = np.linalg.norm(pred[:3, -1])
        norm_gt = np.linalg.norm(gt[:3, -1])
        scale = (norm_gt / norm_pred) if norm_pred > 1e-6 else 1.0
        new_pose = pred.copy()
        new_pose[:3, -1] *= scale
        rescaled.append(new_pose)
    return list_poses_to_poses_array(rescaled)


def poses_to_df(poses: np.ndarray):
    """(N, 4, 4) -> DataFrame of flattened 3x4 rows (KITTI poses.txt layout)."""
    import pandas as pd
    flat = poses[:, :3, :4].reshape(-1, 12)
    return pd.DataFrame(flat, columns=[str(i) for i in range(12)])


def delimiter() -> str:
    return ","


def draw_trajectory_files(xs: list, ys: list, output_file: str,
                          labels: Optional[list] = None):
    """2D trajectory plots (matplotlib, headless)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(10.0, 10.0))
    axes = plt.gca()
    for i, (x, y) in enumerate(zip(xs, ys)):
        label = labels[i] if labels else None
        axes.plot(x, y, linewidth=2, label=label)
    axes.set_xlabel("x[m]")
    axes.set_ylabel("y[m]")
    if labels:
        axes.legend(loc="lower left")
    plt.axis("equal")
    plt.savefig(output_file)
    plt.close(fig)


class OdometryResults:
    """Aggregates sequence results: metrics.yaml, poses txt, trajectory PNGs
    (reference eval_odometry.py:223-364)."""

    def __init__(self, log_dir: str):
        self.log_dir_path = Path(log_dir)
        self.log_dir_path.mkdir(parents=True, exist_ok=True)
        self.metrics = {}

    def add_sequence(self, sequence_id: str,
                     relative_prediction: Union[np.ndarray, List],
                     relative_ground_truth: Optional[Union[np.ndarray, List]],
                     elapsed: Optional[float] = None,
                     mode: str = "normal"):
        if isinstance(relative_prediction, list):
            relative_prediction = list_poses_to_poses_array(relative_prediction)
        with_gt = relative_ground_truth is not None
        if with_gt:
            if isinstance(relative_ground_truth, list):
                relative_ground_truth = list_poses_to_poses_array(relative_ground_truth)
            if mode == "rescale_simple":
                relative_prediction = rescale_prediction(relative_prediction,
                                                         relative_ground_truth)
            elif mode == "eval_rotation":
                relative_prediction[:, :3, 3] = relative_ground_truth[:, :3, 3]
            elif mode == "eval_translation":
                relative_prediction[:, :3, :3] = relative_ground_truth[:, :3, :3]
            assert_debug(list(relative_ground_truth.shape) ==
                         list(relative_prediction.shape))

        absolute_pred = compute_absolute_poses(relative_prediction)
        poses_to_df(absolute_pred).to_csv(
            str(self.log_dir_path / f"{sequence_id}.poses.txt"),
            sep=delimiter(), index=False)
        draw_trajectory_files([absolute_pred[:, 0, 3]], [absolute_pred[:, 1, 3]],
                              str(self.log_dir_path / f"trajectory_{sequence_id}.png"),
                              labels=["prediction"])

        if with_gt:
            absolute_gt = compute_absolute_poses(relative_ground_truth)
            poses_to_df(absolute_gt).to_csv(
                str(self.log_dir_path / f"{sequence_id}_gt.poses.txt"),
                sep=delimiter(), index=False)

            tr_err, rot_err, _ = compute_kitti_metrics(absolute_pred, absolute_gt)
            # ATE/ARE are defined for ANY length; the KITTI segment errors
            # need >= 100 m of travel and are included only when computable
            # (short sequences used to get an EMPTY metrics.yaml).
            ate, std_ate = compute_ate(relative_prediction, relative_ground_truth)
            are, std_are = compute_are(relative_prediction, relative_ground_truth)
            self.metrics[sequence_id] = {
                "ATE": float(ate),
                "STD_ATE": float(std_ate),
                "ARE": float(are),
                "STD_ARE": float(std_are),
            }
            if tr_err is not None and rot_err is not None:
                self.metrics[sequence_id]["tr_err"] = float(tr_err)
                self.metrics[sequence_id]["rot_err"] = float(rot_err)
            if elapsed is not None:
                self.metrics[sequence_id]["nsecs_per_frame"] = \
                    float(elapsed / absolute_gt.shape[0])
            self.save_metrics()

            draw_trajectory_files(
                [absolute_pred[:, 0, 3], absolute_gt[:, 0, 3]],
                [absolute_pred[:, 1, 3], absolute_gt[:, 1, 3]],
                str(self.log_dir_path / f"trajectory_{sequence_id}_with_gt.png"),
                labels=["prediction", "GT"])

    def _add_mean_metrics(self):
        # Per-key counts: short (< 100 m) sequences carry ATE/ARE but no
        # KITTI tr_err/rot_err -- averaging each key over the sequences
        # that actually report it.
        sums: Dict[str, float] = {}
        counts: Dict[str, int] = {}
        for seq_id, metrics in self.metrics.items():
            if seq_id != "AVG":
                for key, value in metrics.items():
                    sums[key] = sums.get(key, 0.0) + value
                    counts[key] = counts.get(key, 0) + 1
        if counts:
            self.metrics["AVG"] = {k: sums[k] / counts[k] for k in sums}

    def save_metrics(self, filename: str = "metrics.yaml"):
        with open(str(self.log_dir_path / filename), "w") as f:
            yaml.safe_dump(self.metrics, f)

    def close(self):
        self._add_mean_metrics()
        self.save_metrics()
