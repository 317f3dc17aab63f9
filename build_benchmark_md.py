"""Benchmark aggregation CLI (reference build_benchmark_md.py).

Recursively scans a directory tree for SLAM run outputs (dirs containing
``metrics.yaml`` + ``<seq>.poses.txt``), recomputes KITTI metrics against the
saved GT poses, ranks entries by average translation error, and emits a
markdown table with the stamped git hashes.

    python build_benchmark_md.py --root_dir .outputs --output benchmark.md
"""
import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).parent))

from pylidar_slam_tpu.eval.eval_odometry import (compute_kitti_metrics,
                                                 compute_relative_poses)


def load_absolute_poses(file_path: Path) -> np.ndarray:
    import pandas as pd
    df = pd.read_csv(file_path, sep=",")
    flat = df.values.reshape(-1, 3, 4)
    bottom = np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (len(flat), 1, 1))
    return np.concatenate([flat, bottom], axis=1)


def scan_entries(root_dir: Path):
    """Yields (run_dir, git_hash, {seq: (tr_err, rot_err, nsecs)})."""
    for metrics_file in sorted(root_dir.rglob("metrics.yaml")):
        run_dir = metrics_file.parent
        git_hash = "unknown"
        config_file = run_dir / "config.yaml"
        if config_file.exists():
            try:
                with open(config_file) as f:
                    git_hash = (yaml.safe_load(f) or {}).get("git_hash", "unknown")
            except yaml.YAMLError:
                pass
        # Resurface the command line from the stamped overrides (reference
        # build_benchmark_md.py:142-147 reads .hydra/overrides.yaml).
        command = ""
        overrides_file = run_dir / ".hydra" / "overrides.yaml"
        if overrides_file.exists():
            try:
                with open(overrides_file) as f:
                    ovs = yaml.safe_load(f) or []
                command = "python run.py " + " ".join(str(o) for o in ovs)
            except yaml.YAMLError:
                pass
        with open(metrics_file) as f:
            saved_metrics = yaml.safe_load(f) or {}

        entry = {}
        for pose_file in run_dir.glob("*.poses.txt"):
            if pose_file.name.endswith("_gt.poses.txt") or \
                    pose_file.name.startswith("replay_"):
                continue
            seq = pose_file.name[: -len(".poses.txt")]
            gt_file = run_dir / f"{seq}_gt.poses.txt"
            if not gt_file.exists():
                continue
            poses = load_absolute_poses(pose_file)
            gt = load_absolute_poses(gt_file)
            tr_err, rot_err, _ = compute_kitti_metrics(poses, gt)
            nsecs = saved_metrics.get(seq, {}).get("nsecs_per_frame", None)
            if tr_err is not None:
                entry[seq] = (tr_err, rot_err, nsecs)
        if entry:
            yield run_dir, git_hash, command, entry


def build_markdown(root_dir: str, output: str):
    root = Path(root_dir)
    entries = list(scan_entries(root))
    rows = []
    all_seqs = sorted({s for _, _, _, e in entries for s in e})
    for run_dir, git_hash, command, entry in entries:
        avg_tr = 100.0 * float(np.mean([v[0] for v in entry.values()]))
        times = [v[2] for v in entry.values() if v[2] is not None]
        avg_ms = 1000.0 * float(np.mean(times)) if times else -1.0
        rows.append((avg_tr, avg_ms, run_dir, git_hash, command, entry))
    rows.sort(key=lambda r: r[0])

    lines = ["# Benchmark", "",
             "| run | AVG tr_err (%) | time/frame (ms) | git |" +
             "".join(f" {s} |" for s in all_seqs),
             "|---|---|---|---|" + "---|" * len(all_seqs)]
    for avg_tr, avg_ms, run_dir, git_hash, command, entry in rows:
        seq_cells = "".join(
            f" {100.0 * entry[s][0]:.4f} |" if s in entry else " |"
            for s in all_seqs)
        lines.append(f"| {run_dir.relative_to(root)} | {avg_tr:.4f} | "
                     f"{avg_ms:.3f} | {git_hash[:8]} |" + seq_cells)
    lines.append("")
    lines.append("Command lines (recovered from .hydra/overrides.yaml):")
    for avg_tr, _, run_dir, _, command, _ in rows:
        if command:
            lines.append(f"- `{run_dir.relative_to(root)}` "
                         f"(tr_err {avg_tr:.4f}%): `{command}`")
    text = "\n".join(lines) + "\n"
    with open(output, "w") as f:
        f.write(text)
    print(text)
    return text


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", default=".outputs")
    parser.add_argument("--output", default="benchmark.md")
    args = parser.parse_args()
    build_markdown(args.root_dir, args.output)
