"""Deterministic re-run of a previous SLAM execution (reference replay.py).

    python replay.py --root_dir .outputs/slam/<run> --sequence 00 \
        [--start_index 0] [--num_frames -1] [overrides...]

Loads the saved ``config.yaml`` of a previous run, applies optional
overrides, pins the sequence, windows the dataset, and re-runs the SLAM loop
without the runner's evaluation -- for debugging specific frames.
"""
import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).parent))

from pylidar_slam_tpu.config import _deep_set, _parse_scalar, dataclass_from_dict
from pylidar_slam_tpu.dataset import DATASET
from pylidar_slam_tpu.dataset.configuration import WindowDataset
from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", required=True,
                        help="A previous run directory containing config.yaml")
    parser.add_argument("--sequence", required=True)
    parser.add_argument("--start_index", type=int, default=0)
    parser.add_argument("--num_frames", type=int, default=-1)
    parser.add_argument("--lc_state", default="",
                        help="Path to a loop_closure_<seq>.npz saved by a "
                             "previous run (odometry_runner); restores the "
                             "submap state so the replay resumes with its "
                             "loop-closure context")
    parser.add_argument("--html", default="",
                        help="Write an interactive WebGL viewer (map + "
                             "trajectory) of the replayed window to this "
                             "path (reference replay.py:114-121's viz3d "
                             "window, delivered as a standalone artifact)")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    config_path = Path(args.root_dir) / "config.yaml"
    assert config_path.exists(), f"No config.yaml under {args.root_dir}"
    with open(config_path) as f:
        saved = yaml.safe_load(f)
    cfg = saved["config"] if "config" in saved else saved

    for override in args.overrides:
        key, value = override.split("=", 1)
        _deep_set(cfg, key, _parse_scalar(value))

    dataset_loader = DATASET.load(dict(cfg["dataset"]))
    (datasets, names), _, _, _ = dataset_loader.sequences()
    assert args.sequence in names, f"Unknown sequence {args.sequence} ({names})"
    dataset = datasets[names.index(args.sequence)]
    length = args.num_frames if args.num_frames > 0 else len(dataset) - args.start_index
    window = WindowDataset(dataset, args.start_index, length)

    slam = SLAM(dataclass_from_dict(SLAMConfig, dict(cfg["slam"])),
                projector=dataset_loader.projector(),
                pose=cfg.get("pose", "euler"))
    slam.init()
    if args.lc_state:
        assert slam.loop_closure is not None, \
            "--lc_state given but the replayed config has no loop closure"
        slam.loop_closure.load_state(args.lc_state)
        logging.info("restored loop-closure state from %s", args.lc_state)
    clouds = []
    for i in range(len(window)):
        frame = window[i]
        if args.html and "numpy_pc" in frame:
            clouds.append(np.asarray(frame["numpy_pc"], np.float32)[:, :3])
        slam.process_next_frame(frame)
        if (i + 1) % 50 == 0:
            logging.info("replayed %d / %d frames", i + 1, len(window))

    relative = slam.get_relative_poses()
    if args.html and clouds:
        from pylidar_slam_tpu.viz.html_viewer import write_html_viewer
        from pylidar_slam_tpu.viz.viz3d import aggregate_map_cloud
        absolutes = [np.eye(4)]
        for rel in relative[1:]:
            absolutes.append(absolutes[-1] @ np.asarray(rel, np.float64))
        cloud = aggregate_map_cloud(clouds, relative)
        write_html_viewer(args.html, cloud, trajectory=np.stack(absolutes),
                          title=f"replay {args.sequence}")
        logging.info("wrote interactive viewer -> %s", args.html)
    out_file = Path(args.root_dir) / f"replay_{args.sequence}.poses.txt"
    np.savetxt(str(out_file), relative[:, :3, :].reshape(len(relative), 12))
    logging.info("Replay done: %d poses -> %s", len(relative), out_file)
    return relative


if __name__ == "__main__":
    main()
