"""SLAM entry point (reference run.py CLI surface).

Usage (same override grammar as the reference's hydra CLI):

    python run.py dataset=kitti slam/odometry=icp_odometry \
        slam.odometry.local_map.local_map_size=30 num_workers=4

Composes ``config/slam.yaml`` with the command-line overrides, builds a
``SLAMRunner`` and runs odometry + evaluation over the dataset sequences.
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from pylidar_slam_tpu.config import compose
from pylidar_slam_tpu.slam.odometry_runner import SLAMRunner, SLAMRunnerConfig
from pylidar_slam_tpu.config import dataclass_from_dict


def run_slam(cfg: dict):
    runner = SLAMRunner(dataclass_from_dict(SLAMRunnerConfig, cfg))
    metrics = runner.run_odometry()
    for seq, m in metrics.items():
        print(f"[{seq}] " + " ".join(f"{k}={v:.6g}" for k, v in m.items()))
    return metrics


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    argv = argv if argv is not None else sys.argv[1:]
    config_dir = Path(__file__).parent / "config"
    cfg = compose(str(config_dir), "slam", argv)
    return run_slam(cfg)


if __name__ == "__main__":
    main()
