"""Offline UrbanLoco ground-truth generation (reference scripts/generate_urban_loco_gt.py).

Usage: python scripts/generate_urban_loco_gt.py --root_dir <dir> [--sequences A B ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pylidar_slam_tpu.dataset.urban_loco_dataset import (SEQNAME_TO_FILENAME,
                                                         UrbanLocoConfig,
                                                         UrbanLocoDatasetLoader)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--sequences", nargs="*",
                        default=list(SEQNAME_TO_FILENAME))
    args = parser.parse_args()
    loader = UrbanLocoDatasetLoader(UrbanLocoConfig(root_dir=args.root_dir))
    loader.generate_ground_truth(args.sequences)
