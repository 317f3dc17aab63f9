"""Dataset loader contract (reference slam/dataset/configuration.py).

A ``DatasetLoader`` exposes ``projector()`` (the dataset-tuned spherical
projector), ``sequences()`` (train/eval/test lists of map-style sequence
datasets emitting ``data_dict``s) and ``get_ground_truth(seq)`` (relative GT
poses).  Datasets are plain Python map-style objects (``__len__`` /
``__getitem__``) -- no torch dependency; the training stack wraps them with
its own prefetcher.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from pylidar_slam_tpu.config import MISSING
from pylidar_slam_tpu.ops.projection import SphericalProjection


@dataclass
class DatasetConfig:
    dataset: str = MISSING
    sequence_len: int = 2

    # Default item keys in the data_dict
    vertex_map_key: str = "vertex_map"
    numpy_pc_key: str = "numpy_pc"
    absolute_gt_key: str = "absolute_pose_gt"
    with_numpy_pc: bool = True


class DatasetLoader:
    @classmethod
    def max_num_workers(cls) -> int:
        return 20

    @staticmethod
    def absolute_gt_key() -> str:
        return "absolute_pose_gt"

    @staticmethod
    def numpy_pc_key() -> str:
        return "numpy_pc"

    def __init__(self, config: DatasetConfig):
        self.config = config

    def projector(self) -> SphericalProjection:
        raise NotImplementedError("")

    @property
    def grid_regular(self) -> bool:
        """True iff the sensor's firing pattern is exactly the projector's
        regular grid (every beam at its nominal elevation/azimuth).

        Drives the upload-codec choice: the 2 B/pixel ``rimg8`` format
        stores only per-row/per-col MEAN angular offsets, which is exact on
        a regular grid but drops per-pixel beam de-calibration -- real
        sensors (e.g. KITTI's HDL-64E, whose intrinsics need the 0.205
        degree correction the reference applies in kitti_dataset.py:201-231)
        need the 3 B/pixel ``rimg`` format with per-pixel sub-pixel offsets
        (measured: rimg8 degrades 0.14% -> 0.60% tr_err at 0.1 degree beam
        jitter while rimg holds -- docs/benchmark.md format-vs-jitter
        table).  Default False: only loaders that KNOW their pattern is
        synthetic-regular may opt in.
        """
        return False

    def sequences(self):
        """Returns ((train_datasets, names), (eval_datasets, names),
        (test_datasets, names), transform)."""
        raise NotImplementedError("")

    def get_ground_truth(self, sequence_name):
        return None


class WindowDataset:
    """Slices a window [start, start+length) of a map-style dataset
    (reference dataset/dataset.py:26-43; used by replay)."""

    def __init__(self, dataset, start: int = 0, length: Optional[int] = None):
        self.dataset = dataset
        self.start = start
        self.length = length if length is not None else len(dataset) - start

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        return self.dataset[self.start + idx]
