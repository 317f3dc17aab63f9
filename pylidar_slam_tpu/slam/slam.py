"""The SLAM orchestrator: Initialization -> Preprocessing -> Odometry ->
Loop Closure -> Backend (reference slam/slam.py capability match).

Composes the five modules from a ``SLAMConfig`` and drives them per-frame over
the ``data_dict`` key protocol.  The float64 absolute-pose ledger with
rotation re-projection lives here (reference slam.py:142-144); device-side
state stays inside each module.
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import numpy as np

from pylidar_slam_tpu.config import dataclass_from_dict
from pylidar_slam_tpu.eval.eval_odometry import compute_absolute_poses
from pylidar_slam_tpu.ops import rotation as rot_ops
from pylidar_slam_tpu.slam.initialization import INITIALIZATION
from pylidar_slam_tpu.slam.odometry import ODOMETRY
from pylidar_slam_tpu.slam.preprocessing import Preprocessing
from pylidar_slam_tpu.utils import assert_debug

import jax.numpy as jnp


@dataclass
class SLAMConfig:
    initialization: Optional[Any] = None
    preprocessing: Optional[Any] = None
    odometry: Optional[Any] = None
    loop_closure: Optional[Any] = None
    backend: Optional[Any] = None


def _is_none_config(cfg) -> bool:
    """True for absent configs and for explicit `type: none` group choices."""
    if cfg is None:
        return True
    if isinstance(cfg, dict):
        return cfg.get("type", None) in ("none", None) and "filters" not in cfg
    return False


def _reproject_rotation(pose: np.ndarray) -> np.ndarray:
    """Float64 + SO(3) re-projection of the rotation block (SVD)."""
    pose = pose.astype(np.float64)
    u, _, vt = np.linalg.svd(pose[:3, :3])
    d = np.diag([1.0, 1.0, np.linalg.det(u @ vt)])
    pose[:3, :3] = u @ d @ vt
    return pose


class SLAM:
    """Drives the five pipeline modules over the data_dict protocol."""

    def __init__(self, config: SLAMConfig, **kwargs):
        if not isinstance(config, SLAMConfig):
            config = dataclass_from_dict(SLAMConfig, config)
        self.config = config
        self.initialization = None
        self.preprocessing = None
        self.odometry = None
        self.loop_closure = None
        self.backend = None
        self._frame_idx = 0

        self.elapsed_odometry = []
        self.elapsed_loop_closure = []
        self.elapsed_backend = []
        # Batched odometry: frames whose pose arrives at the next device
        # flush are deferred here as (frame_idx, data_dict) and their
        # downstream stages (loop closure / backend) run when the odometry
        # drains the batch results -- identical constraints to batch_size=1.
        self._deferred_frames: list = []
        self.__kwargs = kwargs

    def init(self):
        """(Re)initializes all modules at the start of a sequence."""
        self._frame_idx = 0
        cfg = self.config

        self.initialization = None
        if not _is_none_config(cfg.initialization):
            self.initialization = INITIALIZATION.load(cfg.initialization, **self.__kwargs)
            if self.initialization is not None:
                self.initialization.init()

        self.preprocessing = None
        if cfg.preprocessing is not None:
            self.preprocessing = Preprocessing(cfg.preprocessing, **self.__kwargs)

        if self.odometry is None:
            assert_debug(cfg.odometry is not None, "A SLAM requires an odometry config")
            self.odometry = ODOMETRY.load(cfg.odometry, **self.__kwargs)
        self.odometry.init()

        if self.loop_closure is None and not _is_none_config(cfg.loop_closure):
            from pylidar_slam_tpu.slam.loop_closure import LOOP_CLOSURE
            self.loop_closure = LOOP_CLOSURE.load(cfg.loop_closure, **self.__kwargs)
        if self.loop_closure is not None:
            self.loop_closure.init()
            if not _is_none_config(cfg.backend):
                from pylidar_slam_tpu.slam.backend import BACKEND
                self.backend = BACKEND.load(cfg.backend, **self.__kwargs)
            if self.backend is not None:
                self.backend.init()
            else:
                logging.warning("[SLAM] Loop closure configured without a backend")

        # Batched odometry chains constant-velocity priors ON DEVICE and
        # never reads per-frame `init_rpose`, so an initialization that
        # computes real per-frame priors (EI feature alignment, PoseNet)
        # would be silently ignored -- fail loudly instead.
        batch_size = 1
        if isinstance(cfg.odometry, dict):
            batch_size = int(cfg.odometry.get("batch_size", 1) or 1)
        elif cfg.odometry is not None:
            batch_size = int(getattr(cfg.odometry, "batch_size", 1) or 1)
        init_type = None
        if isinstance(cfg.initialization, dict):
            init_type = cfg.initialization.get("type")
        elif cfg.initialization is not None:
            init_type = getattr(cfg.initialization, "type", None)
        if batch_size > 1 and init_type in ("ei", "posenet"):
            # Config-validity error: raised regardless of debug mode.
            raise ValueError(
                f"slam.odometry.batch_size={batch_size} ignores per-frame "
                f"initialization priors; initialization '{init_type}' "
                f"computes real priors that would be silently dropped. Use "
                f"batch_size=1 or initialization CV/NI.")

        self._deferred_frames = []
        # Batched odometry must surface per-frame poses (one host transfer
        # per flush) whenever downstream consumers exist.
        # (CV init chains on device in batched mode, so init alone does not
        # force the fetch -- only actual host consumers do.)
        if hasattr(self.odometry, "emit_batch_poses"):
            self.odometry.emit_batch_poses = (
                self.loop_closure is not None or self.backend is not None)

    def host_prepare(self, data_dict: dict):
        """Order-independent host-side stages, safe in prefetch workers.

        Runs the (stateless, per-frame) preprocessing filters and -- for the
        batched ICP odometry -- the upload encoding, so neither serializes
        with device flushes on the main pipeline thread.  Stateful stages
        (initialization, odometry, loop closure, backend) still run in
        frame order in :meth:`process_next_frame`."""
        if self.preprocessing is not None:
            if not self.preprocessing.worker_safe:
                # Stateful preprocessing (e.g. Distortion needs the init
                # prior) must wait for process_next_frame -- and so must the
                # upload encoding, which consumes its output.
                return
            self.preprocessing.forward(data_dict)
            data_dict["_host_prepared"] = True
        odom = self.odometry
        raw = data_dict.get(getattr(odom.config, "data_key", None))
        arr = None
        if raw is not None and not hasattr(raw, "devices"):
            a = np.asarray(raw)
            if a.ndim == 2 and a.shape[1] >= 3:
                arr = a
        if (arr is not None
                and getattr(odom, "encode_upload", None) is not None
                and int(getattr(odom.config, "batch_size", 1) or 1) > 1
                and getattr(odom, "_mode", "") in ("aggregated_local_map",
                                                   "kdtree_local_map")):
            data_dict["encoded_upload"] = odom.encode_upload(arr)
        if arr is not None and self.loop_closure is not None and \
                hasattr(self.loop_closure, "_subsample"):
            # Same cloud the odometry hands downstream (raw meters, post
            # preprocessing); the per-frame grid sample runs here in the
            # worker instead of on the pipeline thread.
            data_dict["lc_pointcloud_sampled"] = self.loop_closure._subsample(
                arr[:, :3].astype(np.float32, copy=False),
                self.loop_closure.config.icp_num_points)

    def process_next_frame(self, data_dict: dict):
        beginning = time.time()

        if self.initialization is not None:
            self.initialization.next_frame(data_dict)
        if self.preprocessing is not None and \
                not data_dict.pop("_host_prepared", False):
            self.preprocessing.forward(data_dict)

        self.odometry.process_next_frame(data_dict)
        step_odometry = time.time()
        # note: the reference logs odometry time into elapsed_loop_closure
        # (slam.py:133, a documented bug) -- fixed here.
        self.elapsed_odometry.append(step_odometry - beginning)

        pose_key = self.odometry.relative_pose_key()
        if pose_key in data_dict:
            odometry_pose = data_dict[pose_key]
            if self.initialization is not None:
                # May be a device array -- CV feeds it straight back into the
                # next jitted step without a host sync.
                self.initialization.save_real_motion(odometry_pose, data_dict)
            if self.loop_closure is not None or self.backend is not None:
                # Only materialize on host when downstream modules consume it
                # (a fetch costs a full device round-trip).
                odometry_pose = _reproject_rotation(np.asarray(odometry_pose))
            else:
                odometry_pose = None
            self._run_downstream(odometry_pose, data_dict, self._frame_idx,
                                 step_odometry)
        elif self.loop_closure is not None or self.backend is not None:
            # Batched odometry: the pose arrives at the next device flush.
            self._deferred_frames.append((self._frame_idx, data_dict))
            self._drain_deferred()

        self._frame_idx += 1

    def _run_downstream(self, odometry_pose: Optional[np.ndarray],
                        data_dict: dict, frame_idx: int,
                        step_odometry: float):
        """Loop closure + backend for one frame with a known odometry pose."""
        if self.loop_closure is not None:
            if odometry_pose is not None:
                data_dict[self.loop_closure.relative_pose_key()] = odometry_pose
            pc_key = self.odometry.pointcloud_key()
            if "lc_pointcloud_sampled" in data_dict:
                # host_prepare already produced the subsampled cloud; avoid
                # materializing the (device) odometry cloud just to ignore it.
                data_dict[self.loop_closure.pointcloud_key()] = \
                    data_dict["lc_pointcloud_sampled"]
            elif pc_key in data_dict:
                value = data_dict[pc_key]
                if isinstance(value, jnp.ndarray):
                    value = np.asarray(value)
                    if value.ndim == 3:  # (H, W, 3) vertex map -> point list
                        value = value.reshape(-1, 3)
                        value = value[np.abs(value).max(axis=1) > 0]
                data_dict[self.loop_closure.pointcloud_key()] = value
            self.loop_closure.process_next_frame(data_dict)
            step_lc = time.time()
            self.elapsed_loop_closure.append(step_lc - step_odometry)

        if self.backend is not None:
            if odometry_pose is not None:
                data_dict[self.backend.se3_odometry_constraint(frame_idx - 1)] = \
                    (odometry_pose, None)
            init_step = time.time()
            self.backend.next_frame(data_dict)
            step_backend = time.time()
            if self.backend.need_to_update_pose:
                self.loop_closure.update_positions(self.backend.absolute_poses())
                self.backend.need_to_update_pose = False
            self.elapsed_backend.append(step_backend - init_step)

    def _drain_deferred(self, final: bool = False):
        """Runs downstream stages for deferred frames whose batched odometry
        poses are now available (same constraint stream as batch_size=1).
        Non-final drains lag one device batch so the host fetch never blocks
        on in-flight compute."""
        if not hasattr(self.odometry, "drain_batch_results"):
            return
        for rpose in self.odometry.drain_batch_results(final=final):
            assert_debug(len(self._deferred_frames) > 0,
                         "Drained more batched poses than deferred frames")
            frame_idx, data_dict = self._deferred_frames.pop(0)
            data_dict[self.odometry.relative_pose_key()] = rpose
            if self.initialization is not None:
                self.initialization.save_real_motion(rpose, data_dict)
            odometry_pose = _reproject_rotation(np.asarray(rpose))
            self._run_downstream(odometry_pose, data_dict, frame_idx,
                                 time.time())

    def finish(self):
        """Flushes batched odometry state at sequence end and completes the
        downstream stages of any still-deferred frames."""
        if hasattr(self.odometry, "finish"):
            self.odometry.finish()
        self._drain_deferred(final=True)
        if self.loop_closure is not None and \
                hasattr(self.loop_closure, "flush_events"):
            # Submap-event jobs still on the lc-event worker must land their
            # match dispatches before the final drain below.
            self.loop_closure.flush_events()
        if self.loop_closure is not None and \
                getattr(self.loop_closure, "_pending_matches", None):
            # Async candidate matches still in flight at sequence end: fetch
            # them and register the surviving constraints with the backend.
            late = {}
            self.loop_closure.drain_pending(late)
            if late and self.backend is not None:
                self.backend.next_frame(late)
                if self.backend.need_to_update_pose:
                    self.loop_closure.update_positions(
                        self.backend.absolute_poses())
                    self.backend.need_to_update_pose = False

    def get_relative_poses(self):
        if self.backend is not None:
            return self.backend.relative_odometry_poses()
        return self.odometry.get_relative_poses()

    def get_absolute_poses(self):
        if self.backend is not None:
            return self.backend.absolute_poses()
        return compute_absolute_poses(self.odometry.get_relative_poses())

    # -- constraint dump/load (reference slam.py:184-223) -------------------

    def dump_all_constraints(self, log_dir: str):
        if self.backend is None:
            return
        dir_path = Path(log_dir)
        dir_path.mkdir(parents=True, exist_ok=True)
        self.save_constraints(
            [(c[0], c[0] + 1, c[1]) for c in self.backend.registered_odometry_constraints()],
            str(dir_path / "odometry_constraints.txt"))
        self.save_constraints(
            [(c[0], c[0], c[1]) for c in self.backend.registered_absolute_constraints()],
            str(dir_path / "absolute_constraints.txt"))
        self.save_constraints(
            [(c[0], c[1], c[2]) for c in self.backend.registered_loop_constraints()],
            str(dir_path / "loop_constraints.txt"))

    @staticmethod
    def save_constraints(constraints, file_path: str):
        import pandas as pd
        rows = [(c[0], c[1], *np.asarray(c[2]).flatten().tolist()) for c in constraints]
        df = pd.DataFrame(rows, columns=["src", "tgt", *[str(i) for i in range(16)]])
        df.to_csv(file_path, sep=",")

    @staticmethod
    def load_constraints(file_path: str):
        import pandas as pd
        return pd.read_csv(file_path, sep=",").values.tolist()
