"""Debug harness for the batched LC equivalence failure: runs the test's
config at batch 1 and 4, recording EVERY candidate score (accepted or not)
plus the frame at which each drain ran and each backend optimization fired."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from pylidar_slam_tpu.config import compose, dataclass_from_dict
from pylidar_slam_tpu.dataset.synthetic import SyntheticConfig, SyntheticDatasetLoader
from pylidar_slam_tpu.slam.slam import SLAM, SLAMConfig
from pylidar_slam_tpu.slam import loop_closure as lc_mod

n = 40


def run(batch_size):
    cfg = compose("config", "slam", [
        "dataset=synthetic", f"dataset.num_frames={n}",
        "dataset.turn_rate=0.01",
        "slam/odometry/local_map=aggregated",
        "slam.odometry.max_num_alignments=6",
        "slam.odometry.num_points_padded=65536",
        f"slam.odometry.batch_size={batch_size}",
        "slam/loop_closure=elevation_image",
        "slam.loop_closure.local_map_size=4",
        "slam.loop_closure.overlap=1",
        "slam.loop_closure.min_id_distance=9",
        "slam.loop_closure.max_distance=1e6",
        "slam/backend=graph_slam"])
    loader = SyntheticDatasetLoader(
        dataclass_from_dict(SyntheticConfig, cfg["dataset"]))
    slam = SLAM(dataclass_from_dict(SLAMConfig, cfg["slam"]),
                projector=loader.projector())
    slam.init()

    events = []
    lc = None

    (datasets, _), _, _, _ = loader.sequences()
    ds = datasets[0]
    for i in range(n):
        slam.process_next_frame(ds[i])
        if lc is None:
            lc = slam.loop_closure
            orig_drain = lc.drain_pending

            def drain(data_dict, wait=True, _lc=lc, _orig=orig_drain):
                with _lc._pending_lock:
                    pend = list(_lc._pending_matches)
                for scores_dev, transforms_dev, ids, fid in pend:
                    pass
                _orig(data_dict, wait=wait)
            # instead of wrapping, record scores inside: monkeypatch np.asarray? simpler:
        # record per-frame event: submap count, pending count
        events.append((i, len(slam.loop_closure.maps_frame_ids),
                       len(slam.loop_closure._pending_matches),
                       len(slam.backend._edges)))
    slam.finish()
    return slam, events


# Monkeypatch drain_pending at class level to log every score decision.
orig_drain = lc_mod.ElevationImageLoopClosure.drain_pending
LOG = []


def drain_logged(self, data_dict, wait=True):
    cfg = self.config
    with self._pending_lock:
        pending = list(self._pending_matches)
    # replicate readiness split only for logging which were drained
    before = {id(p) for p in pending}
    orig_drain(self, data_dict, wait=wait)
    with self._pending_lock:
        after = {id(p) for p in self._pending_matches}
    drained = [p for p in pending if id(p) not in after]
    for scores_dev, transforms_dev, ids, fid in drained:
        scores = np.asarray(scores_dev)
        for k in range(len(ids)):
            cd = self.maps_frame_ids[ids[k]]
            LOG.append((cd, fid, float(scores[k]),
                        float(scores[k]) >= cfg.min_score,
                        self.current_frame_id, wait))


lc_mod.ElevationImageLoopClosure.drain_pending = drain_logged

for bs in (1, 4):
    LOG.clear()
    slam, events = run(bs)
    loops = slam.backend.registered_loop_constraints()
    print(f"=== batch={bs} loops: {[(i, j) for i, j, *_ in loops]}")
    for cd, fid, sc, acc, cur, wait in sorted(LOG):
        print(f"  cand ({cd:3d},{fid:3d}) score={sc:7.4f} acc={int(acc)} "
              f"drained@frame={cur} wait={wait}")
