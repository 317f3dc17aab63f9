"""Records OUR champion configurations' trajectories on the 140-frame
fixture sequence into tests/fixtures/ours_e2e.npz.

Companion to scripts/generate_reference_e2e.py (which records the REFERENCE
implementation's trajectories on the same sequence).  The full-scale surfel
("kdtree") configuration -- 16384 targets x ~123k map points of exact NN x
20 iterations x 140 frames -- takes hours on the single-CPU CI host but
minutes on the TPU, so its acceptance test
(tests/test_reference_parity.py::test_e2e_accuracy_vs_reference_kdtree)
verifies this recorded trajectory instead of re-executing; run this script
on the device after any change to the surfel/ICP code path:

    python scripts/record_e2e_ours.py
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,  # noqa: E402
                                                SyntheticSequence)
from pylidar_slam_tpu.eval import acceptance  # noqa: E402
from pylidar_slam_tpu.eval.eval_odometry import (  # noqa: E402
    compute_absolute_poses, compute_kitti_metrics)

SEQ_KW = acceptance.SEQ_KW



def main():
    cfg = SyntheticConfig(**SEQ_KW)
    seq = SyntheticSequence(cfg, "synth_00", seed=cfg.seed)
    frames = [np.asarray(seq[i]["numpy_pc"], np.float32)
              for i in range(cfg.num_frames)]
    gt = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                   for i in range(cfg.num_frames)])
    gt = np.linalg.inv(gt[0]) @ gt

    # Stamp: hash of the champion configs' traced computations -- the
    # acceptance tests fail when current code would no longer produce this
    # fixture (pylidar_slam_tpu/eval/acceptance.py::code_stamp).
    stamp = acceptance.code_stamp()
    print(f"code stamp: {stamp}")

    out = {"stamp": acceptance.stamp_array(stamp),
           "seq_params": np.array([SEQ_KW["lidar_height"],
                                   SEQ_KW["lidar_width"],
                                   SEQ_KW["num_frames"],
                                   SEQ_KW["num_walls"],
                                   SEQ_KW["num_pillars"], cfg.seed]),
           "gt_absolute": gt}

    for name in acceptance.champion_configs():
        odom = acceptance.build_odometry(name)
        odom.init()
        last = np.eye(4, dtype=np.float32)
        t0 = time.time()
        for pc in frames:
            d = {"numpy_pc": pc, "init_rpose": last}
            odom.process_next_frame(d)
            last = d.get("odometry_pose", last)
        # The aggregated champion batches device steps (batch_size=12, the
        # bench pipeline); finish() dispatches the final partial batch.
        odom.finish()
        traj = compute_absolute_poses(odom.get_relative_poses())
        tr_err, rot_err, _ = compute_kitti_metrics(traj, gt)
        print(f"{name}: tr_err={tr_err:.6f} rot_err={rot_err:.4g} "
              f"({time.time() - t0:.0f}s)", flush=True)
        out[f"{name}_trajectory"] = traj
        out[f"{name}_tr_err"] = np.array(tr_err)

    dest = REPO / "tests" / "fixtures" / "ours_e2e.npz"
    np.savez_compressed(dest, **out)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
