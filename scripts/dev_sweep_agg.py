"""Dev sweep: accuracy/time of the aggregated-map bench config vs cheaper
association windows and iteration counts (device-time levers).

Runs the 140-frame fixture sequence (same as record_e2e_ours.py) through
the batched rimg8 pipeline for each variant and prints tr_err + wall time.
On CPU the absolute tr_err differs from the TPU (reduction order, see
docs/benchmark.md); use the RELATIVE trend and confirm winners on device.

Usage: python scripts/dev_sweep_agg.py [cpu]
Env:   SWEEP_VARIANTS="name:iters:reassoc:wr:wc,..." to override the grid.
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if "cpu" in sys.argv[1:]:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,  # noqa: E402
                                                SyntheticSequence)
from pylidar_slam_tpu.eval.eval_odometry import (  # noqa: E402
    compute_absolute_poses, compute_kitti_metrics)
from pylidar_slam_tpu.ops.projection import SphericalProjection  # noqa: E402
from pylidar_slam_tpu.slam.odometry.icp_odometry import (  # noqa: E402
    ICPFrameToModel, ICPFrameToModelConfig)

SEQ_KW = dict(lidar_height=64, lidar_width=1024,
              num_frames=int(os.environ.get("SWEEP_FRAMES", "140")),
              num_walls=int(os.environ.get("SWEEP_WALLS", "40")),
              num_pillars=int(os.environ.get("SWEEP_PILLARS", "25")))
if os.environ.get("SWEEP_WORLD"):
    # Scale wall/pillar counts with area (SWEEP_WALLS/PILLARS override) so a
    # larger field keeps the same structure density: speed sweeps otherwise
    # measure scene starvation at the +/-120 m wall-field edge, not odometry.
    w = float(os.environ["SWEEP_WORLD"])
    SEQ_KW["world_size"] = w
    if not os.environ.get("SWEEP_WALLS"):
        SEQ_KW["num_walls"] = int(round(40 * (w / 120.0) ** 2))
    if not os.environ.get("SWEEP_PILLARS"):
        SEQ_KW["num_pillars"] = int(round(25 * (w / 120.0) ** 2))
if os.environ.get("SWEEP_SPEED"):
    SEQ_KW["speed"] = float(os.environ["SWEEP_SPEED"])
if os.environ.get("SWEEP_JITTER"):
    SEQ_KW["beam_jitter_deg"] = float(os.environ["SWEEP_JITTER"])
BATCH = int(os.environ.get("SWEEP_BATCH", "12"))
FORMAT = os.environ.get("SWEEP_FORMAT", "rimg8")

DEFAULT = "base:12:4:1:2,w11:12:4:1:1,w01:12:4:0:1,i10:10:5:1:2," \
          "i8:8:4:1:2,w11i10:10:5:1:1"


def variant_cfg(iters, reassoc, wr, wc, motion=0.0, extra=None):
    """extra: dict of per-variant overrides (nd, sigma, scheme, map_size,
    nd_start, sigma_start, anneal) -- lets ONE process sweep knobs that
    used to need per-process env vars (each process pays the ~3 min first
    tunnel compile; in-process variants take ~14 s)."""
    extra = extra or {}
    if os.environ.get("SWEEP_MAP", "aggregated") == "kdtree":
        # Surfel champion settings (docs/benchmark.md); wr/wc unused.
        local_map = {"type": "kdtree_local_map",
                     "local_map_size": int(os.environ.get("SWEEP_K", "30")),
                     "points_per_frame": int(os.environ.get("SWEEP_S", "4096")),
                     "sample_voxel_size":
                         float(os.environ.get("SWEEP_MAP_VOXEL", "0.3")),
                     "target_samples":
                         int(os.environ.get("SWEEP_TGT", "16384")),
                     "target_voxel_size":
                         float(os.environ.get("SWEEP_TGT_VOXEL", "0.4")),
                     "max_neighbor_dist":
                         float(os.environ.get("SWEEP_ND", "1.0")),
                     "levenberg_damping": 0.0,
                     # SWEEP_NN=hash swaps the brute-force NN for the
                     # voxel-hash candidate search (ops/hash_nn.py).
                     "nn_backend": os.environ.get("SWEEP_NN", "exact"),
                     "hash_capacity":
                         int(os.environ.get("SWEEP_NN_CAP", "32")),
                     # SWEEP_NORMALS=image reverts to single-scan normals
                     # (knn = cross-frame k-NN, the champion default).
                     "normals_mode": os.environ.get("SWEEP_NORMALS", "knn")}
        scheme, sigma = "neighborhood", 0.2
    else:
        local_map = {"type": "aggregated_local_map",
                     "local_map_size":
                         int(extra.get("map_size",
                                       os.environ.get("SWEEP_MAP_SIZE", 20))),
                     "window_rows": wr, "window_cols": wc,
                     "max_neighbor_dist":
                         float(extra.get("nd",
                                         os.environ.get("SWEEP_ND", "0.6"))),
                     "max_neighbor_dist_start":
                         float(extra.get(
                             "nd_start",
                             os.environ.get("SWEEP_ND_START", "0.0"))),
                     "model_normals":
                         str(extra.get("model_normals",
                                       os.environ.get("SWEEP_MODEL_NORMALS",
                                                      "0"))) == "1",
                     "normals_fit":
                         str(extra.get("nf",
                                       os.environ.get("SWEEP_NF", "plane")))}
        scheme = str(extra.get("scheme",
                               os.environ.get("SWEEP_SCHEME",
                                              "geman_mcclure")))
        sigma = float(extra.get("sigma", os.environ.get("SWEEP_SIGMA",
                                                        "0.3")))
    return ICPFrameToModelConfig(
        max_num_alignments=iters, reassoc_every=reassoc,
        reassoc_motion_m=motion,
        local_map=local_map,
        alignment={
            "mode": str(extra.get("mode", "point_to_plane_gauss_newton")),
            "gauss_newton_config": {
                "scheme": scheme, "sigma": sigma, "max_iters": 1,
                "sigma_start": float(extra.get(
                    "sigma_start",
                    os.environ.get("SWEEP_SIGMA_START", "0.0"))),
                "sigma_anneal_iters":
                    int(extra.get("anneal",
                                  os.environ.get("SWEEP_ANNEAL_ITERS", "0"))),
                "max_dist_to_plane": float(extra.get("mdp", "0.0")),
                "beta_constant_velocity": float(extra.get("bcv", "0.0")),
                "beta_small_velocity": float(extra.get("bsv", "0.0")),
                "beta_orientation_consistency":
                    float(extra.get("boc", "0.0"))}},
        num_points_padded=66560 if FORMAT == "rimg8" else 65536,
        data_key="numpy_pc", batch_size=BATCH, upload_format=FORMAT)


def main():
    cfg = SyntheticConfig(**SEQ_KW)
    seq = SyntheticSequence(cfg, "synth_00", seed=cfg.seed)
    frames = [np.asarray(seq[i]["numpy_pc"], np.float32)
              for i in range(cfg.num_frames)]
    gt = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                   for i in range(cfg.num_frames)])
    gt = np.linalg.inv(gt[0]) @ gt

    grid = os.environ.get("SWEEP_VARIANTS", DEFAULT)
    for spec in grid.split(","):
        parts = spec.strip().split(":")
        name, iters, reassoc, wr, wc = parts[:5]
        motion = 0.0
        extra = {}
        for p in parts[5:]:  # positional motion, then key=value extras
            if "=" in p:
                k, v = p.split("=", 1)
                extra[k] = v
            else:
                motion = float(p)
        odom = ICPFrameToModel(
            variant_cfg(int(iters), int(reassoc), int(wr), int(wc), motion,
                        extra),
            projector=SphericalProjection(64, 1024, 3.0, -24.0))
        odom.init()
        last = np.eye(4, dtype=np.float32)
        t0 = time.time()
        for pc in frames:
            d = {"numpy_pc": pc, "init_rpose": last,
                 "encoded_upload": odom.encode_upload(pc)}
            odom.process_next_frame(d)
            last = d.get("odometry_pose", last)
        odom.finish()
        traj = compute_absolute_poses(odom.get_relative_poses())
        tr_err, rot_err, _ = compute_kitti_metrics(traj, gt)
        ate = float(np.linalg.norm(traj[:, :3, 3] - gt[:, :3, 3],
                                   axis=1).mean())
        tr = f"{100 * tr_err:.4f}%" if tr_err is not None else \
            "n/a (sequence < 100 m)"
        print(f"{name:10s} iters={iters} reassoc={reassoc} win={wr}x{wc}: "
              f"tr_err={tr} rot_err={rot_err} ate={ate:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
