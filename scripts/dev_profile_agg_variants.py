"""Decomposes the aggregated-map batched step's FIXED per-frame cost.

Round-4 finding: marginal cost/GN-iteration is ~0.26 ms, but iters=1 already
costs 5.6 ms/frame -- the fixed work (initial raster, insert path, normal
map, decode) dominates.  This times batch_step variants with pieces disabled
to locate the milliseconds.

Usage: python scripts/dev_profile_agg_variants.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                SyntheticDatasetLoader)
from pylidar_slam_tpu.ops import projection as proj_ops
from pylidar_slam_tpu.slam.odometry import aggregated_map as am

H, W = 64, 1024
CAP = 66560
BATCH = 12


def main():
    cfg = SyntheticConfig(lidar_height=H, lidar_width=W, num_frames=BATCH + 1,
                          num_walls=40, num_pillars=25)
    loader = SyntheticDatasetLoader(cfg)
    seq = loader.sequences()[0][0][0]
    proj = loader.projector()

    # f32 batch
    f32_frames, rimg8_frames = [], []
    for i in range(BATCH):
        p = seq[i]["numpy_pc"].astype(np.float32)
        buf = np.zeros((CAP, 3), np.float32)
        buf[: min(len(p), CAP)] = p[:CAP]
        f32_frames.append(buf)
        enc = proj_ops.np_encode_range_image(p, proj, planes=True)
        buf8 = np.zeros((CAP, 2), np.uint8)
        buf8[: enc.shape[0]] = enc
        rimg8_frames.append(buf8)
    pts_f32 = jnp.asarray(np.stack(f32_frames))
    msk = jnp.ones((BATCH, CAP), bool)
    pts_r8 = jnp.asarray(np.stack(rimg8_frames))

    p0 = seq[0]["numpy_pc"].astype(np.float32)
    buf0 = np.zeros((CAP, 3), np.float32)
    buf0[: min(len(p0), CAP)] = p0[:CAP]
    pts0 = jnp.asarray(buf0)
    mask0 = jnp.asarray(buf0.any(axis=1))

    def make(iters=8, gate=0.2, reassoc=8, thr_trans=0.1, nks=5,
             wr=1, wc=2):
        map_cfg = am.AggregatedLocalMapConfig(
            local_map_size=20, window_rows=wr, window_cols=wc,
            max_neighbor_dist=0.6, normals_kernel_size=nks)
        return am.make_agg_icp_frame_step(
            proj=proj, map_cfg=map_cfg, max_num_alignments=iters,
            reassoc_every=reassoc, reassoc_motion_m=gate,
            threshold_delta_pose=1e-4, threshold_trans=thr_trans,
            threshold_rot=0.3 if thr_trans < 1e8 else 1e9,
            gn_scheme="geman_mcclure", gn_sigma=0.3)

    def time_variant(name, pts_b, **kw):
        step1, first, batch_step = make(**kw)
        st0 = am.init_agg_map(H, W)
        st0 = first(st0, pts0, mask0)
        times = []
        for _ in range(6):
            st = jax.tree.map(jnp.array, st0)
            t0 = time.perf_counter()
            out = batch_step(st, jnp.eye(4), jnp.eye(4), pts_b, msk)
            np.asarray(out[3].ravel()[0:1])
            times.append(time.perf_counter() - t0)
        ms = min(times[1:]) / BATCH * 1000.0
        print(f"{name:44s} {ms:7.3f} ms/frame")
        return ms

    time_variant("full (8 iters, gate .2, insert, k5)", pts_f32)
    time_variant("rimg8 decode", pts_r8)
    time_variant("no insert (thr=1e9)", pts_f32, thr_trans=1e9)
    time_variant("no motion gate (reassoc only @8)", pts_f32, gate=0.0)
    time_variant("no gate + no insert", pts_f32, gate=0.0, thr_trans=1e9)
    time_variant("normal kernel 3", pts_f32, nks=3)
    time_variant("1 iter, no gate, no insert", pts_f32, iters=1, gate=0.0,
                 thr_trans=1e9)
    time_variant("window (1,1)", pts_f32, wr=1, wc=1)
    time_variant("window (0,0) same-pixel", pts_f32, wr=0, wc=0)
    time_variant("4 iters", pts_f32, iters=4)
    time_variant("16 iters", pts_f32, iters=16)


if __name__ == "__main__":
    main()
