"""Device-step component profile for the aggregated-map ICP (TPU).

Times each building block of the fused per-frame step in isolation so
optimization effort lands where the milliseconds are:
  - rasterize_encoded (scatter-min + gathers)
  - build_scan_images (rasterize + normal map)
  - window_associate (the 15-shift pass) at several window sizes
  - GN leg (residual + jacobian + robust weights + 6x6 solve)
  - insert_scan (map merge)
  - full batched step at several iteration counts (marginal cost/iter)

Usage: python scripts/dev_profile_agg_step.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                SyntheticDatasetLoader)
from pylidar_slam_tpu.ops import optimization, se3
from pylidar_slam_tpu.slam.odometry import aggregated_map as am

H, W = 64, 1024
CAP = 66560
BATCH = 12


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def bench(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    cfg = SyntheticConfig(lidar_height=H, lidar_width=W, num_frames=3,
                          num_walls=40, num_pillars=25)
    loader = SyntheticDatasetLoader(cfg)
    seq = loader.sequences()[0][0][0]
    proj = loader.projector()
    pts_np = seq[0]["numpy_pc"].astype(np.float32)
    pad = np.zeros((CAP, 3), np.float32)
    pad[: min(len(pts_np), CAP)] = pts_np[:CAP]
    pts = jnp.asarray(pad)
    mask = jnp.asarray(pad.any(axis=1))

    # --- primitives ---------------------------------------------------------
    rast = jax.jit(lambda p, m: am.rasterize_encoded(p, proj, m))
    print(f"rasterize_encoded         {bench(rast, pts, mask):7.3f} ms")

    bsi = jax.jit(lambda p, m: am.build_scan_images(p, m, proj, 5))
    print(f"build_scan_images (k=5)   {bench(bsi, pts, mask):7.3f} ms")

    vmap, nmap, rimg = bsi(pts, mask)
    state = am.AggMapState(xyz=vmap, normal=nmap, rng=rimg,
                           age=jnp.zeros((H, W), jnp.int32),
                           anchor_from_cur=jnp.eye(4))

    from pylidar_slam_tpu.ops import geometry
    nm = jax.jit(lambda v: geometry.compute_normal_map(v, 5))
    print(f"compute_normal_map (k=5)  {bench(nm, vmap):7.3f} ms")

    for wr, wc in [(1, 2), (1, 1), (0, 1), (0, 0)]:
        wa = jax.jit(lambda s, t, _wr=wr, _wc=wc: am.window_associate(
            s, t, _wr, _wc, 0.6))
        ms = bench(wa, state, vmap)
        print(f"window_associate ({wr},{wc})    {ms:7.3f} ms")

    # GN leg on associated pairs
    ref, nrm, ok, sq_d = jax.jit(
        lambda s, t: am.window_associate(s, t, 1, 2, 0.6))(state, vmap)
    tp = vmap.reshape(-1, 3)

    def gn_leg(tp, ref, nrm, ok, sq_d):
        zero6 = jnp.zeros(6, tp.dtype)
        res = optimization.point_to_plane_residuals(zero6, tp, ref, nrm, ok)
        jac = optimization.point_to_plane_jacobian(zero6, tp, nrm, ok)
        weights = optimization.robust_weights("geman_mcclure", res, 0.3,
                                              sq_dists=sq_d, eps=1e-4)
        dx, loss, singular = optimization.gauss_newton_step(res, jac, weights)
        return dx

    gn = jax.jit(gn_leg)
    print(f"GN leg (res+jac+solve)    {bench(gn, tp, ref, nrm, ok, sq_d):7.3f} ms")

    ins = jax.jit(lambda s, v, n, r: am.insert_scan(
        s, v, n, r, jnp.eye(4), proj, 20))
    print(f"insert_scan               {bench(ins, state, vmap, nmap, rimg):7.3f} ms")

    # value-transform leg (per-iteration elementwise)
    def vt(timg0, delta):
        tvalid = jnp.max(jnp.abs(timg0), axis=-1, keepdims=True) > 0
        return jnp.where(
            tvalid,
            se3.apply_transformation(timg0.reshape(1, -1, 3),
                                     delta[None])[0].reshape(H, W, 3),
            0.0)
    vtj = jax.jit(vt)
    print(f"value transform           {bench(vtj, vmap, jnp.eye(4)):7.3f} ms")

    # --- full batched step at several iteration counts ----------------------
    frames = []
    for i in range(BATCH):
        p = seq[i % 3]["numpy_pc"].astype(np.float32)
        buf = np.zeros((CAP, 3), np.float32)
        buf[: min(len(p), CAP)] = p[:CAP]
        frames.append(buf)
    pts_b = jnp.asarray(np.stack(frames))
    msk_b = jnp.asarray(np.stack(frames).any(axis=2))

    map_cfg = am.AggregatedLocalMapConfig(
        local_map_size=20, window_rows=1, window_cols=2, max_neighbor_dist=0.6)
    for iters in [1, 2, 4, 8]:
        _, _, batch_step = am.make_agg_icp_frame_step(
            proj=proj, map_cfg=map_cfg, max_num_alignments=iters,
            reassoc_every=8, reassoc_motion_m=0.2,
            threshold_delta_pose=1e-4, threshold_trans=0.1, threshold_rot=0.3,
            gn_scheme="geman_mcclure", gn_sigma=0.3)
        st0 = am.init_agg_map(H, W)
        st0 = jax.jit(lambda s, p, m: am.insert_scan(
            s, *am.build_scan_images(p, m, proj, 5), jnp.eye(4), proj,
            20))(st0, pts, mask)

        def run(st):
            return batch_step(st, jnp.eye(4), jnp.eye(4), pts_b, msk_b)

        # donated state: re-copy per call
        times = []
        for _ in range(6):
            st = jax.tree.map(jnp.array, st0)
            t0 = time.perf_counter()
            out = run(st)
            sync(out[3])
            times.append(time.perf_counter() - t0)
        ms = min(times[1:]) / BATCH * 1000.0
        print(f"batch_step iters={iters}       {ms:7.3f} ms/frame")


if __name__ == "__main__":
    main()
