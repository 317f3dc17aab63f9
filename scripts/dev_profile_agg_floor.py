"""Pins down the aggregated-map step's fixed per-frame floor (~3.6 ms at
1 iter / no insert / no gate) by timing incrementally larger scan bodies.

Usage: python scripts/dev_profile_agg_floor.py
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
from pylidar_slam_tpu.ops import optimization, se3
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

    frames = []
    for i in range(BATCH):
        p = seq[i]["numpy_pc"].astype(np.float32)
        buf = np.zeros((CAP, 3), np.float32)
        buf[: min(len(p), CAP)] = p[:CAP]
        frames.append(buf)
    pts_b = jnp.asarray(np.stack(frames))
    msk_b = jnp.ones((BATCH, CAP), bool)

    p0 = frames[0]
    pts0, mask0 = jnp.asarray(p0), jnp.asarray(p0.any(axis=1))
    vmap, nmap, rimg = jax.jit(
        lambda p, m: am.build_scan_images(p, m, proj, 5))(pts0, mask0)
    state = am.AggMapState(xyz=vmap, normal=nmap, rng=rimg,
                           age=jnp.zeros((H, W), jnp.int32),
                           anchor_from_cur=jnp.eye(4))

    def timed(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jfn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
            times.append(time.perf_counter() - t0)
        print(f"{name:40s} {min(times) / BATCH * 1000:7.3f} ms/frame")

    def scan_over(body):
        def outer(pb, mb):
            def sb(carry, frame):
                p, m = frame
                return carry, body(p, m)
            _, out = jax.lax.scan(sb, 0.0, (pb, mb))
            return out
        return outer

    # 1. mask derivation only
    timed("scan: mask+sum", scan_over(
        lambda p, m: jnp.sum(p) + jnp.sum(m)), pts_b, msk_b)

    # 2. + transform + rasterize + gather (the initial rasterize_target)
    def raster_body(p, m):
        q = se3.apply_transformation(p[None], jnp.eye(4)[None])[0]
        idx, hit = am.rasterize_encoded(q, proj, m)
        timg = jnp.where(hit[:, None], jnp.take(q, idx, axis=0),
                         0.0).reshape(H, W, 3)
        return jnp.sum(timg)
    timed("scan: rasterize_target", scan_over(raster_body), pts_b, msk_b)

    # 3. + one assoc+GN iteration (no while_loop)
    def one_iter_body(p, m):
        q = se3.apply_transformation(p[None], jnp.eye(4)[None])[0]
        idx, hit = am.rasterize_encoded(q, proj, m)
        timg = jnp.where(hit[:, None], jnp.take(q, idx, axis=0),
                         0.0).reshape(H, W, 3)
        ref, nrm, ok, sq_d = am.window_associate(state, timg, 1, 2, 0.6)
        tp = timg.reshape(-1, 3)
        zero6 = jnp.zeros(6, tp.dtype)
        res = optimization.point_to_plane_residuals(zero6, tp, ref, nrm, ok)
        jac = optimization.point_to_plane_jacobian(zero6, tp, nrm, ok)
        wts = optimization.robust_weights("geman_mcclure", res, 0.3,
                                          sq_dists=sq_d, eps=1e-4)
        dx, loss, singular = optimization.gauss_newton_step(res, jac, wts)
        return jnp.sum(dx) + loss
    timed("scan: raster+1x(assoc+GN)", scan_over(one_iter_body), pts_b, msk_b)

    # 4. same but inside a while_loop of 1 iteration (loop overhead)
    def while_body(p, m):
        q0 = se3.apply_transformation(p[None], jnp.eye(4)[None])[0]
        idx, hit = am.rasterize_encoded(q0, proj, m)
        timg0 = jnp.where(hit[:, None], jnp.take(q0, idx, axis=0),
                          0.0).reshape(H, W, 3)

        def body(carry):
            t, it = carry
            tvalid = jnp.max(jnp.abs(timg0), axis=-1, keepdims=True) > 0
            timg = jnp.where(
                tvalid,
                se3.apply_transformation(
                    timg0.reshape(1, -1, 3), t[None])[0].reshape(H, W, 3),
                0.0)
            ref, nrm, ok, sq_d = am.window_associate(state, timg, 1, 2, 0.6)
            tp = timg.reshape(-1, 3)
            zero6 = jnp.zeros(6, tp.dtype)
            res = optimization.point_to_plane_residuals(zero6, tp, ref, nrm, ok)
            jac = optimization.point_to_plane_jacobian(zero6, tp, nrm, ok)
            wts = optimization.robust_weights("geman_mcclure", res, 0.3,
                                              sq_dists=sq_d, eps=1e-4)
            dx, loss, singular = optimization.gauss_newton_step(res, jac, wts)
            delta_mat = se3.build_pose_matrix(dx[None])[0]
            t = se3.normalize_pose_matrix((delta_mat @ t)[None])[0]
            return (t, it + 1)

        def cond(carry):
            return carry[1] < 1

        t, _ = jax.lax.while_loop(cond, body, (jnp.eye(4), jnp.array(0)))
        return jnp.sum(t)
    timed("scan: while_loop(1) version", scan_over(while_body), pts_b, msk_b)

    # 5. while_loop WITH the cond(rasterize) branch inside (compiled, not taken)
    def while_cond_raster_body(p, m):
        q0 = se3.apply_transformation(p[None], jnp.eye(4)[None])[0]
        idx, hit = am.rasterize_encoded(q0, proj, m)
        timg_init = jnp.where(hit[:, None], jnp.take(q0, idx, axis=0),
                              0.0).reshape(H, W, 3)

        def rasterize_target(t):
            q = se3.apply_transformation(p[None], t[None])[0]
            i2, h2 = am.rasterize_encoded(q, proj, m)
            return jnp.where(h2[:, None], jnp.take(q, i2, axis=0),
                             0.0).reshape(H, W, 3)

        def body(carry):
            t, timg0, it = carry
            do_reassoc = (it > 0) & (it % 8 == 0)
            timg0 = jax.lax.cond(do_reassoc, rasterize_target,
                                 lambda _t: timg0, t)
            tvalid = jnp.max(jnp.abs(timg0), axis=-1, keepdims=True) > 0
            timg = jnp.where(
                tvalid,
                se3.apply_transformation(
                    timg0.reshape(1, -1, 3), t[None])[0].reshape(H, W, 3),
                0.0)
            ref, nrm, ok, sq_d = am.window_associate(state, timg, 1, 2, 0.6)
            tp = timg.reshape(-1, 3)
            zero6 = jnp.zeros(6, tp.dtype)
            res = optimization.point_to_plane_residuals(zero6, tp, ref, nrm, ok)
            jac = optimization.point_to_plane_jacobian(zero6, tp, nrm, ok)
            wts = optimization.robust_weights("geman_mcclure", res, 0.3,
                                              sq_dists=sq_d, eps=1e-4)
            dx, loss, singular = optimization.gauss_newton_step(res, jac, wts)
            delta_mat = se3.build_pose_matrix(dx[None])[0]
            t = se3.normalize_pose_matrix((delta_mat @ t)[None])[0]
            return (t, timg0, it + 1)

        def cond(carry):
            return carry[2] < 1

        t, _, _ = jax.lax.while_loop(cond, body,
                                     (jnp.eye(4), timg_init, jnp.array(0)))
        return jnp.sum(t)
    timed("scan: while(1)+cond-raster branch",
          scan_over(while_cond_raster_body), pts_b, msk_b)


if __name__ == "__main__":
    main()
