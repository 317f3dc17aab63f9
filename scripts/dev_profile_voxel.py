"""Dev profile: per-component device cost of the voxel-table map step.

Same methodology as dev_profile_surfel.py: each candidate hot op runs REPS
times inside one jitted lax.scan so the tunnel sync tax amortizes away.

Usage: python scripts/dev_profile_voxel.py
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.ops import geometry
from pylidar_slam_tpu.ops.voxel_table import (init_table, scatter_select,
                                              table_insert, table_knn,
                                              table_nn, table_reanchor,
                                              table_set_normals)

N_PIX = 66560
M = 8192
T = 262144
VOX, R = 0.4, 0.4
K_LIVE = 30
REPS = 8


def timed(name, fn, *args):
    def body(c, _):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        if leaf.dtype == jnp.uint32 or leaf.dtype == jnp.int32 or \
                leaf.dtype == bool:
            leaf = leaf.astype(jnp.float32)
        return c + jnp.sum(leaf) * 0, None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                       None, length=REPS)[0])
    run()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:46s} {1e3 * best:7.3f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(scale=25, size=(N_PIX, 3))
                      .astype(np.float32))
    pix_valid = jnp.asarray(rng.random(N_PIX) < 0.9)
    sel_pts = jnp.asarray(rng.normal(scale=25, size=(M, 3))
                          .astype(np.float32))
    sel_valid = jnp.ones((M,), bool)

    table = init_table(T)
    # Fill with ~25 frames of inserts to get a realistic occupancy.
    ins = jax.jit(partial(table_insert, k_live=K_LIVE, voxel_size=VOX))
    for f in range(25):
        pts = jnp.asarray(rng.normal(scale=25, size=(M, 3))
                          .astype(np.float32))
        table, _, _ = ins(table, pts, sel_valid, jnp.int32(f))
    frame = jnp.int32(25)
    occ = int(np.asarray((table.meta >= 0)).sum())
    print(f"table occupancy: {occ}/{T}")

    timed("scatter_select (66k -> 8192)",
          partial(scatter_select, voxel_size=VOX, n_out=M), pix, pix_valid)
    timed("table_nn (8192 q, 27 probes)",
          partial(table_nn, k_live=K_LIVE, voxel_size=VOX, radius=R),
          table, sel_pts, frame)
    timed("table_knn k=10 (8192 q)",
          partial(table_knn, k_live=K_LIVE, voxel_size=VOX, radius=R, k=10),
          table, sel_pts, frame)
    timed("table_insert (8192)",
          partial(table_insert, k_live=K_LIVE, voxel_size=VOX),
          table, sel_pts, sel_valid, frame)

    def insert_and_normals(tbl, pts):
        tbl, won, slot = table_insert(tbl, pts, sel_valid, frame, K_LIVE,
                                      VOX)
        slots_k, sq_k = table_knn(tbl, pts, frame, K_LIVE, VOX, R, 10)
        nb = jnp.take(tbl.points, slots_k, axis=0)
        nrm = geometry.knn_plane_normals(nb, jnp.isfinite(sq_k))
        return table_set_normals(tbl, won, slot, nrm)

    timed("insert + knn normals + commit", insert_and_normals, table,
          sel_pts)
    timed("table_reanchor (262k)",
          partial(table_reanchor, voxel_size=VOX), table,
          jnp.eye(4, dtype=jnp.float32))

    # The full odometry step at champion-ish settings.
    from pylidar_slam_tpu.ops.projection import SphericalProjection
    from pylidar_slam_tpu.slam.odometry.voxel_map import (
        VoxelTableMapConfig, init_voxel_map, make_voxel_icp_frame_step)
    cfg = VoxelTableMapConfig()
    proj = SphericalProjection(64, 1024, 3.0, -24.0)
    step, first, batch = make_voxel_icp_frame_step(
        proj, cfg, max_num_alignments=10, threshold_delta_pose=1e-4,
        threshold_trans=0.1, threshold_rot=0.3, gn_scheme="neighborhood",
        gn_sigma=0.2, reassoc_every=100, reassoc_motion_m=0.2)
    st = init_voxel_map(cfg)
    pts = jnp.where(pix_valid[:, None], pix, 0.0)
    msk = pix_valid
    st = first(st, pts, msk)
    eye = jnp.eye(4, dtype=jnp.float32)

    def full_step(s):
        s2, d, t, p, diag = step(s, eye, pts, msk, eye)
        return p

    # step donates its state; time via python loop re-feeding state instead.
    st2, d, t, p, diag = jax.jit(lambda s: step(s, eye, pts, msk, eye))(
        jax.tree.map(jnp.array, st))
    _ = np.asarray(p)
    times = []
    s_cur = jax.tree.map(jnp.array, st)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            s_cur, d, t, p, diag = step(s_cur, eye, pts, msk, eye)
        _ = np.asarray(p)
        times.append((time.perf_counter() - t0) / REPS)
    print(f"{'FULL step (10 iters, insert)':46s} {1e3 * min(times):7.3f} ms")


if __name__ == "__main__":
    main()
