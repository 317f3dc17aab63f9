"""Dev profile: per-component device cost of the surfel ("kdtree") step.

Times each candidate hot op of surfel_map.make_surfel_icp_frame_step in
isolation, wrapped in a lax.scan over REPS iterations inside ONE jitted
executable, so the ~26 ms tunnel sync tax amortizes away and the number is
the true marginal device cost (the lesson from scripts/dev_profile_agg_*).

Usage: python scripts/dev_profile_surfel.py
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
from pylidar_slam_tpu.ops.hash_nn import (build_hash_grid, hash_grid_knn,
                                          hash_grid_nn, pack_grid)

K, S = 30, 4096
V = K * S           # map points
M = 8192            # ICP targets
PIX = 64 * 1024     # vertex-map pixels
BUCKETS, CAP = 8192, 32
VOXEL, RADIUS = 2.0, 1.0
REPS = 8


def timed(name, fn, *args):
    """Compiles fn, then times REPS executions inside one device program."""
    def body(c, _):
        out = fn(*args)
        # fold a scalar of the output into the carry so nothing is DCE'd
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + jnp.sum(leaf.astype(jnp.float32)) * 0, None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                       None, length=REPS)[0])
    run()  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:42s} {1e3 * best:7.3f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(scale=30, size=(V, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random(V) < 0.97)
    queries = jnp.asarray(
        rng.normal(scale=30, size=(M, 3)).astype(np.float32))
    sel = jnp.asarray(rng.normal(scale=30, size=(S, 3)).astype(np.float32))
    pix = jnp.asarray(rng.normal(scale=30, size=(PIX, 3)).astype(np.float32))
    pix_valid = jnp.asarray(rng.random(PIX) < 0.9)
    prio = jnp.asarray(rng.integers(0, 2**31, PIX, dtype=np.int64)
                       .astype(np.uint32))

    grid = jax.jit(partial(build_hash_grid, voxel_size=VOXEL,
                           n_buckets=BUCKETS, cap=CAP))(pts, valid)

    packed = jax.jit(partial(pack_grid, cap=CAP))(pts, grid)

    timed("build_hash_grid (123k)",
          partial(build_hash_grid, voxel_size=VOXEL, n_buckets=BUCKETS,
                  cap=CAP), pts, valid)
    timed("pack_grid (262k slots)",
          partial(pack_grid, cap=CAP), pts, grid)
    timed("hash_grid_nn (8192 q)",
          partial(hash_grid_nn, voxel_size=VOXEL, n_buckets=BUCKETS,
                  cap=CAP, radius=RADIUS), queries, pts, grid)
    timed("hash_grid_nn PACKED (8192 q)",
          partial(hash_grid_nn, voxel_size=VOXEL, n_buckets=BUCKETS,
                  cap=CAP, radius=RADIUS), queries, pts, packed)
    timed("hash_grid_knn (4096 q, k=10)",
          partial(hash_grid_knn, voxel_size=VOXEL, n_buckets=BUCKETS,
                  cap=CAP, radius=RADIUS, k=10), sel, pts, grid)
    timed("hash_grid_knn PACKED (4096 q, k=10)",
          partial(hash_grid_knn, voxel_size=VOXEL, n_buckets=BUCKETS,
                  cap=CAP, radius=RADIUS, k=10), sel, pts, packed)

    def knn_normals(q):
        idxk, sqk = hash_grid_knn(q, pts, packed, VOXEL, BUCKETS, CAP,
                                  RADIUS, 10)
        nb = jnp.take(pts, idxk, axis=0)
        return geometry.knn_plane_normals(nb, jnp.isfinite(sqk))

    timed("knn PACKED probe + plane normals (4096)", knn_normals, sel)

    from pylidar_slam_tpu.slam.odometry.surfel_map import _grid_sample_fixed
    timed("grid_sample_fixed 65k->8192",
          partial(_grid_sample_fixed, voxel_size=0.4, capacity=M),
          pix, pix_valid)
    timed("grid_sample_fixed 65k->4096",
          partial(_grid_sample_fixed, voxel_size=0.3, capacity=S),
          pix, pix_valid)
    timed("argsort(65k uint32)", lambda p: jnp.argsort(p), prio)
    timed("argsort(123k)", lambda p: jnp.argsort(p[:, 0]), pts)

    from pylidar_slam_tpu.ops import se3
    eye = jnp.eye(4)

    def transform_map(p):
        return se3.apply_transformation(p[None], eye[None])[0]

    timed("map transform (123k x2)",
          lambda p: (transform_map(p), transform_map(p)), pts)


if __name__ == "__main__":
    main()
