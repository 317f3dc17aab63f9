"""Honest TPU profiling: chain each op N times with data dependencies, then
force one real sync via np.asarray (block_until_ready does not synchronize
through the tunnel)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.ops import projection, geometry, se3, optimization
from pylidar_slam_tpu.slam.odometry import local_map as lm

H, W, K, N = 64, 1024, 20, 131072
proj = projection.SphericalProjection(H, W, 3.0, -24.0)

rng = np.random.default_rng(0)
azim = rng.uniform(-np.pi, np.pi, N)
elev = rng.uniform(np.deg2rad(-23.5), np.deg2rad(2.5), N)
r = rng.uniform(2.0, 60.0, N)
pts = np.stack([r*np.cos(elev)*np.cos(azim), r*np.cos(elev)*np.sin(azim), r*np.sin(elev)], 1).astype(np.float32)
mask = rng.random(N) < 0.9
pts_j = jnp.asarray(pts); mask_j = jnp.asarray(mask)


def bench(name, fn, feed, n=10):
    """fn: x -> x-like (chained). feed: initial input."""
    out = fn(feed)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])  # warm + sync
    t0 = time.perf_counter()
    x = feed
    for _ in range(n):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:45s} {dt:9.2f} ms")


# 1. rasterization: chain by perturbing points with output's first value
@jax.jit
def rasterize_chain(p):
    vm = projection.build_vertex_map(p, proj, mask=mask_j)
    return p + vm[0, 0, 0] * 1e-9

bench("build_vertex_map 131k (2 scatter-min)", rasterize_chain, pts_j)

vmap0 = jax.jit(lambda p: projection.build_vertex_map(p, proj, mask=mask_j))(pts_j)
np.asarray(vmap0.ravel()[0:1])

# 2. normal map
@jax.jit
def nmap_chain(v):
    n = geometry.compute_normal_map(v, 5)
    return v + n[0, 0, 0] * 1e-9
bench("compute_normal_map 64x1024", nmap_chain, vmap0)

# 3. dense K-map association (current compute_neighbors)
state = lm.init_projective_map(K, H, W)
state = state._replace(model_vmaps=jnp.broadcast_to(vmap0, (K, H, W, 3)).copy(),
                       model_nmaps=jnp.broadcast_to(vmap0, (K, H, W, 3)).copy(),
                       count=jnp.array(K, jnp.int32))
@jax.jit
def assoc_chain(v):
    nb, nr = geometry.compute_neighbors(v, state.model_vmaps, state.model_nmaps)
    return v + nb[0, 0, 0] * 1e-9
bench("dense compute_neighbors K=20", assoc_chain, vmap0)

# 4. gather-based association: project points, gather K maps at pixel
@jax.jit
def gather_assoc_chain(p):
    rows, cols, rr = proj.project(p)
    ri = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, H - 1)
    ci = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, W - 1)
    cand = state.model_vmaps[:, ri, ci, :]          # (K, N, 3) gather
    d = jnp.sum((cand - p[None]) ** 2, axis=-1)     # (K, N)
    best = jnp.argmin(d, axis=0)
    nb = jnp.take_along_axis(cand, best[None, :, None], axis=0)[0]
    return p + nb[0, 0] * 1e-9
bench("gather association K=20 x 131k", gather_assoc_chain, pts_j)

# 5. model rebuild (K rasterizations)
@jax.jit
def rebuild_chain(s):
    s2 = lm.build_model(s, proj)
    return s2
bench("build_model (K=20 rasterizations)", rebuild_chain, state, n=5)

# 6. GN step on 65k correspondences
t = vmap0.reshape(-1, 3)
nrm = jnp.ones_like(t) / jnp.sqrt(3.0)
msk = jnp.max(jnp.abs(t), -1) > 0
@jax.jit
def gn_chain(x):
    res = optimization.point_to_plane_residuals(x, t, t, nrm, msk)
    jac = optimization.point_to_plane_jacobian(x, t, nrm, msk)
    w = optimization.robust_weights("geman_mcclure", res, 0.3)
    dx, loss, sing = optimization.gauss_newton_step(res, jac, w)
    return x + dx * 1e-9
bench("GN step (res+jac+JtJ+solve) 65k", gn_chain, jnp.zeros(6))

# 7. transform points
@jax.jit
def tf_chain(p):
    q = se3.apply_transformation(p[None], jnp.eye(4)[None])[0]
    return q
bench("transform 131k", tf_chain, pts_j)
