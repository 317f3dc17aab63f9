"""Profile individual pieces of the fused ICP step on the attached device."""
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
pts = rng.normal(size=(N, 3)).astype(np.float32) * 20
mask = rng.random(N) < 0.9
pts_j = jnp.asarray(pts)
mask_j = jnp.asarray(mask)

def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.3f} ms")
    return out

build = jax.jit(lambda p, m: projection.build_vertex_map(p, proj, mask=m))
vmap = timeit("build_vertex_map (131k pts)", build, pts_j, mask_j)

nmap_fn = jax.jit(lambda v: geometry.compute_normal_map(v, 5))
nmap = timeit("compute_normal_map (64x1024)", nmap_fn, vmap)

state = lm.init_projective_map(K, H, W)
update = jax.jit(lambda s, v: lm.update_projective_map(
    s, jnp.eye(4), v, proj, jnp.array(True)))
state = timeit("update_projective_map (insert+rebuild)", update, state, vmap)

nn_fn = jax.jit(lambda s, v: lm.nearest_neighbors(s, v))
nbrs = timeit("nearest_neighbors (K=20 dense)", nn_fn, state, vmap)

def one_icp_iter(state, vmap, pose):
    tgt_pts = vmap.reshape(-1, 3)
    tgt_valid = jnp.max(jnp.abs(tgt_pts), axis=-1) > 0
    p = se3.apply_transformation(tgt_pts[None], pose[None])[0]
    tvmap = projection.build_vertex_map(p, proj, mask=tgt_valid)
    nbrs, nrms = lm.nearest_neighbors(state, tvmap)
    t = tvmap.reshape(-1, 3); r = nbrs.reshape(-1, 3); n = nrms.reshape(-1, 3)
    m = (jnp.max(jnp.abs(t), -1) > 0) & (jnp.max(jnp.abs(r), -1) > 0) & (jnp.max(jnp.abs(n), -1) > 0)
    res = optimization.point_to_plane_residuals(jnp.zeros(6), t, r, n, m)
    jac = optimization.point_to_plane_jacobian(jnp.zeros(6), t, n, m)
    w = optimization.robust_weights("geman_mcclure", res, 0.3)
    dx, loss, sing = optimization.gauss_newton_step(res, jac, w)
    return dx, loss

icp_fn = jax.jit(one_icp_iter)
timeit("one ICP iteration (proj+assoc+GN)", icp_fn, state, vmap, jnp.eye(4))

# GN pieces
t = vmap.reshape(-1, 3); nrm = jnp.ones_like(t)
msk = jnp.max(jnp.abs(t), -1) > 0
jac_fn = jax.jit(lambda: optimization.point_to_plane_jacobian(jnp.zeros(6), t, nrm, msk))
timeit("p2pl jacobian (65k)", jac_fn)
