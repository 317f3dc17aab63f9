"""Point-sharded ICP Gauss-Newton over a device mesh (shard_map + psum).

The natural "sequence parallelism" of point-to-plane ICP: shard the point
dimension across chips, accumulate each shard's partial 6x6 normal equations
locally, and psum the tiny (6,6)+(6,) payloads over ICI -- latency-bound,
bandwidth-free (SURVEY.md section 5.7/5.8).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pylidar_slam_tpu.ops import optimization


def point_sharded_gauss_newton_step(mesh: Mesh,
                                    axis: str = "sp",
                                    scheme: str = "least_square",
                                    sigma: float = 0.5):
    """Builds a GN step with the point dimension sharded over `axis`.

    Returns ``step(params (6,), target (N, 3), ref (N, 3), normals (N, 3),
    mask (N,)) -> (dx (6,), loss)`` where N is sharded across the mesh axis;
    dx and loss are fully replicated (computed from the psum-ed normal
    equations on every shard).
    """

    def local_normal_equations(params, target, ref, normals, mask):
        res = optimization.point_to_plane_residuals(params, target, ref,
                                                    normals, mask)
        jac = optimization.point_to_plane_jacobian(params, target, normals, mask)
        sq_d = jnp.sum((target - ref) ** 2, axis=-1)
        w = optimization.robust_weights(scheme, res, sigma, sq_dists=sq_d)
        wres = res * w
        wjac = jac * w[:, None]
        h_local = wjac.T @ wjac
        g_local = wjac.T @ wres
        loss_local = jnp.sum(wres * wres)
        # The only collective: psum of (6,6) + (6,) + () per iteration.
        h = jax.lax.psum(h_local, axis)
        g = jax.lax.psum(g_local, axis)
        loss = jax.lax.psum(loss_local, axis)
        dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(
            h + 1e-8 * jnp.eye(6, dtype=h.dtype)), g)
        return dx, loss

    sharded = shard_map(
        local_normal_equations, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(sharded)
