"""Generic cloud-to-cloud ICP with brute-force exact nearest neighbors (JAX).

The capability equivalent of the reference's Open3D point-to-point ICP
refinement used by the loop closure (loop_closure.py:210-225).  Clouds here
are small grid-sampled submaps (<= a few thousand points), so exact all-pairs
NN is a single chunked distance computation per iteration -- a dense batched
workload that beats tree structures on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops import optimization, se3


def brute_force_nn(queries: jnp.ndarray, refs: jnp.ndarray,
                   ref_mask: Optional[jnp.ndarray] = None,
                   chunk: int = 1024):
    """Exact 1-NN: (M, 3) queries vs (V, 3) refs -> (idx (M,), sq_dist (M,)).

    Chunked over refs to bound the distance-matrix working set.
    """
    v = refs.shape[0]
    num_chunks = (v + chunk - 1) // chunk
    pad = num_chunks * chunk - v
    refs_p = jnp.pad(refs, ((0, pad), (0, 0)))
    mask_p = jnp.ones((v + pad,), bool) if ref_mask is None else \
        jnp.pad(ref_mask, (0, pad))
    mask_p = mask_p.at[v:].set(False)
    refs_c = refs_p.reshape(num_chunks, chunk, 3)
    mask_c = mask_p.reshape(num_chunks, chunk)

    def body(carry, inputs):
        best_d, best_i = carry
        chunk_refs, chunk_mask, base = inputs
        d = jnp.sum((queries[:, None, :] - chunk_refs[None, :, :]) ** 2, -1)
        d = jnp.where(chunk_mask[None, :], d, jnp.inf)
        ci = jnp.argmin(d, axis=1).astype(jnp.int32)
        cd = jnp.min(d, axis=1)
        better = cd < best_d
        best_d = jnp.where(better, cd, best_d)
        best_i = jnp.where(better, base + ci, best_i)
        return (best_d, best_i), None

    init = (jnp.full((queries.shape[0],), jnp.inf, queries.dtype),
            jnp.zeros((queries.shape[0],), jnp.int32))
    bases = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(body, init, (refs_c, mask_c, bases))
    return best_i, best_d


class ICPResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) maps source -> target frame
    num_iters: jnp.ndarray
    mean_residual: jnp.ndarray


def icp_align(source: jnp.ndarray, target: jnp.ndarray,
              init_transform: Optional[jnp.ndarray] = None,
              source_mask: Optional[jnp.ndarray] = None,
              target_mask: Optional[jnp.ndarray] = None,
              max_iters: int = 20,
              max_corr_dist: float = 1.0,
              scheme: str = "geman_mcclure",
              sigma: float = 0.5,
              threshold_delta: float = 1.0e-5) -> ICPResult:
    """Point-to-point ICP aligning `source` onto `target` (both (N, 3) padded).

    Uses the closed-form weighted Procrustes fit per iteration (the same
    estimator as Open3D's TransformationEstimationPointToPoint), with robust
    reweighting and a correspondence distance gate.
    """
    from pylidar_slam_tpu.ops import registration

    n = source.shape[0]
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=source.dtype)
    if source_mask is None:
        source_mask = jnp.ones((n,), bool)

    def body(carry):
        t, _, it, _ = carry
        moved = se3.apply_transformation(source[None], t[None])[0]
        idx, sq_d = brute_force_nn(moved, target, target_mask)
        matched = target[idx]
        ok = source_mask & (sq_d < max_corr_dist ** 2)
        res = jnp.sqrt(jnp.maximum(sq_d, 1e-12))
        w = optimization.robust_weights(scheme, res, sigma) ** 2
        w = jnp.where(ok, w, 0.0)
        delta = registration.weighted_procrustes(matched[None], moved[None],
                                                 w[None])[0]
        new_t = se3.normalize_pose_matrix((delta @ t)[None])[0]
        dnorm = jnp.linalg.norm(se3.from_pose_matrix(delta[None])[0])
        mean_res = jnp.sum(res * ok) / jnp.maximum(jnp.sum(ok), 1)
        return new_t, dnorm, it + 1, mean_res

    def cond(carry):
        _, dnorm, it, _ = carry
        return (it < max_iters) & (dnorm >= threshold_delta)

    init = (init_transform, jnp.array(jnp.inf, source.dtype),
            jnp.array(0, jnp.int32), jnp.array(0.0, source.dtype))
    t, _, it, mean_res = jax.lax.while_loop(cond, body, init)
    return ICPResult(transform=t, num_iters=it, mean_residual=mean_res)
