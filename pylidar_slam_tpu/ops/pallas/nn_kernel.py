"""Streaming brute-force 1-NN as a Pallas TPU kernel.

Exact nearest neighbors of M query points against V model points WITHOUT
materializing the (M, V) distance matrix in HBM: each program takes a block
of queries, streams model chunks through VMEM, computes (BV, 128) score
tiles with ONE MXU contraction, and keeps a running (min, argmin) per query
-- the same streaming-reduction shape as flash attention's running max.

TPU-specific choices (shaped by Mosaic's lowering rules):
* the distance is one matmul: with q' = [-2x, -2y, -2z, 1] and
  m' = [x, y, z, ||m||^2], m' @ q'^T = ||m||^2 - 2 q.m (the ||q||^2 term is
  constant per query and irrelevant to the argmin; it is added back at the
  end).  Invalid model rows carry +inf in the norm column and never win.
* queries live on the LANE axis in sub-blocks of 128; min/argmin are
  sublane reductions (lane-axis argmin lowers very poorly);
* argmin is a two-pass reduction (min, then min-index-where-equal);
* every intermediate is 2D with lanes <= 128 -- no reshapes or relayouts.

HBM traffic is O(M + V) instead of O(M V); this is what makes the exact
kd-tree-equivalent local map viable on TPU (SURVEY section 2.9 item 1).
A chunked XLA fallback (ops/icp3d.brute_force_nn) is selected automatically
on non-TPU backends.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops import icp3d

BM = 512  # queries per program (4 sub-blocks of 128 lanes)
BV = 512  # model chunk size (sublanes per tile)
SUB = 128  # lane width


def _nn_kernel(q_ref, m_ref, out_idx_ref, out_dist_ref, *, v_total: int):
    """q_ref: (BM, 4) = [-2x, -2y, -2z, 1]; m_ref: (4, V) = [x; y; z; n2]
    TRANSPOSED so the long axis sits on lanes (a (V, 4) layout pads the
    4-lane dim to 128 and blows VMEM 32x); outputs: (1, BM/128, 128) tiles."""
    from jax.experimental import pallas as pl

    num_chunks = v_total // BV

    for s in range(BM // SUB):  # unrolled sub-blocks
        qs = q_ref[pl.ds(s * SUB, SUB), :]  # (128, 4)

        def body(c, carry):
            best_d, best_i = carry  # (1, 128) each
            mc = m_ref[:, pl.ds(c * BV, BV)]  # (4, BV)
            # d_partial = ||m||^2 - 2 q.m  (one MXU contraction).
            # HIGHEST precision is required: the default bf16 MXU pass
            # truncates ~20 m coordinates to ~0.1 m -- useless for NN.
            d = jax.lax.dot_general(mc, qs, (((0,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            cd = jnp.min(d, axis=0, keepdims=True)  # (1, 128)
            rows = jax.lax.broadcasted_iota(jnp.int32, (BV, SUB), 0)
            ci = jnp.min(jnp.where(d <= cd, rows, v_total), axis=0,
                         keepdims=True)
            better = cd < best_d
            best_d = jnp.where(better, cd, best_d)
            best_i = jnp.where(better, c * BV + ci, best_i)
            return best_d, best_i

        init = (jnp.full((1, SUB), jnp.inf, jnp.float32),
                jnp.zeros((1, SUB), jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, num_chunks, body, init)
        out_idx_ref[0, s, :] = best_i[0]
        out_dist_ref[0, s, :] = best_d[0]


@jax.jit
def nn_argmin_pallas(queries: jnp.ndarray, model: jnp.ndarray,
                     model_valid: jnp.ndarray):
    """Exact 1-NN: queries (M, 3) vs model (V, 3) -> (idx (M,), sq_dist (M,)).

    M must be a multiple of 512 and V of 512 (pad with invalid entries).
    """
    from jax.experimental import pallas as pl

    m_count, _ = queries.shape
    v_count, _ = model.shape
    assert m_count % BM == 0, f"M={m_count} not divisible by {BM}"
    assert v_count % BV == 0, f"V={v_count} not divisible by {BV}"

    q4 = jnp.concatenate([-2.0 * queries,
                          jnp.ones((m_count, 1), queries.dtype)], axis=1)
    m_norms = jnp.sum(model * model, axis=1)
    big = jnp.array(3.0e38, jnp.float32)  # effectively +inf, finite for matmul
    m4 = jnp.concatenate([model, jnp.where(model_valid, m_norms, big)[:, None]],
                         axis=1).T  # (4, V): long axis on lanes

    kernel = functools.partial(_nn_kernel, v_total=v_count)
    grid = (m_count // BM,)
    out_idx, out_part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 4), lambda i: (i, 0)),
            pl.BlockSpec((4, v_count), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BM // SUB, SUB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, BM // SUB, SUB), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_count // BM, BM // SUB, SUB), jnp.int32),
            jax.ShapeDtypeStruct((m_count // BM, BM // SUB, SUB), jnp.float32),
        ],
    )(q4, m4)
    idx = out_idx.reshape(m_count)
    # add back ||q||^2 (constant per query, dropped inside the kernel)
    q_norms = jnp.sum(queries * queries, axis=1)
    sq_dist = jnp.maximum(out_part.reshape(m_count) + q_norms, 0.0)
    return idx, sq_dist


def nn_argmin(queries: jnp.ndarray, model: jnp.ndarray,
              model_valid: Optional[jnp.ndarray] = None,
              use_pallas: Optional[bool] = None):
    """Backend-dispatching exact 1-NN (Pallas on TPU, chunked XLA elsewhere)."""
    if model_valid is None:
        model_valid = jnp.ones((model.shape[0],), bool)
    if use_pallas is None:
        import os
        if os.environ.get("PLS_TPU_FORCE_XLA_NN"):
            # Platform-stable tracing (eval/acceptance.code_stamp): both
            # branches compute the same exact 1-NN, but they trace to
            # different jaxprs.
            use_pallas = False
        else:
            use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return nn_argmin_pallas(queries, model, model_valid)
    return icp3d.brute_force_nn(queries, model, model_valid)
