"""Voxel-hash candidate 1-NN: a bucketed pre-filter for the surfel map.

The surfel ("kdtree") local map's exact brute-force 1-NN streams every map
point past every query (ops/pallas/nn_kernel.py) -- O(M*V) work per
re-association pass.  This module trades that for an O(M + V) bucketed
search, exploiting that ICP only *keeps* correspondences closer than the
gate radius ``max_neighbor_dist`` (surfel_map.py `ok` mask; the reference
discards the same way via its residual gating,
/root/reference/slam/odometry/alignment.py:91-127):

* the map (static for the whole registration of one frame) is scattered
  once into a hash table of ``n_buckets`` buckets x ``cap`` point slots,
  keyed by the voxel of edge ``voxel_size``;
* each query probes the 2x2x2 voxel block starting at
  ``floor((q - r) / voxel)``.  With ``voxel_size >= 2 r`` the axis interval
  ``[q - r, q + r]`` (length ``2r <= voxel``) spans at most two voxels per
  axis, so EVERY map point within ``r`` of the query is among the probed
  candidates -- the result is *identical* to brute-force + gate unless a
  bucket overflows ``cap``;
* hash collisions only add far-away distractor candidates; they are ranked
  by their true distance and cannot displace a genuine in-radius neighbor;
* bucket overflow drops the lowest-priority residents of that voxel --
  a bounded, deterministic density cap (the voxel is already surface-dense
  when it overflows, so a near-duplicate neighbor survives).

Everything is fixed-shape XLA (sort + scatter-drop + gather); no Pallas
needed -- the candidate set is small enough that gathers dominate, and XLA's
gather lowering is the fastest primitive available for them.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops.voxel import HASH_PRIMES


def _bucket_of(coords: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    """(..., 3) int32 voxel coords -> (...,) bucket id in [0, n_buckets).

    Three-prime spatial hash with an avalanche finalizer: the prime mix
    alone leaves neighboring voxels correlated in the low bits that the
    power-of-two mask keeps.
    """
    h = (HASH_PRIMES[0] * coords[..., 0]
         ^ HASH_PRIMES[1] * coords[..., 1]
         ^ HASH_PRIMES[2] * coords[..., 2]).astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(n_buckets - 1)).astype(jnp.int32)


def build_hash_grid(points: jnp.ndarray, valid: jnp.ndarray,
                    voxel_size: float, n_buckets: int,
                    cap: int) -> jnp.ndarray:
    """Scatters (V, 3) points into a (n_buckets * cap,) slot table.

    Returns int32 point indices, -1 for empty slots.  Overflowing residents
    (rank >= cap within their bucket) are dropped deterministically (sorted
    by point index).  ``n_buckets`` must be a power of two.
    """
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    v = points.shape[0]
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    bucket = _bucket_of(coords, n_buckets)
    # Invalid points sort past every real bucket and scatter out of bounds.
    bucket = jnp.where(valid, bucket, jnp.int32(n_buckets))

    order = jnp.argsort(bucket, stable=True)
    sorted_b = bucket[order]
    idx = jnp.arange(v, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]),
                             sorted_b[1:] != sorted_b[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - seg_start
    keep = (rank < cap) & (sorted_b < n_buckets)
    slot = jnp.where(keep, sorted_b * cap + rank, jnp.int32(n_buckets * cap))

    slots = jnp.full((n_buckets * cap,), -1, jnp.int32)
    return slots.at[slot].set(order.astype(jnp.int32), mode="drop")


def pack_grid(points: jnp.ndarray, slots: jnp.ndarray,
              cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Densifies a slot table into per-bucket COORDINATE rows.

    Returns ``(table_pts (B, cap, 3), table_ids (B, cap))``.  The probe then
    gathers 8 contiguous ``cap x 3``-float bucket rows per query instead of
    ``8 * cap`` scattered point rows (the gather-descriptor count drops
    ``cap``-fold -- measured 24 -> ~2 ms per 8192-query NN pass on a v5e;
    results are bit-identical).  Build once per grid: the one-time 262k-row
    gather amortizes over every probe against the same grid.
    """
    table_ids = slots.reshape(-1, cap)
    table_pts = jnp.take(points, jnp.maximum(slots, 0),
                         axis=0).reshape(-1, cap, 3)
    return table_pts, table_ids


def hash_grid_nn(queries: jnp.ndarray, points: jnp.ndarray,
                 slots, voxel_size: float, n_buckets: int,
                 cap: int, radius: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bucketed 1-NN: (M, 3) queries -> (idx (M,), sq_dist (M,)).

    Exact within ``radius`` (given ``voxel_size >= 2 * radius`` and no bucket
    overflow); queries with no candidate get idx 0 / sq_dist +inf, which the
    caller's distance gate discards.  ``slots`` may be the raw slot table or
    a :func:`pack_grid` tuple (pass the packed form in hot loops).
    """
    cand, d = _candidate_distances(queries, points, slots, voxel_size,
                                   n_buckets, cap, radius)
    m = queries.shape[0]
    best = jnp.argmin(d, axis=1)
    take = jnp.arange(m)
    return jnp.maximum(cand[take, best], 0), d[take, best]


def hash_grid_knn(queries: jnp.ndarray, points: jnp.ndarray,
                  slots, voxel_size: float, n_buckets: int,
                  cap: int, radius: float,
                  k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bucketed k-NN: (M, 3) queries -> (idx (M, k), sq_dist (M, k)).

    Candidates come from the same 2x2x2 probe as :func:`hash_grid_nn`, so
    the j-th neighbor is exact while its distance stays under ``radius``
    (and no bucket overflowed).  Missing neighbors carry sq_dist +inf and
    idx 0 (safe gather index) -- mask on ``jnp.isfinite(sq)``.  ``slots``
    may be the raw slot table or a :func:`pack_grid` tuple (pass the packed
    form in hot loops, as surfel_map does).
    """
    cand, d = _candidate_distances(queries, points, slots, voxel_size,
                                   n_buckets, cap, radius)
    neg_top, pos = jax.lax.top_k(-d, k)  # ascending true distance
    idx = jnp.take_along_axis(cand, pos, axis=1)
    return jnp.maximum(idx, 0), -neg_top


def _candidate_distances(queries, points, slots, voxel_size, n_buckets,
                         cap, radius):
    """Shared probe: (M, 8*cap) candidate point ids (-1 empty) and their
    squared distances (+inf where empty)."""
    m = queries.shape[0]
    base = jnp.floor((queries - radius) / voxel_size).astype(jnp.int32)
    # 2x2x2 probe block: (8, 3) offsets.
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(2, dtype=jnp.int32)] * 3),
                                  indexing="ij"), axis=-1).reshape(8, 3)
    probe = base[:, None, :] + offs[None, :, :]  # (M, 8, 3)
    buckets = _bucket_of(probe, n_buckets)  # (M, 8)
    # Two probed voxels can hash-collide into the SAME bucket (~8/n_buckets
    # of queries); gather its residents only once or k-NN sees duplicates.
    repeats = jnp.tril(
        buckets[:, :, None] == buckets[:, None, :], k=-1)  # (M, 8, 8), j > i
    dup = jnp.any(repeats, axis=-1)  # (M, 8): probe j repeats an earlier one
    if isinstance(slots, tuple):  # pack_grid form: bucket-row gathers
        table_pts, table_ids = slots
        cand = jnp.take(table_ids, buckets, axis=0).reshape(m, 8 * cap)
        cand_pts = jnp.take(table_pts, buckets, axis=0).reshape(m, 8 * cap, 3)
    else:
        slot_ids = buckets[..., None] * cap + \
            jnp.arange(cap, dtype=jnp.int32)
        cand = slots[slot_ids.reshape(m, 8 * cap)]  # (M, 8*cap) ids, -1 empty
        cand_pts = points[jnp.maximum(cand, 0)]  # (M, 8*cap, 3)
    cand = jnp.where(jnp.repeat(dup, cap, axis=1), -1, cand)
    d = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    d = jnp.where(cand >= 0, d, jnp.inf)
    return cand, d
