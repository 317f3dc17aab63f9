"""Persistent voxel-surfel hash table: the incremental TPU-native local map.

The surfel ring map (slam/odometry/surfel_map.py) is already fully
on-device, but it pays three structural per-frame costs that cap it at
~55 scans/s on a v5e: the whole K*S map is re-expressed into every new
frame (two (123k, 3) transforms), the bucket grid for NN search is rebuilt
and packed from scratch every frame (~8.7 ms), and every point selection is
an O(N log N) argsort (~3.6 ms each, twice per frame).

This module replaces all three with a *persistent* direct-mapped voxel
table in a fixed ANCHOR frame (the reference's kd-tree capability --
slam/odometry/local_map.py:244-446 -- re-designed as an incremental
structure, in the spirit of modern voxel-hash LiDAR odometry):

* the map lives in anchor coordinates; per frame only the M ICP targets are
  transformed (the registration optimizes the anchor<-sensor pose directly);
* one table slot holds at most one surfel (point + normal + insert-frame +
  voxel key); insertion is a scatter (keep-old-unless-stale semantics: the
  first point to claim a voxel keeps it until it ages out of the
  `k_live`-frame window -- the reference grid_sample's first-point-per-voxel
  rule with the reference local map's K-frame eviction);
* NN search probes the table directly: the query's voxel plus its 26
  neighbors are 27 single-row gathers -- with probe radius <= voxel edge
  every in-radius surfel lives in that block, so the result is exact within
  the gate except for hash collisions (a colliding voxel's surfel simply
  went unstored -- a bounded density loss, NOT a wrong neighbor: candidates
  are ranked by true distance);
* point selection ("grid sample to a fixed budget") is ONE scatter-max of a
  packed (priority | index) key into a small slot table -- O(N), no sort.

Everything is fixed-shape XLA; state updates are pure (donate-friendly).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops.voxel import HASH_PRIMES


def _mix(h: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche finalizer (same family as hash_nn._bucket_of)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B)
    h = h ^ (h >> 16)
    return h


def _voxel_hash(coords: jnp.ndarray, salt: jnp.ndarray = None) -> jnp.ndarray:
    """(..., 3) int32 voxel coords -> (...,) uint32 full-width hash."""
    h = (HASH_PRIMES[0] * coords[..., 0]
         ^ HASH_PRIMES[1] * coords[..., 1]
         ^ HASH_PRIMES[2] * coords[..., 2]).astype(jnp.uint32)
    if salt is not None:
        h = h ^ (jnp.uint32(0x9E3779B9) * salt.astype(jnp.uint32))
    return _mix(h)


def scatter_select(points: jnp.ndarray, valid: jnp.ndarray,
                   voxel_size: float, n_out: int,
                   salt: jnp.ndarray = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free spatial subsample: one representative per hash slot.

    Scatters the (N, 3) points into an ``n_out``-slot table keyed by the
    hash of their ``voxel_size`` voxel; each slot keeps the point with the
    highest packed (voxel-hash priority | index) key, so the winner set is
    deterministic, spatially spread (hash-uniform over voxels), and at most
    one point per voxel survives.  `salt` (e.g. the frame index) rotates
    the per-voxel priorities so repeated selections over the same scene
    surface different representatives each call.

    Returns ``(sel_points (n_out, 3), sel_idx (n_out,) int32,
    sel_valid (n_out,))``.  Replaces the argsort-based
    surfel_map._grid_sample_fixed at O(N) scatter cost (~0.4 ms vs ~3.6 ms
    for 65k points on a v5e).
    """
    assert n_out & (n_out - 1) == 0, "n_out must be a power of 2"
    n = points.shape[0]
    idx_bits = max(int(n - 1).bit_length(), 1)
    assert idx_bits + 2 <= 32, "too many input points to pack"
    prio_bits = min(32 - idx_bits - 1, 14)

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    h = _voxel_hash(coords, salt)
    slot = (h & jnp.uint32(n_out - 1)).astype(jnp.int32)
    prio = (h >> jnp.uint32(32 - prio_bits)) + jnp.uint32(1)  # >= 1
    packed = (prio << jnp.uint32(idx_bits)) | \
        jnp.arange(n, dtype=jnp.uint32)
    packed = jnp.where(valid, packed, jnp.uint32(0))

    table = jnp.zeros((n_out,), jnp.uint32).at[slot].max(packed,
                                                         mode="drop")
    sel_valid = table > 0
    sel_idx = (table & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    sel_pts = jnp.where(sel_valid[:, None],
                        jnp.take(points, sel_idx, axis=0), 0.0)
    return sel_pts, sel_idx, sel_valid


class VoxelTable(NamedTuple):
    """Direct-mapped surfel table (all arrays length ``n_slots``)."""
    points: jnp.ndarray   # (T, 3) f32, anchor coordinates
    normals: jnp.ndarray  # (T, 3) f32
    meta: jnp.ndarray     # (T,) int32 insert frame, -1 = empty
    key: jnp.ndarray      # (T,) uint32 full voxel hash (collision check)


def init_table(n_slots: int) -> VoxelTable:
    assert n_slots & (n_slots - 1) == 0, "n_slots must be a power of 2"
    return VoxelTable(points=jnp.zeros((n_slots, 3), jnp.float32),
                      normals=jnp.zeros((n_slots, 3), jnp.float32),
                      meta=jnp.full((n_slots,), -1, jnp.int32),
                      key=jnp.zeros((n_slots,), jnp.uint32))


def _live(table: VoxelTable, frame: jnp.ndarray, k_live: int) -> jnp.ndarray:
    return (table.meta >= 0) & (frame - table.meta < k_live)


def table_insert(table: VoxelTable, points: jnp.ndarray,
                 valid: jnp.ndarray, frame: jnp.ndarray,
                 k_live: int, voxel_size: float
                 ) -> Tuple[VoxelTable, jnp.ndarray, jnp.ndarray]:
    """Claims table slots for (S, 3) anchor-frame points.

    A point wins its voxel's slot iff the slot is empty or its resident is
    stale (older than ``k_live`` frames).  A live resident -- whether the
    same voxel (grid-sample-first semantics) or a hash-colliding other voxel
    (bounded density loss) -- is kept.  Among same-frame candidates for one
    slot the highest packed key wins (deterministic).

    Returns ``(table', won (S,) bool, won_slot (S,) int32)``; the caller
    computes normals for the winners and commits them with
    :func:`table_set_normals` (the winners' normal rows are zeroed here so
    a probe between the two calls cannot see a stale normal).
    """
    n_slots = table.meta.shape[0]
    s = points.shape[0]
    idx_bits = max(int(s - 1).bit_length(), 1)
    assert idx_bits + 2 <= 32

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    h = _voxel_hash(coords)
    slot = (h & jnp.uint32(n_slots - 1)).astype(jnp.int32)

    res_meta = jnp.take(table.meta, slot)
    replaceable = (res_meta < 0) | (frame - res_meta >= k_live)
    cand = valid & replaceable

    prio_bits = min(32 - idx_bits - 1, 14)
    prio = (h >> jnp.uint32(32 - prio_bits)) + jnp.uint32(1)
    packed = (prio << jnp.uint32(idx_bits)) | jnp.arange(s, dtype=jnp.uint32)
    packed = jnp.where(cand, packed, jnp.uint32(0))
    aux = jnp.zeros((n_slots,), jnp.uint32).at[slot].max(packed, mode="drop")

    # A point won iff its packed key is the slot's max (one winner per slot).
    won = cand & (jnp.take(aux, slot) == packed)
    safe_slot = jnp.where(won, slot, n_slots)  # out-of-bounds drop for losers
    new_pts = table.points.at[safe_slot].set(points, mode="drop")
    new_nrm = table.normals.at[safe_slot].set(0.0, mode="drop")
    new_meta = table.meta.at[safe_slot].set(frame, mode="drop")
    new_key = table.key.at[safe_slot].set(h, mode="drop")
    return (VoxelTable(new_pts, new_nrm, new_meta, new_key), won, slot)


def table_set_normals(table: VoxelTable, won: jnp.ndarray,
                      won_slot: jnp.ndarray,
                      normals: jnp.ndarray) -> VoxelTable:
    """Commits (S, 3) normals for the winners of :func:`table_insert`."""
    n_slots = table.meta.shape[0]
    safe_slot = jnp.where(won, won_slot, n_slots)
    return table._replace(
        normals=table.normals.at[safe_slot].set(normals, mode="drop"))


def _probe_offsets(radius: float, voxel_size: float) -> jnp.ndarray:
    """Static (P, 3) int32 voxel-offset block covering ``radius``."""
    reach = max(int(-(-radius // voxel_size)), 1)  # ceil
    r = jnp.arange(-reach, reach + 1, dtype=jnp.int32)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    return offs


def _probe_candidates(table: VoxelTable, queries: jnp.ndarray,
                      frame: jnp.ndarray, k_live: int,
                      voxel_size: float, radius: float):
    """(M, P) candidate slot gathers with squared distances (+inf dead)."""
    n_slots = table.meta.shape[0]
    offs = _probe_offsets(radius, voxel_size)
    coords = jnp.floor(queries / voxel_size).astype(jnp.int32)
    probe = coords[:, None, :] + offs[None, :, :]  # (M, P, 3)
    h = _voxel_hash(probe)
    slot = (h & jnp.uint32(n_slots - 1)).astype(jnp.int32)  # (M, P)

    pts = jnp.take(table.points, slot, axis=0)  # (M, P, 3)
    meta = jnp.take(table.meta, slot)
    key = jnp.take(table.key, slot)
    # Live resident whose stored hash matches the probed voxel: a colliding
    # resident (other voxel, same slot) has a different full hash and is
    # skipped -- it would rank by true distance anyway, but its coordinates
    # can be ARBITRARILY far and underflow nothing, so the key check just
    # avoids wasted candidates.
    ok = (meta >= 0) & (frame - meta < k_live) & (key == h)
    d = jnp.sum((pts - queries[:, None, :]) ** 2, axis=-1)
    # Gate INSIDE the probe: the offset block reaches up to a voxel past the
    # radius, so candidates beyond it exist but are not part of the
    # "exact within radius" contract.
    d = jnp.where(ok & (d <= radius * radius), d, jnp.inf)
    return slot, d


def table_nn(table: VoxelTable, queries: jnp.ndarray, frame: jnp.ndarray,
             k_live: int, voxel_size: float,
             radius: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN among live surfels: (M, 3) -> (slot (M,), sq_dist (M,)).

    Exact within ``radius`` over the *stored* surfels (collisions excluded
    at insert time).  Misses carry slot 0 / +inf; gate on the distance.
    """
    slot, d = _probe_candidates(table, queries, frame, k_live, voxel_size,
                                radius)
    best = jnp.argmin(d, axis=1)
    take = jnp.arange(queries.shape[0])
    return slot[take, best], d[take, best]


def table_knn(table: VoxelTable, queries: jnp.ndarray, frame: jnp.ndarray,
              k_live: int, voxel_size: float, radius: float,
              k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN among live surfels: -> (slots (M, k), sq_dists (M, k)).

    Missing neighbors carry +inf distance (mask on ``jnp.isfinite``).
    """
    slot, d = _probe_candidates(table, queries, frame, k_live, voxel_size,
                                radius)
    neg_top, pos = jax.lax.top_k(-d, k)
    return jnp.take_along_axis(slot, pos, axis=1), -neg_top


def table_reanchor(table: VoxelTable, new_from_old: jnp.ndarray,
                   voxel_size: float) -> VoxelTable:
    """Re-expresses every live surfel in a new anchor frame and re-hashes.

    The voxel quantization happens in the NEW coordinates, so two surfels
    can land in the same voxel after the transform; the packed-key scatter
    keeps one deterministically (the same bounded density loss as any
    insert collision).  Cost: one (T, 3) transform + one scatter -- paid
    only when the odometry drifts ``reanchor_dist`` from the old anchor.
    """
    n_slots = table.meta.shape[0]
    rot = new_from_old[:3, :3]
    tr = new_from_old[:3, 3]
    pts = table.points @ rot.T + tr
    nrm = table.normals @ rot.T
    alive = table.meta >= 0

    coords = jnp.floor(pts / voxel_size).astype(jnp.int32)
    h = _voxel_hash(coords)
    slot = (h & jnp.uint32(n_slots - 1)).astype(jnp.int32)

    idx_bits = int(n_slots - 1).bit_length()
    prio_bits = min(32 - idx_bits - 1, 14)
    assert prio_bits >= 1, "n_slots too large to pack re-anchor keys"
    prio = (h >> jnp.uint32(32 - prio_bits)) + jnp.uint32(1)
    packed = (prio << jnp.uint32(idx_bits)) | \
        jnp.arange(n_slots, dtype=jnp.uint32)
    packed = jnp.where(alive, packed, jnp.uint32(0))
    aux = jnp.zeros((n_slots,), jnp.uint32).at[slot].max(packed, mode="drop")
    won = alive & (jnp.take(aux, slot) == packed)
    safe_slot = jnp.where(won, slot, n_slots)

    fresh = init_table(n_slots)
    return VoxelTable(
        points=fresh.points.at[safe_slot].set(pts, mode="drop"),
        normals=fresh.normals.at[safe_slot].set(nrm, mode="drop"),
        meta=fresh.meta.at[safe_slot].set(table.meta, mode="drop"),
        key=fresh.key.at[safe_slot].set(h, mode="drop"))
