"""Voxel quantization / hashing / grid sampling on fixed-size padded clouds (JAX).

Replaces the reference's numba kernels (slam/common/pointcloud.py) with sorted
hash sweeps: data-dependent "unique voxel" sets become fixed-shape boolean
masks, so everything stays jit-compiled with no host round-trips.

The spatial hash is the reference's three-prime hash (pointcloud.py:13-23)
evaluated in int32 with natural overflow wrapping -- collisions are
negligible for <1e6-voxel scans and the semantics ("one sample point per
hash") are preserved.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

HASH_PRIMES = (73856093, 19349669, 83492791)


def voxelise(points: jnp.ndarray, voxel_x: float, voxel_y: float = -1.0,
             voxel_z: float = -1.0) -> jnp.ndarray:
    """(N, 3) points -> (N, 3) int32 voxel coordinates (round-to-nearest)."""
    if voxel_y <= 0:
        voxel_y = voxel_x
    if voxel_z <= 0:
        voxel_z = voxel_x
    scale = jnp.array([1.0 / voxel_x, 1.0 / voxel_y, 1.0 / voxel_z],
                      dtype=points.dtype)
    return jnp.round(points * scale).astype(jnp.int32)


def voxel_hash(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int32 voxel coords -> (N,) int32 spatial hashes (overflow wraps)."""
    return (HASH_PRIMES[0] * coords[..., 0] + HASH_PRIMES[1] * coords[..., 1]
            + HASH_PRIMES[2] * coords[..., 2])


def planar_hash(coords: jnp.ndarray) -> jnp.ndarray:
    """Pillar hash over (x, y) only (reference pointcloud.py:26-38)."""
    return HASH_PRIMES[0] * coords[..., 0] + HASH_PRIMES[1] * coords[..., 1]


def grid_sample_mask(points: jnp.ndarray, voxel_size: float,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Marks one point per voxel: the first (lowest-index) point of each voxel.

    Fixed-shape replacement for the reference's ``grid_sample``
    (pointcloud.py:182-195, np.unique on hashes): returns an (N,) bool mask
    selecting exactly the points np.unique(return_index=True) would select.
    """
    n = points.shape[0]
    hashes = voxel_hash(voxelise(points, voxel_size))
    if mask is not None:
        # Invalid points get unique out-of-band keys so they never win a voxel.
        hashes = jnp.where(mask, hashes, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(hashes, stable=True)
    sorted_h = hashes[order]
    first = jnp.concatenate([jnp.array([True]), sorted_h[1:] != sorted_h[:-1]])
    keep_sorted = first
    if mask is not None:
        keep_sorted = keep_sorted & mask[order]
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


class VoxelStats(NamedTuple):
    """Per-voxel normal distribution over a padded capacity of V slots."""
    sizes: jnp.ndarray  # (V,) int32 number of points in each voxel (0 = empty)
    means: jnp.ndarray  # (V, 3)
    covariances: jnp.ndarray  # (V, 3, 3)
    point_voxel_ids: jnp.ndarray  # (N,) voxel slot id of each input point


def voxel_normal_distribution(points: jnp.ndarray,
                              voxel_size: float,
                              mask: Optional[jnp.ndarray] = None,
                              capacity: Optional[int] = None) -> VoxelStats:
    """Per-voxel mean/covariance via a sorted-hash segment sweep.

    Fixed-capacity equivalent of reference pointcloud.py:83-167: voxel slots
    are ordered by ascending hash (like the reference's sorted sweep); unused
    slots have size 0.  `capacity` defaults to N.
    """
    n = points.shape[0]
    v = capacity or n
    hashes = voxel_hash(voxelise(points, voxel_size))
    if mask is not None:
        hashes = jnp.where(mask, hashes, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(hashes, stable=True)
    sorted_h = hashes[order]
    sorted_pts = points[order]
    first = jnp.concatenate([jnp.array([True]), sorted_h[1:] != sorted_h[:-1]])
    seg_ids = jnp.cumsum(first) - 1  # (N,) 0..V-1 in sorted order

    valid = jnp.ones((n,), dtype=bool) if mask is None else mask[order]
    w = valid.astype(points.dtype)

    sizes = jax.ops.segment_sum(valid.astype(jnp.int32), seg_ids, num_segments=v)
    sums = jax.ops.segment_sum(sorted_pts * w[:, None], seg_ids, num_segments=v)
    outer = (sorted_pts[:, :, None] * sorted_pts[:, None, :]) * w[:, None, None]
    sq_sums = jax.ops.segment_sum(outer, seg_ids, num_segments=v)

    counts = jnp.maximum(sizes, 1).astype(points.dtype)
    means = sums / counts[:, None]
    covs = sq_sums - counts[:, None, None] * (means[:, :, None] * means[:, None, :])

    point_ids = jnp.zeros((n,), dtype=jnp.int32).at[order].set(
        seg_ids.astype(jnp.int32))
    return VoxelStats(sizes=sizes, means=means, covariances=covs,
                      point_voxel_ids=point_ids)
