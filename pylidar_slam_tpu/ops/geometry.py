"""Vertex-map geometry kernels (JAX): normal maps, projective association.

Channels-last layout: vertex maps are ``(H, W, 3)``; batches of reference
maps are ``(K, H, W, 3)``.  Semantics mirror reference slam/common/geometry.py
(normal map: box-filtered covariance solve, geometry.py:240-295; projective
nearest neighbors: per-pixel min over K maps, geometry.py:397-439), expressed
as fused dense ops XLA maps onto the VPU/MXU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def mask_not_null(tensor: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """True where at least one channel along `axis` is non-zero (keepdims)."""
    return jnp.max(jnp.abs(tensor), axis=axis, keepdims=True) > 0


def box_filter(image: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Sum-pool with SAME zero padding over the two leading spatial dims.

    image: (H, W, C) -> (H, W, C); the window *sums* (not averages), matching
    the reference's all-ones conv2d kernel (geometry.py:261-268).
    """
    pad = kernel_size // 2
    return lax.reduce_window(
        image, 0.0, lax.add,
        window_dimensions=(kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (pad, pad), (0, 0)))


def _adjugate_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate of (..., 3, 3) matrices: inv(m) = adj(m) / det(m)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    cof = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)
    return cof


def inverse_3x3(m: jnp.ndarray, eps: float = 1.0e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched closed-form 3x3 inverse. Returns (inverse, det).

    Singular matrices (|det| <= eps) yield a zero matrix, matching the
    reference's det-guard (geometry.py:80-99).
    """
    adj = _adjugate_3x3(m)
    det = (m[..., 0, 0] * adj[..., 0, 0] + m[..., 0, 1] * adj[..., 1, 0]
           + m[..., 0, 2] * adj[..., 2, 0])
    ok = jnp.abs(det) > eps
    safe_det = jnp.where(ok, det, 1.0)
    inv = adj / safe_det[..., None, None]
    inv = jnp.where(ok[..., None, None], inv, 0.0)
    return inv, det


def compute_normal_map(vertex_map: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Computes unit normals for an (H, W, 3) vertex map.

    Solves, per pixel, ``(sum_w v v^T) n = sum_w v`` over a k x k window (the
    plane-through-neighbors normal; null pixels contribute zeros to both sums),
    then normalizes.  Pixels with a singular window covariance or null vertex
    get a zero normal.  Faithful to reference geometry.py:240-295.
    """
    h, w, _ = vertex_map.shape
    v_boxed = box_filter(vertex_map, kernel_size)  # (H, W, 3)
    outer = vertex_map[..., :, None] * vertex_map[..., None, :]  # (H, W, 3, 3)
    cov_boxed = box_filter(outer.reshape(h, w, 9), kernel_size).reshape(h, w, 3, 3)

    inv, det = inverse_3x3(cov_boxed)
    n = jnp.einsum("hwij,hwj->hwi", inv, v_boxed)

    ok = jnp.abs(det) > 1.0e-6
    norms = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norms > 0, n / jnp.where(norms > 0, norms, 1.0), 0.0)
    n = jnp.where(ok[..., None], n, 0.0)

    null_pixel = jnp.linalg.norm(vertex_map, axis=-1, keepdims=True) == 0.0
    return jnp.where(null_pixel, 0.0, n)


def oriented_normal_map(vertex_map: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Normal map with normals oriented towards the sensor origin.

    The plane-solve normal has an arbitrary-ish sign; for point-to-plane
    residuals the sign cancels, but orientation helps downstream consumers.
    """
    n = compute_normal_map(vertex_map, kernel_size)
    flip = jnp.sum(n * vertex_map, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def compute_neighbors(vm_target: jnp.ndarray,
                      vm_reference: jnp.ndarray,
                      reference_fields: Optional[jnp.ndarray] = None):
    """Projective nearest neighbor: per-pixel min over K reference maps.

    Args:
        vm_target: (H, W, 3) target vertex map.
        vm_reference: (K, H, W, 3) reference vertex maps.
        reference_fields: optional (K, H, W, C) fields gathered at the argmin.

    Returns:
        (neighbors (H, W, 3), fields (H, W, C) or None): zeros where the
        target pixel is null or no valid reference candidate exists.
    """
    mask_target = mask_not_null(vm_target)  # (H, W, 1)
    mask_reference = mask_not_null(vm_reference)  # (K, H, W, 1)

    diff = jnp.linalg.norm(vm_target[None] - vm_reference, axis=-1, keepdims=True)
    inf = jnp.array(jnp.inf, diff.dtype)
    diff = jnp.where(mask_reference, diff, inf)
    diff = jnp.where(mask_target[None], diff, inf)

    best = jnp.argmin(diff[..., 0], axis=0)  # (H, W)
    best_dist = jnp.min(diff[..., 0], axis=0)  # (H, W)
    found = jnp.isfinite(best_dist)[..., None]

    take = best[None, ..., None]
    neighbors = jnp.take_along_axis(vm_reference, take, axis=0)[0]
    neighbors = jnp.where(found & mask_target, neighbors, 0.0)

    fields = None
    if reference_fields is not None:
        fields = jnp.take_along_axis(reference_fields, take, axis=0)[0]
        fields = jnp.where(found & mask_target, fields, 0.0)
    return neighbors, fields
