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


def compute_normal_map_centered(vertex_map: jnp.ndarray,
                                kernel_size: int = 5,
                                min_neighbors: int = 3) -> jnp.ndarray:
    """Window plane fit via the CENTERED covariance -- f32-robust at range.

    :func:`compute_normal_map` solves the reference's uncentered system
    ``(sum v v^T) n = sum v`` (geometry.py:240-295), whose entries scale with
    range^2: at r ~ 100 m the f32 rounding of the window sums (~N r^2 eps)
    rivals the window's actual surface-curvature signal, and the resulting
    normal noise differs by platform reduction order.  Here each window's
    vertices are centered on the window mean BEFORE the outer products --
    covariance entries scale with the window's spatial SPREAD, not its
    range -- and the normal is the smallest eigenvector (the same fit as
    :func:`knn_plane_normals`).  Cost: k^2 static shifted elementwise passes
    (VPU work, no gathers); use for map-quality normals where accuracy
    matters more than the one-pass box filter.
    """
    h, w, _ = vertex_map.shape
    pad = kernel_size // 2
    valid = (jnp.linalg.norm(vertex_map, axis=-1) > 0)
    vw = vertex_map * valid[..., None]

    cnt = box_filter(valid[..., None].astype(vertex_map.dtype),
                     kernel_size)[..., 0]
    mean = box_filter(vw, kernel_size) / jnp.maximum(cnt, 1.0)[..., None]

    vp = jnp.pad(vw, ((pad, pad), (pad, pad), (0, 0)))
    mp = jnp.pad(valid, ((pad, pad), (pad, pad)))
    cov = jnp.zeros((h, w, 3, 3), vertex_map.dtype)
    for dr in range(kernel_size):
        for dc in range(kernel_size):
            u = vp[dr:dr + h, dc:dc + w] - mean
            u = u * mp[dr:dr + h, dc:dc + w, None]
            cov = cov + u[..., :, None] * u[..., None, :]
    n = smallest_eigenvector_3x3(cov / jnp.maximum(cnt, 1.0)[..., None, None])

    ok = valid & (cnt >= min_neighbors)
    # Match compute_normal_map's orientation convention (away from the
    # sensor: n . v = 1 plane solutions point along +v for v near the plane).
    flip = jnp.sum(n * vertex_map, axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    return jnp.where(ok[..., None], n, 0.0)


def smallest_eigenvector_3x3(m: jnp.ndarray,
                             eps: float = 1.0e-9) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of batched symmetric
    (..., 3, 3) matrices, closed form (no iterative eigensolver: pure
    elementwise math, TPU/VPU-friendly).

    Eigenvalues via the trigonometric solution of the characteristic cubic;
    the eigenvector via the column space of ``(A - l1 I)(A - l2 I)`` (for
    distinct eigenvalues its columns are multiples of the l3 eigenvector).
    Near-isotropic matrices (plane undefined) return zeros.
    """
    a00, a11, a22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    a01, a02, a12 = m[..., 0, 1], m[..., 0, 2], m[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    safe_p = jnp.where(p > eps, p, 1.0)
    b = (m - q[..., None, None] * jnp.eye(3, dtype=m.dtype)) \
        / safe_p[..., None, None]
    det_b = (b[..., 0, 0] * (b[..., 1, 1] * b[..., 2, 2]
                             - b[..., 1, 2] * b[..., 2, 1])
             - b[..., 0, 1] * (b[..., 1, 0] * b[..., 2, 2]
                               - b[..., 1, 2] * b[..., 2, 0])
             + b[..., 0, 2] * (b[..., 1, 0] * b[..., 2, 1]
                               - b[..., 1, 1] * b[..., 2, 0]))
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)  # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3

    eye = jnp.eye(3, dtype=m.dtype)
    prod = (m - l1[..., None, None] * eye) @ (m - l2[..., None, None] * eye)
    col_norms = jnp.linalg.norm(prod, axis=-2)  # (..., 3) per column
    best = jnp.argmax(col_norms, axis=-1)
    v = jnp.take_along_axis(
        prod, jnp.broadcast_to(best[..., None, None],
                               (*m.shape[:-2], 3, 1)), axis=-1)[..., 0]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = (p > eps)[..., None] & (norm > eps)
    return jnp.where(ok, v / jnp.where(norm > eps, norm, 1.0), 0.0)


def knn_plane_normals(neighbors: jnp.ndarray, valid: jnp.ndarray,
                      min_neighbors: int = 3) -> jnp.ndarray:
    """Per-query plane normal from k gathered neighbors.

    ``neighbors`` (M, k, 3) with validity (M, k): the normal is the smallest
    eigenvector of the neighbors' sample covariance (the reference's lazy
    map normals, local_map.py:397-422, computed there as the smallest
    singular vector of the k=10-NN neighborhood).  Queries with fewer than
    ``min_neighbors`` valid neighbors get a zero normal.
    """
    w = valid.astype(neighbors.dtype)[..., None]  # (M, k, 1)
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (M, 1)
    mean = jnp.sum(neighbors * w, axis=1) / count
    centered = (neighbors - mean[:, None, :]) * w
    cov = jnp.einsum("mki,mkj->mij", centered, centered) / count[..., None]
    n = smallest_eigenvector_3x3(cov)
    enough = jnp.sum(valid, axis=1) >= min_neighbors
    return jnp.where(enough[:, None], n, 0.0)


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
