"""Closed-form rigid registration (weighted Procrustes / Kabsch) in JAX.

Equivalent capability to reference slam/common/registration.py:15-74 (the
SVD-based rigid fit); the OpenCV 2D feature paths of the reference are
re-designed elsewhere (see slam/initialization.py ElevationImage prior which
uses dense phase correlation instead of sparse ORB/AKAZE features).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp



def weighted_procrustes(ref_points: jnp.ndarray,
                        target_points: jnp.ndarray,
                        weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Optimal rigid transform T minimizing sum w ||T(target) - ref||^2.

    Args:
        ref_points: (B, N, 3) reference points.
        target_points: (B, N, 3) target points.
        weights: optional (B, N) non-negative weights (masking = zero weight).

    Returns:
        (B, 4, 4) pose matrices mapping target -> ref.
    """
    b, n, _ = ref_points.shape
    if weights is None:
        weights = jnp.ones((b, n), dtype=ref_points.dtype)
    wsum = jnp.maximum(weights.sum(axis=1, keepdims=True), 1e-12)
    wn = (weights / wsum)[..., None]  # (B, N, 1)

    mu_ref = jnp.sum(ref_points * wn, axis=1, keepdims=True)
    mu_tgt = jnp.sum(target_points * wn, axis=1, keepdims=True)
    ref_c = ref_points - mu_ref
    tgt_c = target_points - mu_tgt

    # Cross-covariance H = sum w (tgt_c)^T (ref_c)
    h = jnp.einsum("bn,bni,bnj->bij", weights, tgt_c, ref_c)
    u, s, vt = jnp.linalg.svd(h)
    # Proper rotation: flip the last singular vector if det < 0 (Kabsch).
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", jnp.swapaxes(vt, 1, 2),
                                    jnp.swapaxes(u, 1, 2)))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    rot = jnp.einsum("bji,bj,bkj->bik", vt, d, u)  # V diag(d) U^T

    tr = mu_ref[:, 0, :] - jnp.einsum("bij,bj->bi", rot, mu_tgt[:, 0, :])
    mat = jnp.zeros((b, 4, 4), dtype=ref_points.dtype)
    mat = mat.at[:, :3, :3].set(rot)
    mat = mat.at[:, :3, 3].set(tr)
    mat = mat.at[:, 3, 3].set(1.0)
    return mat
