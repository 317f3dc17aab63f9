"""Bird's-eye-view elevation images + dense (x, y, yaw) registration (JAX).

The reference's 2D registration extracts sparse AKAZE/ORB features from a
matplotlib-colored elevation image and RANSACs a rigid fit with OpenCV
(slam/common/registration.py:88-274).  Sparse feature matching maps poorly to
TPUs; the same capability here is dense and FFT-based:

* elevation image: scatter-max of z over a metric (x, y) grid (the same
  encoded scatter-min machinery as the spherical rasterizer, negated);
* rotation: a yaw sweep of bilinear-warped images scored by FFT phase
  correlation (each candidate yaw is one batched FFT correlation - a dense,
  batchable workload);
* translation: the phase-correlation peak at the best yaw, to pixel
  resolution, refined by quadratic interpolation around the peak.

Used by the elevation-image loop closure and the EI initialization prior.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp



def ground_suppressed_mask(points: jnp.ndarray,
                           mask: Optional[jnp.ndarray] = None,
                           margin: float = 0.5) -> jnp.ndarray:
    """Validity mask keeping only points `margin` meters above the median
    height (~ground level on ground-dominated scans).

    A SINGLE scan's ground return pattern is EGOCENTRIC -- the range-ring
    sampling density moves with the sensor -- so BEV phase correlation
    between consecutive raw scans locks onto it at ZERO shift regardless of
    the true motion (measured: 2 m/frame estimated as ~1 mm).  Structures
    above ground (walls, poles, facades) are world-fixed; masking to them
    restores cm-accurate estimates at 1-3 m/frame.  Aggregated submaps (the
    loop-closure input) do not need this: their ground pattern is the union
    over many sensor positions and carries no single egocentric signature.
    """
    m = jnp.max(jnp.abs(points), axis=-1) > 0
    if mask is not None:
        m = m & mask
    zmed = jnp.nan_to_num(
        jnp.nanmedian(jnp.where(m, points[:, 2], jnp.nan)))
    return m & (points[:, 2] > zmed + margin)


def build_elevation_image(points: jnp.ndarray,
                          mask: Optional[jnp.ndarray],
                          pixel_size: float,
                          size: int,
                          z_min: float = -3.0,
                          z_max: float = 5.0) -> jnp.ndarray:
    """(N, 3) points -> (size, size) max-elevation image centered at origin.

    Empty pixels are 0; occupied pixels hold (z_clip - z_min) / (z_max-z_min)
    in (0, 1] (shifted so that emptiness is distinguishable).
    """
    n = points.shape[0]
    half = size * pixel_size / 2.0
    xs = points[:, 0]
    ys = points[:, 1]
    zs = jnp.clip(points[:, 2], z_min, z_max)

    cols = jnp.floor((xs + half) / pixel_size).astype(jnp.int32)
    rows = jnp.floor((ys + half) / pixel_size).astype(jnp.int32)
    valid = (cols >= 0) & (cols < size) & (rows >= 0) & (rows < size)
    if mask is not None:
        valid = valid & mask
    flat = jnp.where(valid, rows * size + cols, size * size)

    neg_inf = jnp.array(-jnp.inf, zs.dtype)
    zmax_img = jnp.full((size * size + 1,), neg_inf).at[flat].max(
        jnp.where(valid, zs, neg_inf), mode="drop")[: size * size]
    hit = jnp.isfinite(zmax_img)
    norm = (zmax_img - z_min) / (z_max - z_min)
    img = jnp.where(hit, 0.05 + 0.95 * jnp.clip(norm, 0.0, 1.0), 0.0)
    return img.reshape(size, size)


def _rotate_image(image: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Bilinear rotation of a square image about its center."""
    s = image.shape[0]
    c = (s - 1) / 2.0
    ii, jj = jnp.meshgrid(jnp.arange(s, dtype=image.dtype),
                          jnp.arange(s, dtype=image.dtype), indexing="ij")
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
    # inverse-rotate output coords to source coords
    y = ii - c
    x = jj - c
    src_y = cos_y * y + sin_y * x + c
    src_x = -sin_y * y + cos_y * x + c
    return jax.scipy.ndimage.map_coordinates(image, [src_y, src_x], order=1,
                                             mode="constant", cval=0.0)


def phase_correlation(img_a: jnp.ndarray, img_b: jnp.ndarray):
    """Translation (dy, dx) such that shifting img_b by it aligns with img_a.

    Returns (dy, dx, score): peak location (subpixel via 3-point quadratic)
    and normalized peak height.
    """
    s = img_a.shape[0]
    fa = jnp.fft.rfft2(img_a)
    fb = jnp.fft.rfft2(img_b)
    cross = fa * jnp.conj(fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-9)
    corr = jnp.fft.irfft2(cross, s=img_a.shape)
    peak = jnp.argmax(corr)
    py, px = peak // s, peak % s

    def subpixel(c_m, c_0, c_p):
        denom = c_m - 2 * c_0 + c_p
        return jnp.where(jnp.abs(denom) > 1e-9,
                         0.5 * (c_m - c_p) / denom, 0.0)

    dy_off = subpixel(corr[(py - 1) % s, px], corr[py, px], corr[(py + 1) % s, px])
    dx_off = subpixel(corr[py, (px - 1) % s], corr[py, px], corr[py, (px + 1) % s])
    # unwrap: shifts beyond s/2 are negative
    dy = jnp.where(py > s // 2, py - s, py).astype(img_a.dtype) + dy_off
    dx = jnp.where(px > s // 2, px - s, px).astype(img_a.dtype) + dx_off
    score = corr[py, px]
    return dy, dx, score


class BEVRegistrationResult(NamedTuple):
    yaw: jnp.ndarray  # () best yaw (rad), rotation of b into a
    dy: jnp.ndarray  # () row shift in pixels
    dx: jnp.ndarray  # () col shift in pixels
    score: jnp.ndarray  # () phase-correlation peak height


def register_bev(img_a: jnp.ndarray, img_b: jnp.ndarray,
                 num_yaw_steps: int = 60,
                 yaw_range: float = math.pi,
                 coarse_factor: int = 1) -> BEVRegistrationResult:
    """Finds (yaw, dy, dx) aligning img_b to img_a by exhaustive yaw sweep +
    phase correlation per candidate (vmapped: one batched FFT stack).

    `coarse_factor` > 1 runs the yaw SWEEP on `factor`x average-pooled
    images and re-scores only the top-8 coarse yaws at full resolution (the
    coarse peak ordering is noisy at the margin but the true yaw reliably
    lands in the top few) -- a ~factor^2 cut of the dominant rotate+FFT
    stack.  Default 1 (exact full sweep): the top-8 rescore can in principle
    miss the true yaw on low-texture BEV images, so callers opt in where the
    trade was validated (loop-closure candidate matching)."""
    yaws = jnp.linspace(-yaw_range, yaw_range, num_yaw_steps, endpoint=False)

    if coarse_factor > 1 and img_a.ndim == 2 \
            and img_a.shape[0] == img_a.shape[1] \
            and img_a.shape[0] % coarse_factor == 0 \
            and num_yaw_steps > 8:
        f = coarse_factor
        s = img_a.shape[0]
        small_a = img_a.reshape(s // f, f, s // f, f).mean(axis=(1, 3))
        small_b = img_b.reshape(s // f, f, s // f, f).mean(axis=(1, 3))

        def try_yaw_coarse(yaw):
            rotated = _rotate_image(small_b, yaw)
            _, _, score = phase_correlation(small_a, rotated)
            return score

        coarse = jax.vmap(try_yaw_coarse)(yaws)
        _, top_idx = jax.lax.top_k(coarse, 8)

        def try_yaw_full(yaw):
            rotated = _rotate_image(img_b, yaw)
            return phase_correlation(img_a, rotated)

        dys, dxs, scores = jax.vmap(try_yaw_full)(yaws[top_idx])
        best = jnp.argmax(scores)
        return BEVRegistrationResult(yaw=yaws[top_idx[best]], dy=dys[best],
                                     dx=dxs[best], score=scores[best])

    def try_yaw(yaw):
        rotated = _rotate_image(img_b, yaw)
        dy, dx, score = phase_correlation(img_a, rotated)
        return dy, dx, score

    dys, dxs, scores = jax.vmap(try_yaw)(yaws)
    best = jnp.argmax(scores)
    return BEVRegistrationResult(yaw=yaws[best], dy=dys[best], dx=dxs[best],
                                 score=scores[best])


def _polar_spectrum(img: jnp.ndarray, n_theta: int, n_radius: int):
    """(T, R) polar resampling of the FFT magnitude spectrum.

    The magnitude spectrum is translation-invariant, and rotating the image
    rotates it by the same angle -- so image rotation becomes a CIRCULAR
    SHIFT along the theta axis of this polar map (Fourier-Mellin).  Only a
    half-turn of angles is sampled: |F| of a real image is point-symmetric,
    so theta and theta+pi carry identical information.
    """
    s = img.shape[0]
    f = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(img)))
    # log magnitude flattens the huge dynamic range (DC dominates otherwise)
    f = jnp.log1p(f)
    c = s / 2.0
    thetas = jnp.arange(n_theta) * (math.pi / n_theta)
    # skip the lowest frequencies (translation-ish, low angular resolution)
    radii = 2.0 + jnp.arange(n_radius) * ((s / 2.0 - 3.0) / n_radius)
    tt, rr = jnp.meshgrid(thetas, radii, indexing="ij")
    yy = c + rr * jnp.sin(tt)
    xx = c + rr * jnp.cos(tt)
    return jax.scipy.ndimage.map_coordinates(f, [yy, xx], order=1,
                                             mode="constant", cval=0.0)


def _circular_shift_theta(pa: jnp.ndarray, pb: jnp.ndarray):
    """Best circular shift (in theta bins, subbin) aligning pb to pa along
    axis 0, via 1D FFT correlation summed over the radius axis."""
    n_theta = pa.shape[0]
    fa = jnp.fft.rfft(pa, axis=0)
    fb = jnp.fft.rfft(pb, axis=0)
    corr = jnp.fft.irfft(jnp.sum(fa * jnp.conj(fb), axis=1), n=n_theta)
    k = jnp.argmax(corr)

    def subbin(c_m, c_0, c_p):
        denom = c_m - 2 * c_0 + c_p
        return jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c_m - c_p) / denom, 0.0)

    off = subbin(corr[(k - 1) % n_theta], corr[k], corr[(k + 1) % n_theta])
    shift = k.astype(pa.dtype) + off
    # unwrap: shifts beyond half a turn are negative
    return jnp.where(shift > n_theta / 2, shift - n_theta, shift)


def register_bev_fm(img_a: jnp.ndarray, img_b: jnp.ndarray,
                    n_theta: int = 180,
                    n_radius: int = 128,
                    coarse_factor: int = 4) -> BEVRegistrationResult:
    """Fourier-Mellin (x, y, yaw) registration -- the fast match path.

    Replaces the exhaustive `register_bev` yaw sweep (72 rotate+FFT rounds,
    ~290 ms/pair on the target device at 512^2) with:

    1. ONE polar-magnitude-spectrum correlation for the rotation (image
       rotation = circular shift along the polar theta axis; ~1-bin
       precision, yaw recovered mod pi since |F| is point-symmetric);
    2. a 10-candidate refinement sweep (5 sub-bin offsets x the two
       half-turn hypotheses) on `coarse_factor`x average-pooled images --
       the phase-correlation peak height both disambiguates the half turn
       and ranks sub-bin rotation quality at factor^2 less FFT/gather work;
    3. ONE full-resolution phase correlation at the winning yaw for the
       final (dy, dx) and the acceptance score.

    ~25x less device work than the sweep at equal-or-better accuracy on
    loop-closure-scale BEV images (the sub-bin yaw beats the sweep's
    2*pi/num_yaw_steps grid).
    """
    s = img_a.shape[0]
    pa = _polar_spectrum(img_a, n_theta, n_radius)
    pb = _polar_spectrum(img_b, n_theta, n_radius)
    shift = _circular_shift_theta(pa, pb)
    # shifting pb by +k theta-bins aligns its spectrum to pa's => img_b's
    # content is rotated by +k bins relative to img_a.  _rotate_image
    # samples with the INVERSE rotation (the sweep convention: the returned
    # yaw is the image-warp angle, the cloud-space angle is -yaw --
    # bev_transform_to_se3), so the warp candidate is -shift.
    yaw0 = -shift * (math.pi / n_theta)

    if coarse_factor > 1 and s % coarse_factor == 0:
        f = coarse_factor
        small_a = img_a.reshape(s // f, f, s // f, f).mean(axis=(1, 3))
        small_b = img_b.reshape(s // f, f, s // f, f).mean(axis=(1, 3))
    else:
        small_a, small_b = img_a, img_b

    def try_yaw_coarse(yaw):
        rotated = _rotate_image(small_b, yaw)
        _, _, score = phase_correlation(small_a, rotated)
        return score

    bin_rad = math.pi / n_theta
    offsets = jnp.linspace(-bin_rad, bin_rad, 5)
    yaws = jnp.concatenate([yaw0 + offsets, yaw0 + math.pi + offsets])
    # keep candidates in (-pi, pi]
    yaws = jnp.where(yaws > math.pi, yaws - 2 * math.pi, yaws)
    yaws = jnp.where(yaws <= -math.pi, yaws + 2 * math.pi, yaws)
    scores = jax.vmap(try_yaw_coarse)(yaws)
    best = jnp.argmax(scores)
    yaw = yaws[best]
    # sub-offset parabola over the winning hypothesis' 5-point score curve
    # (the coarse argmax leaves ~half-bin rotation residual, which smears
    # the full-res translation peak)
    k = jnp.clip(best % 5, 1, 3) + (best // 5) * 5
    denom = scores[k - 1] - 2 * scores[k] + scores[k + 1]
    frac = jnp.where(jnp.abs(denom) > 1e-9,
                     0.5 * (scores[k - 1] - scores[k + 1]) / denom, 0.0)
    step = offsets[1] - offsets[0]
    yaw = yaws[k] + jnp.clip(frac, -1.0, 1.0) * step

    dy, dx, score = phase_correlation(img_a, _rotate_image(img_b, yaw))
    return BEVRegistrationResult(yaw=yaw, dy=dy, dx=dx, score=score)


def bev_transform_to_se3(result: BEVRegistrationResult,
                         pixel_size: float) -> jnp.ndarray:
    """Converts a BEV registration into a (4, 4) SE(3) transform (z = 0).

    The returned T maps coordinates of cloud b into cloud a's frame
    (rows = y, cols = x in build_elevation_image).  `_rotate_image` samples
    with the inverse rotation, so the cloud-space angle is -yaw.
    """
    cos_y = jnp.cos(-result.yaw)
    sin_y = jnp.sin(-result.yaw)
    tx = result.dx * pixel_size
    ty = result.dy * pixel_size
    mat = jnp.eye(4, dtype=jnp.float32)
    mat = mat.at[0, 0].set(cos_y)
    mat = mat.at[0, 1].set(-sin_y)
    mat = mat.at[1, 0].set(sin_y)
    mat = mat.at[1, 1].set(cos_y)
    mat = mat.at[0, 3].set(tx)
    mat = mat.at[1, 3].set(ty)
    return mat
