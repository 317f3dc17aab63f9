"""Fused window-association + point-to-plane normal-equation assembly kernel.

One Pallas pass replaces the aggregated-map ICP iteration's hot sequence
(window_associate -> residuals -> Jacobian -> robust weights -> J^T J / J^T r
reductions): for every target pixel it scans the (2wr+1) x (2wc+1) model
window (row shifts via halo-read from the full-model VMEM block, column
shifts via lane rolls), picks the closest valid candidate, and accumulates
the weighted 6x6 normal equations directly -- the (H, W) intermediates never
touch HBM.

At the zero linearization point the point-to-plane Jacobian is simply
``J = [n, p x n]`` (translation block = the normal, rotation block = the
lever arm), so the 27 reduction channels (21 upper-triangular H + 6 g) are
plain elementwise products summed per row-block.

Layout: all images planar (H, W) per channel (lanes = W).  Outputs one
(1, 8, 64)-tile of partial sums per row-block program; XLA sums the blocks
and solves the 6x6 outside.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ROWS_PER_PROGRAM = 8
NUM_OUT = 30  # 21 (H upper) + 6 (g) + loss + count + weighted-count


def _make_kernel(h: int, w: int, wr: int, wc: int, max_nd_sq: float,
                 scheme: str, sigma: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tx_ref, ty_ref, tz_ref, mx_ref, my_ref, mz_ref,
               nx_ref, ny_ref, nz_ref, mv_ref, out_ref):
        """t*_ref: (8, W) target rows; m*/n*_ref + mv_ref: (H, W) full model;
        out_ref: (1, 8, 64) partial sums."""
        row0 = pl.program_id(0) * ROWS_PER_PROGRAM

        tx, ty, tz = tx_ref[...], ty_ref[...], tz_ref[...]
        tvalid = (jnp.abs(tx) + jnp.abs(ty) + jnp.abs(tz)) > 0

        big = jnp.float32(3.0e38)
        best_d = jnp.full((ROWS_PER_PROGRAM, w), big, jnp.float32)
        best = [jnp.zeros((ROWS_PER_PROGRAM, w), jnp.float32) for _ in range(6)]

        # Aligned halo: load prev/cur/next 8-row tiles per channel (starts are
        # provably multiples of 8 -- Mosaic rejects unaligned row loads), then
        # take STATIC dr-shifted slices of the concatenated (24, W) buffer.
        # Border programs duplicate edge tiles; the distance gate rejects the
        # resulting bad matches.
        rp = ROWS_PER_PROGRAM
        prev0 = pl.multiple_of(jnp.maximum(row0 - rp, 0), rp)
        next0 = pl.multiple_of(jnp.minimum(row0 + rp, h - rp), rp)

        def halo(ref):
            return jnp.concatenate([
                ref[pl.ds(prev0, rp), :],
                ref[pl.ds(pl.multiple_of(row0, rp), rp), :],
                ref[pl.ds(next0, rp), :]], axis=0)  # (24, W)

        h_mx, h_my, h_mz = halo(mx_ref), halo(my_ref), halo(mz_ref)
        h_nx, h_ny, h_nz = halo(nx_ref), halo(ny_ref), halo(nz_ref)
        h_mv = halo(mv_ref)

        # Per-target-row global indices (for border validity below)
        local_rows = jax.lax.broadcasted_iota(jnp.int32, (rp, w), 0)

        for dr in range(-wr, wr + 1):
            lo = rp + dr
            mx = h_mx[lo:lo + rp]
            my = h_my[lo:lo + rp]
            mz = h_mz[lo:lo + rp]
            nx = h_nx[lo:lo + rp]
            ny = h_ny[lo:lo + rp]
            nz = h_nz[lo:lo + rp]
            mv = h_mv[lo:lo + rp]
            # Border masking: when the prev/next tile is a clamped duplicate,
            # the dr-shifted source row is out of the image -- invalidate it
            # (this matches window_associate's zero-filled row shifts and
            # removes the fused backend's border accuracy penalty).
            src_row = row0 + local_rows + dr
            row_ok = (src_row >= 0) & (src_row < h)
            mv = jnp.where(row_ok, mv, 0.0)
            for dc in range(-wc, wc + 1):
                shift = dc % w  # pltpu.roll requires a non-negative shift
                cmx = pltpu.roll(mx, shift, 1)
                cmy = pltpu.roll(my, shift, 1)
                cmz = pltpu.roll(mz, shift, 1)
                cnx = pltpu.roll(nx, shift, 1)
                cny = pltpu.roll(ny, shift, 1)
                cnz = pltpu.roll(nz, shift, 1)
                cmv = pltpu.roll(mv, shift, 1)
                d = (tx - cmx) ** 2 + (ty - cmy) ** 2 + (tz - cmz) ** 2
                ok = (cmv > 0) & tvalid
                d = jnp.where(ok, d, big)
                better = d < best_d
                best_d = jnp.where(better, d, best_d)
                cand = (cmx, cmy, cmz, cnx, cny, cnz)
                best = [jnp.where(better, c, b) for c, b in zip(cand, best)]

        rx, ry, rz, nx, ny, nz = best
        matched = (best_d < max_nd_sq)
        nvalid = (jnp.abs(nx) + jnp.abs(ny) + jnp.abs(nz)) > 0
        matched = matched & nvalid

        # residual r = (t - m) . n ; J = [n, t x n] at the zero delta
        res = (tx - rx) * nx + (ty - ry) * ny + (tz - rz) * nz
        j3 = ty * nz - tz * ny
        j4 = tz * nx - tx * nz
        j5 = tx * ny - ty * nx
        jrow = (nx, ny, nz, j3, j4, j5)

        # squared robust weights (the w^2 entering the normal equations)
        if scheme == "neighborhood":
            w2 = jnp.exp(-best_d / (sigma * sigma))
        elif scheme == "geman_mcclure":
            w2 = sigma / (sigma + res * res)
        elif scheme == "square_geman_mcclure":
            w2 = (sigma / (sigma + res * res)) ** 2
        elif scheme == "huber":
            abs_r = jnp.maximum(jnp.abs(res), 1e-4)
            w2 = jnp.where(abs_r < sigma, 1.0,
                           (2.0 * sigma * abs_r - sigma * sigma) / (abs_r * abs_r))
        elif scheme == "cauchy":
            abs_r = jnp.maximum(jnp.abs(res), 1e-4)
            w2 = jnp.log1p((res / sigma) ** 2) / (abs_r * abs_r)
        else:  # least_square / default / exp
            if scheme == "exp":
                w2 = jnp.exp(-(res * res) / (sigma * sigma))
            else:
                w2 = jnp.ones_like(res)
        if scheme not in ("least_square", "default"):
            # The IRLS weight is sqrt(C)/max(|r|, eps) (optimization.py:45-50):
            # residuals below eps get an extra (r/eps)^2 attenuation.
            eps = 1.0e-4
            abs_res = jnp.abs(res)
            w2 = w2 * jnp.where(abs_res < eps, (res / eps) * (res / eps), 1.0)
        w2 = jnp.where(matched, w2, 0.0)

        sums = []
        for a in range(6):  # H upper triangle (21)
            for b in range(a, 6):
                sums.append(jnp.sum(w2 * jrow[a] * jrow[b]))
        for a in range(6):  # g (6)
            sums.append(jnp.sum(w2 * jrow[a] * res))
        sums.append(jnp.sum(w2 * res * res))  # loss
        sums.append(jnp.sum(matched.astype(jnp.float32)))  # match count
        sums.append(jnp.sum(w2))  # weight mass

        # Scatter-free output packing: place sum k at lane k of row 0 via an
        # iota mask (in-kernel .at[].set lowers to an unsupported scatter).
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_PROGRAM, 64), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_PROGRAM, 64), 0)
        out_block = jnp.zeros((ROWS_PER_PROGRAM, 64), jnp.float32)
        for k, value in enumerate(sums):
            out_block = out_block + jnp.where(
                (row_ids == 0) & (lane_ids == k), value, 0.0)
        out_ref[0] = out_block

    return kernel


@functools.partial(jax.jit, static_argnames=("wr", "wc", "max_nd", "scheme",
                                             "sigma", "interpret"))
def window_assoc_gn_pallas(timg: jnp.ndarray, model_xyz: jnp.ndarray,
                           model_normal: jnp.ndarray, model_valid: jnp.ndarray,
                           wr: int, wc: int, max_nd: float,
                           scheme: str, sigma: float,
                           interpret: bool = False):
    """Fused pass: (H, W, 3) target/model images -> (H (6,6), g (6,), loss,
    match count, weight mass).  H rows must divide by 8."""
    from jax.experimental import pallas as pl

    h, w, _ = timg.shape
    assert h % ROWS_PER_PROGRAM == 0

    planes = [timg[..., 0], timg[..., 1], timg[..., 2],
              model_xyz[..., 0], model_xyz[..., 1], model_xyz[..., 2],
              model_normal[..., 0], model_normal[..., 1], model_normal[..., 2],
              model_valid.astype(jnp.float32)]

    kernel = _make_kernel(h, w, wr, wc, max_nd * max_nd, scheme, float(sigma))
    grid = (h // ROWS_PER_PROGRAM,)
    tgt_spec = pl.BlockSpec((ROWS_PER_PROGRAM, w), lambda i: (i, 0))
    full_spec = pl.BlockSpec((h, w), lambda i: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tgt_spec] * 3 + [full_spec] * 7,
        out_specs=pl.BlockSpec((1, ROWS_PER_PROGRAM, 64), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (h // ROWS_PER_PROGRAM, ROWS_PER_PROGRAM, 64), jnp.float32),
        interpret=interpret,
    )(*planes)

    sums = out[:, 0, :].sum(axis=0)  # (64,)
    h_mat = jnp.zeros((6, 6), jnp.float32)
    k = 0
    for a in range(6):
        for b in range(a, 6):
            h_mat = h_mat.at[a, b].set(sums[k])
            h_mat = h_mat.at[b, a].set(sums[k])
            k += 1
    g = sums[21:27]
    loss = sums[27]
    count = sums[28]
    wmass = sums[29]
    return h_mat, g, loss, count, wmass
