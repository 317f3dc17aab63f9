"""Surfel ring local map with EXACT nearest neighbors -- the TPU-native
"kdtree_local_map" (capability match of reference KdTreeLocalMap,
slam/odometry/local_map.py:244-446).

The reference keeps the concatenated clouds of the last K frames in a
pykdtree KDTree rebuilt every frame, with device<->host round-trips every
ICP iteration (local_map.py:372-395).  Here the map is a fixed ring of
K slots x S grid-sampled points per frame (with per-point normals computed
from the scan's vertex map at insert time), re-expressed into the latest
frame every update, and queried with EXACT brute-force 1-NN via the Pallas
streaming-argmin kernel -- entirely on device.

Differences vs the reference, by design:
* map points are grid-sampled to S per frame (the kd-tree held full clouds);
* normals come from the scan's image-space covariance solve at insert time
  instead of lazy k-NN SVD over the accumulated map (same plane-fit family).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.config import MISSING
from pylidar_slam_tpu.ops import geometry, optimization, projection, se3, voxel
from pylidar_slam_tpu.ops.pallas.nn_kernel import nn_argmin
from pylidar_slam_tpu.slam.odometry.local_map import LOCAL_MAP, LocalMapConfig


@dataclass
class SurfelRingMapConfig(LocalMapConfig):
    type: str = "kdtree_local_map"
    local_map_size: int = 20  # K frames kept
    num_neighbors_normals: int = 10  # kept for config parity (unused)
    points_per_frame: int = 4096  # S grid-sampled map points per frame
    sample_voxel_size: float = 0.3  # map-point grid sampling
    target_samples: int = 16384  # grid-sampled ICP targets per frame (M)
    target_voxel_size: float = 0.4  # matches the reference's best config
    max_neighbor_dist: float = 1.0
    normals_kernel_size: int = 5
    # Levenberg regularization of the GN normal equations.  Round-3 finding:
    # the old 1e-3 default SYSTEMATICALLY under-steps along weakly
    # constrained directions and was the dominant surfel accuracy loss
    # (0.283% -> 0.086% tr_err on the 140-frame fixture at damping 0 with
    # the dense map defaults above; the reference's GN has no damping,
    # optimization.py:296-344).  Keep > 0 only for very sparse maps.
    levenberg_damping: float = 0.0
    # NN search backend: "exact" streams every map point past every target
    # (Pallas brute force); "hash" probes a voxel-hash bucket grid -- O(M+V)
    # instead of O(M*V), identical to exact-within-the-gate unless a bucket
    # overflows hash_capacity (ops/hash_nn.py).
    nn_backend: str = "exact"
    hash_buckets: int = 8192  # power of two
    hash_capacity: int = 32  # map points kept per bucket
    hash_voxel: float = 0.0  # bucket edge; 0 -> 2 * max_neighbor_dist
    # Map-point normal estimation at insert time: "image" fits a plane per
    # scan pixel window (compute_normal_map); "knn" fits the
    # num_neighbors_normals nearest points of the ACCUMULATED map (the
    # reference's lazy kd-tree normals, local_map.py:397-422) via the hash
    # grid -- cross-frame surface context instead of single-scan windows.
    # knn is the default: 0.1155% -> 0.0155% tr_err on the 140-frame
    # fixture (CPU trend, champion settings).
    normals_mode: str = "knn"
    # Re-express the map into the current frame when the anchor falls this
    # far behind (meters).  The map lives in the frame of a PAST insert
    # ("anchor") so that non-insert frames touch no map memory and the
    # packed NN grid survives across frames; re-anchoring bounds the
    # anchor-frame coordinates (GN rotation lever arms, f32 hashing).
    reanchor_dist: float = 20.0


LOCAL_MAP.register("kdtree_local_map", object, SurfelRingMapConfig)


class SurfelMapState(NamedTuple):
    """Ring map in the ANCHOR frame (the frame of a past insert).

    Keeping the map fixed in an anchor frame instead of re-expressing every
    point into the current frame each step (the round-4 design) removes the
    two dominant per-frame costs of the surfel path: the K*S-point map
    transform on every non-insert frame and the per-register hash-grid
    build -- the packed grid (table_pts/table_ids, ops/hash_nn.py::
    pack_grid) is built once per insert and carried here, valid for every
    subsequent registration until the map changes.  `anchor_from_cur` maps
    the latest processed frame into the anchor frame; a re-anchor (rare,
    see SurfelRingMapConfig.reanchor_dist) re-expresses the map when the
    trajectory moves too far from the anchor.
    """
    points: jnp.ndarray  # (K * S, 3) in the ANCHOR frame
    normals: jnp.ndarray  # (K * S, 3)
    valid: jnp.ndarray  # (K * S,)
    write_slot: jnp.ndarray  # () int32 ring slot for next insert
    anchor_from_cur: jnp.ndarray  # (4, 4) current frame -> anchor frame
    table_pts: jnp.ndarray  # (n_buckets * cap, 3) packed grid coordinates
    table_ids: jnp.ndarray  # (n_buckets, cap) packed grid point ids


def init_surfel_map(k: int, s: int, dtype=jnp.float32,
                    hash_buckets: int = 0,
                    hash_capacity: int = 0) -> SurfelMapState:
    """hash_buckets/hash_capacity size the carried packed NN grid; pass 0
    for the exact (brute-force) backend, which carries empty tables."""
    nb, cap = int(hash_buckets), int(hash_capacity)
    return SurfelMapState(
        points=jnp.zeros((k * s, 3), dtype),
        normals=jnp.zeros((k * s, 3), dtype),
        valid=jnp.zeros((k * s,), bool),
        write_slot=jnp.zeros((), jnp.int32),
        anchor_from_cur=jnp.eye(4, dtype=dtype),
        table_pts=jnp.zeros((nb * cap, 3), dtype),
        table_ids=jnp.full((nb, max(cap, 0)), -1, jnp.int32))


def _grid_sample_fixed(points: jnp.ndarray, mask: jnp.ndarray,
                       voxel_size: float, capacity: int):
    """Grid-samples to EXACTLY `capacity` slots (valid-marked), jit-safe.

    Picks the first point of each voxel (reference grid_sample semantics).
    When there are more winners than `capacity`, the kept subset is chosen
    by VOXEL-HASH order -- a deterministic pseudo-random spatial subsample.
    (Scan order would keep only the first image rows: an 87%-biased drop at
    S=1024 / 0.6 m on a 64x1024 synthetic scan, measured as the main source
    of the round-1 'kdtree' fragility.)
    """
    keep = voxel.grid_sample_mask(points, voxel_size, mask=mask)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    h = (coords[:, 0] * 73856093) ^ (coords[:, 1] * 19349669) ^ \
        (coords[:, 2] * 83492791)
    h = h.astype(jnp.uint32) >> 1  # non-negative priority
    priority = jnp.where(keep, h, jnp.uint32(0xFFFFFFFF))
    idx = jnp.argsort(priority)[:capacity]
    sel_valid = keep[idx]
    return points[idx], idx, sel_valid


def make_surfel_icp_frame_step(proj: projection.SphericalProjection,
                               map_cfg: SurfelRingMapConfig,
                               max_num_alignments: int,
                               threshold_delta_pose: float,
                               threshold_trans: float,
                               threshold_rot: float,
                               gn_scheme: str,
                               gn_sigma: float,
                               gn_eps: float = 1.0e-4,
                               upload_quantization: float = 0.0,
                               reassoc_every: int = 1,
                               reassoc_motion_m: float = 0.0,
                               shard_mesh=None):
    """Builds the jitted per-frame step for the surfel-ring odometry.

    `shard_mesh`: optional 1-axis ``jax.sharding.Mesh`` ("sp"); the ICP
    target axis is then sharded across its devices with ``shard_map`` --
    each chip searches its target shard against the (replicated) map and
    the 6x6 normal equations psum over ICI (SURVEY.md section 5.8b; wired
    from ``slam.odometry.shard_points``)."""
    k = int(map_cfg.local_map_size)
    s = int(map_cfg.points_per_frame)
    m_targets = int(map_cfg.target_samples)
    max_nd = float(map_cfg.max_neighbor_dist)
    nks = int(map_cfg.normals_kernel_size)
    damping = float(map_cfg.levenberg_damping)
    reassoc_every = max(int(reassoc_every or 1), 1)
    use_hash = str(getattr(map_cfg, "nn_backend", "exact")) == "hash"
    hash_buckets = int(map_cfg.hash_buckets)
    hash_cap = int(map_cfg.hash_capacity)
    hash_voxel = float(map_cfg.hash_voxel) or 2.0 * max_nd
    assert hash_voxel >= 2.0 * max_nd or not use_hash, (
        f"hash_voxel {hash_voxel} < 2 * max_neighbor_dist {2 * max_nd}: the "
        f"2x2x2 probe would miss in-gate neighbors (ops/hash_nn.py)")
    if shard_mesh is not None:
        n_shard = shard_mesh.devices.size
        assert m_targets % n_shard == 0, (
            f"target_samples {m_targets} must divide over {n_shard} devices")

    def dequant(points, mask):
        """Compact-upload expansion (rimg uint8 / packed uint16 / int16) +
        device-side validity of the zero padding (the host never uploads the
        mask -- ICPFrameToModel._compact_upload)."""
        if points.dtype == jnp.uint8:
            if points.shape[-1] == 6:  # rimg12: 4 px/row, mask-sized output
                points, pvalid = projection.decode_rimg12(points, proj)
            else:
                points, pvalid = projection.decode_range_image(points, proj)
            return points, mask & pvalid
        if points.dtype == jnp.uint16:
            points, pvalid = projection.decode_packed_upload(points, proj)
            return points, mask & pvalid
        if points.dtype == jnp.int16:
            points = points.astype(jnp.float32) * upload_quantization
        mask = mask & (jnp.max(jnp.abs(points), axis=-1) > 0)
        return points, mask

    def _build_grid(points, valid):
        """Bucket-grid build + dense packing (ops/hash_nn.py): one V-point
        sort + scatter; the packed rows make each NN probe gather 8
        contiguous bucket rows per query instead of 8*cap scattered point
        rows.  Runs once per INSERT (the map is anchored and static in
        between); the result is carried in the state and reused by every
        registration until the next insert."""
        from pylidar_slam_tpu.ops.hash_nn import build_hash_grid, pack_grid
        return pack_grid(points,
                         build_hash_grid(points, valid, hash_voxel,
                                         hash_buckets, hash_cap), hash_cap)

    def _register_impl(state: SurfelMapState, targets: jnp.ndarray,
                       t_valid: jnp.ndarray, t_init: jnp.ndarray,
                       axis_name=None):
        """Solves ta = anchor_from_new; targets arrive in the NEW frame and
        t_init is the anchor-frame initialization."""
        if use_hash:
            from pylidar_slam_tpu.ops.hash_nn import hash_grid_nn
            slots = (state.table_pts, state.table_ids)

        def body(carry):
            t, ref, nrm, t_assoc, _, it, _, _ = carry
            moved = se3.apply_transformation(targets[None], t[None])[0]

            # Exact-NN re-search every `reassoc_every` iterations; in
            # between, GN steps reuse the held correspondences with
            # distances recomputed at the current pose (the agg map's
            # round-2 trick -- the NN pass dominates the surfel step cost).
            def research(_):
                if use_hash:
                    idx, sq = hash_grid_nn(moved, state.points, slots,
                                           hash_voxel, hash_buckets, hash_cap,
                                           max_nd)
                    # No-candidate queries carry sq=inf; zero their normals
                    # so held-pair reuse can never resurrect them through
                    # the distance gate.
                    found = jnp.isfinite(sq)[:, None]
                    return (jnp.where(found, jnp.take(state.points, idx,
                                                      axis=0), 0.0),
                            jnp.where(found, jnp.take(state.normals, idx,
                                                      axis=0), 0.0), sq, t)
                idx, sq = nn_argmin(moved, state.points, state.valid)
                return (jnp.take(state.points, idx, axis=0),
                        jnp.take(state.normals, idx, axis=0), sq, t)

            def reuse(_):
                return ref, nrm, jnp.sum((moved - ref) ** 2, axis=-1), t_assoc

            if reassoc_every <= 1 and reassoc_motion_m <= 0.0:
                ref, nrm, sq_d, t_assoc = research(None)
            else:
                do_research = (it % reassoc_every) == 0
                if reassoc_motion_m > 0.0:
                    # Motion gate: correspondences go stale with the pose --
                    # re-search when the delta since the last NN pass
                    # exceeds the threshold (see aggregated_map).
                    d_pre = t @ se3.inverse_pose_matrix(t_assoc[None])[0]
                    do_research = do_research | \
                        (se3.pose_motion_magnitude(d_pre) > reassoc_motion_m)
                ref, nrm, sq_d, t_assoc = jax.lax.cond(
                    do_research, research, reuse, None)
            ok = t_valid & (sq_d < max_nd * max_nd) & \
                (jnp.max(jnp.abs(nrm), axis=-1) > 0)

            res_fun = lambda p: optimization.point_to_plane_residuals(
                p, moved, ref, nrm, ok)
            jac_fun = lambda p: optimization.point_to_plane_jacobian(
                p, moved, nrm, ok)
            res = res_fun(jnp.zeros(6, targets.dtype))
            jac = jac_fun(jnp.zeros(6, targets.dtype))
            weights = optimization.robust_weights(gn_scheme, res, gn_sigma,
                                                  sq_dists=sq_d, eps=gn_eps)
            weights = jnp.where(ok, weights, 0.0)
            dx, loss, singular = optimization.gauss_newton_step(
                res, jac, weights, damping=damping, axis_name=axis_name)

            delta_norm = jnp.linalg.norm(dx)
            apply = (delta_norm >= threshold_delta_pose) & (~singular)
            delta_mat = se3.build_pose_matrix(dx[None])[0]
            new_t = se3.normalize_pose_matrix((delta_mat @ t)[None])[0]
            matches = jnp.sum(ok).astype(jnp.int32)
            if axis_name is not None:
                matches = jax.lax.psum(matches, axis_name)
            t_out = jnp.where(apply, new_t, t)
            return (t_out, ref, nrm, t_assoc, delta_norm, it + 1, loss,
                    matches)

        def cond(carry):
            _, _, _, _, delta_norm, it, _, _ = carry
            return (it < max_num_alignments) & (delta_norm >= threshold_delta_pose)

        n_loc = targets.shape[0]
        init = (t_init,
                jnp.zeros((n_loc, 3), targets.dtype),
                jnp.zeros((n_loc, 3), targets.dtype),
                t_init,
                jnp.array(jnp.inf, targets.dtype),
                jnp.array(0, jnp.int32), jnp.array(0.0, targets.dtype),
                jnp.array(0, jnp.int32))
        t, _, _, _, _, it, loss, matches = \
            jax.lax.while_loop(cond, body, init)
        return t, it, loss, matches

    if shard_mesh is None:
        register = _register_impl
    else:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        axis = shard_mesh.axis_names[0]

        def _register_sharded(state, targets, t_valid, t_init):
            # Map state + pose replicated, targets sharded; every shard
            # computes the identical replicated pose from the psum-ed normal
            # equations, so the whole while_loop runs inside shard_map with
            # one tiny collective per iteration.
            return _register_impl(state, targets, t_valid, t_init,
                                  axis_name=axis)

        register = shard_map(
            _register_sharded, mesh=shard_mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_rep=False)

    def insert(state: SurfelMapState, points: jnp.ndarray, mask: jnp.ndarray,
               ta: jnp.ndarray) -> SurfelMapState:
        """Writes the new frame's S grid-sampled surfels into the ring slot,
        expressed in the ANCHOR frame (`ta` = anchor_from_new).  The rest of
        the map is untouched -- no K*S-point transform -- and the packed NN
        grid is rebuilt once here (dynamic-slice ring write, no scatter)."""
        # Scan surfels: grid-sample winner pixels of the rasterized scan
        # (both in the scan's own frame).
        idx_img, hit = _rasterize_idx(points, mask)
        vmap = jnp.where(hit[:, None], jnp.take(points, idx_img, axis=0),
                        0.0).reshape(proj.height, proj.width, 3)
        vpix = vmap.reshape(-1, 3)
        pix_valid = jnp.max(jnp.abs(vpix), axis=-1) > 0
        sel_pts, sel_idx, sel_valid = _grid_sample_fixed(
            vpix, pix_valid, float(map_cfg.sample_voxel_size), s)
        sel_a = se3.apply_transformation(sel_pts[None], ta[None])[0]
        sel_a = jnp.where(sel_valid[:, None], sel_a, 0.0)

        slot = state.write_slot
        start = slot * s
        zero = jnp.zeros((), start.dtype)
        new_points = jax.lax.dynamic_update_slice(state.points, sel_a,
                                                  (start, zero))
        pre_valid = jax.lax.dynamic_update_slice(state.valid, sel_valid,
                                                 (start,))

        grid = _build_grid(new_points, pre_valid) if use_hash else None
        if str(map_cfg.normals_mode) == "knn":
            # Cross-frame normals: plane fit over the num_neighbors_normals
            # nearest points of the accumulated map (incl. the new frame,
            # written above) -- the reference's lazy kd-tree normals.  The
            # grid is built before the normal-validity gate below, so a
            # normal-degenerate new point can shadow a slightly farther
            # valid candidate in later NN probes; registration rejects such
            # pairs through its |normal| > 0 gate.
            from pylidar_slam_tpu.ops.hash_nn import hash_grid_knn
            knn_grid = grid if use_hash \
                else _build_grid(new_points, pre_valid)
            idxk, sqk = hash_grid_knn(
                sel_a, new_points, knn_grid, hash_voxel, hash_buckets,
                hash_cap, max_nd, int(map_cfg.num_neighbors_normals))
            nb = jnp.take(new_points, idxk, axis=0)
            sel_nrm = geometry.knn_plane_normals(nb, jnp.isfinite(sqk))
        else:
            nmap = geometry.compute_normal_map(vmap, nks)
            sel_nrm = jnp.take(nmap.reshape(-1, 3), sel_idx, axis=0)
            sel_nrm = se3.apply_rotation(sel_nrm[None], ta[None])[0]
        sel_valid = sel_valid & (jnp.max(jnp.abs(sel_nrm), axis=-1) > 0)

        new_normals = jax.lax.dynamic_update_slice(state.normals, sel_nrm,
                                                   (start, zero))
        new_valid = jax.lax.dynamic_update_slice(state.valid, sel_valid, (start,))
        state = state._replace(points=new_points, normals=new_normals,
                               valid=new_valid, write_slot=(slot + 1) % k,
                               anchor_from_cur=ta)
        if use_hash:
            state = state._replace(table_pts=grid[0], table_ids=grid[1])
        return state

    def _rasterize_idx(points, mask):
        from pylidar_slam_tpu.slam.odometry.aggregated_map import rasterize_encoded
        return rasterize_encoded(points, proj, mask)

    def step(state: SurfelMapState, delta_since_update: jnp.ndarray,
             points: jnp.ndarray, mask: jnp.ndarray, init_rpose: jnp.ndarray):
        points, mask = dequant(points, mask)
        targets, _, t_valid = _grid_sample_fixed(
            points, mask, float(map_cfg.target_voxel_size), m_targets)

        # Registration runs in the anchor frame; init/result convert
        # through anchor_from_cur (cur = the previous frame).
        ta_init = state.anchor_from_cur @ init_rpose
        ta, it, loss, matches = register(state, targets, t_valid, ta_init)
        inv_anchor = se3.inverse_pose_matrix(state.anchor_from_cur[None])[0]
        t_final = se3.normalize_pose_matrix((inv_anchor @ ta)[None])[0]

        new_delta = delta_since_update @ t_final
        d_params = se3.from_pose_matrix(new_delta[None])[0]
        do_insert = (jnp.linalg.norm(d_params[:3]) > threshold_trans) | \
            (jnp.linalg.norm(d_params[3:]) * 180.0 / math.pi > threshold_rot)

        def insert_branch(st):
            return insert(st, points, mask, ta)

        def shift_branch(st):
            # Non-insert frames touch NO map memory: the anchor design's
            # whole point (the round-4 code re-expressed all K*S points +
            # normals here every frame).
            return st._replace(anchor_from_cur=ta)

        state = jax.lax.cond(do_insert, insert_branch, shift_branch, state)

        def reanchor_branch(st):
            inv_a = se3.inverse_pose_matrix(st.anchor_from_cur[None])[0]
            pts = se3.apply_transformation(st.points[None], inv_a[None])[0]
            pts = jnp.where(st.valid[:, None], pts, 0.0)
            nrm = se3.apply_rotation(st.normals[None], inv_a[None])[0]
            st = st._replace(points=pts, normals=nrm,
                             anchor_from_cur=jnp.eye(4, dtype=pts.dtype))
            if use_hash:
                tp, ti = _build_grid(pts, st.valid)
                st = st._replace(table_pts=tp, table_ids=ti)
            return st

        far = jnp.linalg.norm(state.anchor_from_cur[:3, 3]) > \
            float(getattr(map_cfg, "reanchor_dist", 20.0))
        state = jax.lax.cond(far, reanchor_branch, lambda st: st, state)

        delta_out = jnp.where(do_insert, jnp.eye(4, dtype=new_delta.dtype),
                              new_delta)
        pose_params = se3.from_pose_matrix(t_final[None])[0]
        return state, delta_out, t_final, pose_params, (loss, it, matches,
                                                        do_insert)

    def first_frame(state: SurfelMapState, points: jnp.ndarray,
                    mask: jnp.ndarray):
        points, mask = dequant(points, mask)
        return insert(state, points, mask, jnp.eye(4, dtype=jnp.float32))

    def batch_step(state, delta_since_update, last_rpose,
                   points_batch, masks_batch):
        def scan_body(carry, frame):
            st, delta, prev_rpose = carry
            pts, msk = frame
            st, delta, rpose, params, diag = step(st, delta, pts, msk,
                                                  prev_rpose)
            return (st, delta, rpose), (params, diag)

        (state, delta, rpose), (params, diags) = jax.lax.scan(
            scan_body, (state, delta_since_update, last_rpose),
            (points_batch, masks_batch))
        return state, delta, rpose, params, diags

    return (jax.jit(step, donate_argnums=(0,)),
            jax.jit(first_frame, donate_argnums=(0,)),
            jax.jit(batch_step, donate_argnums=(0,)))
