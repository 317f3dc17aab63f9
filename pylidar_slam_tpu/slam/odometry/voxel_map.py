"""Incremental voxel-table local map odometry: the throughput+accuracy
champion mode ("voxel_local_map").

Same exact-NN point-to-plane ICP family as the surfel ring map
(surfel_map.py -- the capability match of the reference's kd-tree map,
/root/reference/slam/odometry/local_map.py:244-446), but the map is the
persistent anchor-frame voxel table of ops/voxel_table.py, which removes
the three structural per-frame costs that capped the ring map at ~55
scans/s (per-frame map transform, per-frame NN-grid rebuild, argsort-based
point selection -- see ops/voxel_table.py docstring).

Per frame:
  1. decode the compact upload, scatter-select M targets (frame-salted);
  2. ICP while_loop: transform targets by the anchor<-sensor pose, probe
     the table for exact-in-gate NN, robust point-to-plane GN step
     (held-pair reuse + motion-gated re-search, as the other maps);
  3. insert the same M selected points (keep-old-unless-stale), compute
     k-NN plane-fit normals for the <=M winners only, commit;
  4. re-anchor (transform + re-hash the table) when the pose has drifted
     ``reanchor_dist`` from the anchor -- amortized to ~nothing.

State is a pure pytree; the whole step jits with donated state.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.ops import geometry, optimization, projection, se3
from pylidar_slam_tpu.ops.voxel_table import (VoxelTable, init_table,
                                              scatter_select, table_insert,
                                              table_knn, table_nn,
                                              table_reanchor,
                                              table_set_normals)
from pylidar_slam_tpu.slam.odometry.local_map import LOCAL_MAP, LocalMapConfig


@dataclass
class VoxelTableMapConfig(LocalMapConfig):
    type: str = "voxel_local_map"
    local_map_size: int = 30      # K: staleness window in frames
    map_voxel: float = 0.4        # voxel edge = map resolution (m)
    max_neighbor_dist: float = 0.4  # NN gate; probe block covers it exactly
    table_slots: int = 262144     # power of 2; ~3.7 MB of surfels
    target_samples: int = 8192    # scatter-selected targets (= insert cands)
    num_neighbors_normals: int = 10
    reanchor_dist: float = 50.0   # re-anchor when drifted this far (m)


LOCAL_MAP.register("voxel_local_map", object, VoxelTableMapConfig)


class VoxelMapState(NamedTuple):
    table: VoxelTable
    anchor_t_last: jnp.ndarray  # (4, 4) anchor <- last-registered frame
    frame: jnp.ndarray          # () int32 insert clock


def init_voxel_map(cfg: VoxelTableMapConfig) -> VoxelMapState:
    return VoxelMapState(table=init_table(int(cfg.table_slots)),
                         anchor_t_last=jnp.eye(4, dtype=jnp.float32),
                         frame=jnp.zeros((), jnp.int32))


def make_voxel_icp_frame_step(proj: projection.SphericalProjection,
                              map_cfg: VoxelTableMapConfig,
                              max_num_alignments: int,
                              threshold_delta_pose: float,
                              threshold_trans: float,
                              threshold_rot: float,
                              gn_scheme: str,
                              gn_sigma: float,
                              gn_eps: float = 1.0e-4,
                              upload_quantization: float = 0.0,
                              reassoc_every: int = 1,
                              reassoc_motion_m: float = 0.0):
    """Builds (step, first_frame, batch_step) for the voxel-table odometry.

    Contract identical to surfel_map.make_surfel_icp_frame_step (the host
    wrapper ICPFrameToModel drives both interchangeably)."""
    k_live = int(map_cfg.local_map_size)
    vox = float(map_cfg.map_voxel)
    max_nd = float(map_cfg.max_neighbor_dist)
    m_targets = int(map_cfg.target_samples)
    n_knn = int(map_cfg.num_neighbors_normals)
    reanchor_d = float(map_cfg.reanchor_dist)
    reassoc_every = max(int(reassoc_every or 1), 1)

    def dequant(points, mask):
        """Compact-upload expansion (same codecs as the other map modes)."""
        if points.dtype == jnp.uint8:
            if points.shape[-1] == 6:
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

    def register(state: VoxelMapState, targets: jnp.ndarray,
                 t_valid: jnp.ndarray, q_init: jnp.ndarray):
        """ICP in anchor coordinates: optimizes q = anchor <- sensor."""
        table, frame = state.table, state.frame

        def body(carry):
            q, ref, nrm, q_assoc, _, it, _, _ = carry
            moved = se3.apply_transformation(targets[None], q[None])[0]

            def research(_):
                slot, sq = table_nn(table, moved, frame, k_live, vox, max_nd)
                found = jnp.isfinite(sq)[:, None]
                return (jnp.where(found,
                                  jnp.take(table.points, slot, axis=0), 0.0),
                        jnp.where(found,
                                  jnp.take(table.normals, slot, axis=0), 0.0),
                        sq, q)

            def reuse(_):
                return ref, nrm, jnp.sum((moved - ref) ** 2, axis=-1), q_assoc

            if reassoc_every <= 1 and reassoc_motion_m <= 0.0:
                ref, nrm, sq_d, q_assoc = research(None)
            else:
                do_research = (it % reassoc_every) == 0
                if reassoc_motion_m > 0.0:
                    d_pre = q @ se3.inverse_pose_matrix(q_assoc[None])[0]
                    do_research = do_research | \
                        (se3.pose_motion_magnitude(d_pre) > reassoc_motion_m)
                ref, nrm, sq_d, q_assoc = jax.lax.cond(
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
                res, jac, weights, damping=0.0)

            delta_norm = jnp.linalg.norm(dx)
            apply = (delta_norm >= threshold_delta_pose) & (~singular)
            delta_mat = se3.build_pose_matrix(dx[None])[0]
            new_q = se3.normalize_pose_matrix((delta_mat @ q)[None])[0]
            matches = jnp.sum(ok).astype(jnp.int32)
            q_out = jnp.where(apply, new_q, q)
            return (q_out, ref, nrm, q_assoc, delta_norm, it + 1, loss,
                    matches)

        def cond(carry):
            _, _, _, _, delta_norm, it, _, _ = carry
            return (it < max_num_alignments) & \
                (delta_norm >= threshold_delta_pose)

        n_loc = targets.shape[0]
        init = (q_init,
                jnp.zeros((n_loc, 3), targets.dtype),
                jnp.zeros((n_loc, 3), targets.dtype),
                q_init,
                jnp.array(jnp.inf, targets.dtype),
                jnp.array(0, jnp.int32), jnp.array(0.0, targets.dtype),
                jnp.array(0, jnp.int32))
        q, _, _, _, _, it, loss, matches = jax.lax.while_loop(cond, body,
                                                              init)
        return q, it, loss, matches

    def insert(state: VoxelMapState, sel_anchor: jnp.ndarray,
               sel_valid: jnp.ndarray) -> VoxelTable:
        """Claims slots for the selected anchor-frame points and computes
        k-NN plane-fit normals for the winners (cross-frame surface
        context, the reference's lazy kd-tree normals)."""
        table, won, won_slot = table_insert(
            state.table, sel_anchor, sel_valid, state.frame, k_live, vox)
        slots_k, sq_k = table_knn(table, sel_anchor, state.frame, k_live,
                                  vox, max_nd, n_knn)
        nb = jnp.take(table.points, slots_k, axis=0)
        nrm = geometry.knn_plane_normals(nb, jnp.isfinite(sq_k))
        # A degenerate fit (|n| = 0) stays zero: the ICP validity gate skips
        # those surfels until enough neighbors accumulate.
        return table_set_normals(table, won, won_slot, nrm)

    def step(state: VoxelMapState, delta_since_update: jnp.ndarray,
             points: jnp.ndarray, mask: jnp.ndarray,
             init_rpose: jnp.ndarray):
        points, mask = dequant(points, mask)
        targets, _, t_valid = scatter_select(points, mask, vox, m_targets,
                                             salt=state.frame)

        q_init = state.anchor_t_last @ init_rpose
        q_final, it, loss, matches = register(state, targets, t_valid,
                                              q_init)
        t_final = se3.inverse_pose_matrix(
            state.anchor_t_last[None])[0] @ q_final

        # Insert gating mirrors the reference (icp_odometry.py:360-380):
        # only when the pose moved enough since the last map update.
        new_delta = delta_since_update @ t_final
        d_params = se3.from_pose_matrix(new_delta[None])[0]
        do_insert = (jnp.linalg.norm(d_params[:3]) > threshold_trans) | \
            (jnp.linalg.norm(d_params[3:]) * 180.0 / math.pi > threshold_rot)

        def insert_branch(st):
            sel_anchor = se3.apply_transformation(targets[None],
                                                  q_final[None])[0]
            table = insert(st, sel_anchor, t_valid)
            return st._replace(table=table,
                               anchor_t_last=q_final,
                               frame=st.frame + 1)

        def skip_branch(st):
            return st._replace(anchor_t_last=q_final)

        state = jax.lax.cond(do_insert, insert_branch, skip_branch, state)

        # Re-anchor to the current frame when the pose drifted too far for
        # comfortable f32 coordinates (one table transform + re-hash).
        drift = jnp.linalg.norm(state.anchor_t_last[:3, 3])

        def reanchor(st):
            last_t_anchor = se3.inverse_pose_matrix(
                st.anchor_t_last[None])[0]
            return st._replace(
                table=table_reanchor(st.table, last_t_anchor, vox),
                anchor_t_last=jnp.eye(4, dtype=jnp.float32))

        state = jax.lax.cond(drift > reanchor_d, reanchor, lambda s: s,
                             state)

        delta_out = jnp.where(do_insert, jnp.eye(4, dtype=new_delta.dtype),
                              new_delta)
        pose_params = se3.from_pose_matrix(t_final[None])[0]
        return state, delta_out, t_final, pose_params, (loss, it, matches,
                                                        do_insert)

    def first_frame(state: VoxelMapState, points: jnp.ndarray,
                    mask: jnp.ndarray):
        points, mask = dequant(points, mask)
        sel, _, sel_valid = scatter_select(points, mask, vox, m_targets,
                                           salt=state.frame)
        table = insert(state, sel, sel_valid)
        return state._replace(table=table, frame=state.frame + 1)

    def batch_step(state, delta_since_update, last_rpose,
                   points_batch, masks_batch):
        def scan_body(carry, frame_in):
            st, delta, prev_rpose = carry
            pts, msk = frame_in
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
