"""Frame-to-Model ICP odometry, fused into a single jitted device step.

This is the flagship odometry (capability match of reference
slam/odometry/icp_odometry.py) re-designed TPU-first:

* The whole per-frame pipeline -- vertex-map rasterization, the ICP outer
  loop (transform -> projective association -> robust point-to-plane
  Gauss-Newton -> manifold renormalization), the map-insertion decision, and
  the local-map update/model rebuild -- is ONE ``jax.jit`` computation with a
  ``lax.while_loop`` for ICP convergence.  No host round-trips inside the
  loop (the reference's kd-tree map crosses device<->host every iteration,
  local_map.py:372-395; here everything stays in HBM/VMEM).
* Point clouds are padded to a static size; per-frame work is fully
  shape-stable, so the step compiles exactly once per sequence config.
* The host wrapper preserves the reference's ``data_dict`` key contract
  (``init_rpose`` in, ``odometry_pose``/``odometry_pc`` out).
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylidar_slam_tpu.config import MISSING, dataclass_from_dict
from pylidar_slam_tpu.ops import geometry, optimization, projection, se3
from pylidar_slam_tpu.slam.odometry import ODOMETRY
from pylidar_slam_tpu.slam.odometry import local_map as lm
from pylidar_slam_tpu.utils import assert_debug


# ----------------------------------------------------------------------------
# Configs (same group layout / field names as the reference)
# ----------------------------------------------------------------------------

@dataclass
class OdometryConfig:
    algorithm: str = MISSING


@dataclass
class GaussNewtonConfig:
    max_iters: int = 1
    norm_stop_criterion: float = 1.0e-3
    scheme: str = "geman_mcclure"
    sigma: float = 0.3
    eps: float = 1.0e-4
    # Robust-kernel annealing: start the first ICP iteration at
    # `sigma_start` and shrink geometrically to `sigma` over
    # `sigma_anneal_iters` iterations (0/0 disables).  Narrow-basin
    # kernels (geman_mcclure) lose tracking when the initialization
    # error exceeds the kernel scale (large inter-frame motion, sharp
    # turns); a wide kernel on early iterations restores the capture
    # basin while keeping the narrow kernel's precision at convergence.
    # Consumed by the aggregated-map ICP loop (aggregated_map.py);
    # the projective/kdtree paths use the constant `sigma`.
    sigma_start: float = 0.0
    sigma_anneal_iters: int = 0
    # CT-ICP solver option surface (TPU-native equivalents of the pyct_icp
    # CTICPOptions the reference reflects, ct_icp_odometry.py:57-160).
    # Consumed by the aggregated-map ICP loop; 0 disables each.
    #
    # Correspondence gate on the POINT-TO-PLANE residual (meters): pyct_icp's
    # max_dist_to_plane_ct_icp.  Tighter than the 3D neighbor gate
    # (max_neighbor_dist): a neighbor can be close in 3D yet far from its
    # tangent plane (grazing surfaces, unstable normals) -- exactly the
    # correspondences that bias the plane solve.
    max_dist_to_plane: float = 0.0
    # Soft pose priors added to the 6x6 normal equations each iteration
    # (beta * n_matches * ||deviation + dx||^2, scale-free in point count).
    # Our elastic warp ties the scan-begin pose to the previous scan's end
    # STRUCTURALLY (pyct_icp enforces that with beta_location_consistency on
    # its separate begin-pose unknown), so here location consistency is the
    # translation block of the prior pull and orientation consistency the
    # rotation block; constant velocity pulls the full 6-DoF motion toward
    # the constant-velocity prior and small velocity toward zero motion.
    beta_location_consistency: float = 0.0
    beta_constant_velocity: float = 0.0
    beta_small_velocity: float = 0.0
    beta_orientation_consistency: float = 0.0


@dataclass
class RigidAlignmentConfig:
    mode: str = "point_to_plane_gauss_newton"
    pose: str = "euler"
    scheme: str = "huber"
    gauss_newton_config: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ICPFrameToModelConfig(OdometryConfig):
    """Point-to-plane frame-to-model ICP configuration.

    Field names/defaults mirror reference icp_odometry.py:30-64 so existing
    command lines compose unchanged."""
    algorithm: str = "icp_F2M"
    device: str = "tpu"
    pose: str = "euler"
    max_num_alignments: int = 100  # yaml default overrides to 10

    local_map: Any = None
    alignment: Any = None

    threshold_delta_pose: float = 1.0e-4
    threshold_trans: float = 0.1
    threshold_rot: float = 0.3
    sigma: float = 0.1

    data_key: str = "vertex_map"
    viz_debug: bool = False

    # EI (elevation-image) bootstrap of the FIRST motion estimate: before
    # frame 1 registers, align frame 1 to frame 0 with the BEV
    # phase-correlation registration (ops/bev.py) and use the result as the
    # ICP init pose.  ICP's convergence basin is bounded by the
    # correspondence gate (max_neighbor_dist / window span), and the
    # constant-velocity prior is IDENTITY at frame 1 -- so inter-frame
    # motion beyond the gate at sequence start loses tracking irrecoverably:
    # the stuck pose feeds back through the CV prior forever (measured:
    # surfel map at 2 m/frame never locks, ~100% tr_err; one good frame-1
    # prior restores mm-level tracking).  Capability match of the
    # reference's EI initialization (reference initialization.py:156-234),
    # applied where TPU ICP actually needs it: one extra registration per
    # sequence.  Skipped when the caller supplies a non-identity init
    # (e.g. PoseNet/NI initialization).
    ei_bootstrap: bool = True
    ei_bootstrap_size: int = 128  # BEV image side (pixels)
    ei_bootstrap_pixel: float = 0.5  # meters/pixel: +-32 m capture basin
    ei_bootstrap_yaw_steps: int = 64
    ei_bootstrap_yaw_range: float = 1.0472  # +-60 deg sweep
    # Phase-correlation acceptance threshold: on structure-poor first frames
    # ground suppression can leave a near-empty BEV whose noise peak lands
    # inside the translation clamp; a sub-threshold score keeps the safe
    # identity prior instead (matches EIConfig.min_score's role).
    ei_bootstrap_min_score: float = 0.05

    # Continuous-time pose surface (elastic/CT-ICP mode only; reference
    # ct_icp_odometry.py:173, 326-336): which per-frame pose the odometry
    # reports.  The elastic warp models scan k's sweep motion as the
    # frame-to-frame motion rpose_k (constant velocity within the scan), so
    # begin/mid/end poses are begin_k, begin_k @ rpose_k^0.5 and
    # begin_k @ rpose_k -- derived on host from the float64 pose ledger.
    # Empty/"begin_pose" keeps the scan-start pose (the rigid-mode output).
    pose_type: str = ""

    # TPU-specific: static padded point capacity for raw point-cloud inputs.
    num_points_padded: int = 131072
    # Aggregated-map mode: re-rasterize the target every N ICP iterations.
    reassoc_every: int = 3
    # Motion-gated reassociation (aggregated map): ADDITIONALLY re-rasterize
    # whenever the pose has moved more than this many meters (translation +
    # rotation at a 15 m lever arm) since the last association.  Lets
    # reassoc_every stretch to the iteration count at cruise (holding
    # correspondences measures MORE accurate on the fixture) while staying
    # robust under large per-frame motion, where staleness is what hurts.
    # 0 disables the gate (periodic-only, the historical behavior).
    reassoc_motion_m: float = 0.0
    # Host->device upload quantization step in meters (0 disables -- the
    # default: int16 quantization measurably costs ~0.3pt tr_err on synthetic
    # despite being below sensor noise; enable for upload-bandwidth-bound
    # deployments).
    upload_quantization: float = 0.0
    # Dithered quantization: adds uniform(-q/2, q/2) noise before rounding.
    # Measured NOT to recover the quantization accuracy loss (sweep 4) --
    # kept as an option, default off.
    upload_dither: bool = False
    # Upload encoding: "f32" (12 B/point xyz), "packed" (8 B/point: uint16
    # pixel id + 2 mm range steps + f16 angular deltas -- <= 1 mm
    # reconstruction error, 1.5x fewer tunnel bytes), or "rimg" (3 B/PIXEL
    # fixed-shape z-buffered range image with 4+4-bit sub-pixel offsets:
    # 196 KB/frame at 64x1024 at FULL scan density, shape-static, ~2.3 cm
    # max reconstruction error), or "rimg16" (4 B/pixel, 8+8-bit sub-pixel:
    # ~2 mm max error at full density -- the accuracy-preserving
    # fixed-shape format), or "rimg8" (2 B/pixel ranges + per-row/per-col
    # 8-bit mean angular offset planes, 131 KB/frame at 64x1024: exact on
    # regular firing patterns, drops per-pixel azimuth jitter on real
    # sensors).  "rimg12" packs FOUR pixels' 12-bit range steps (3 cm,
    # +-1.5 cm rounding) per 6-byte row + the rimg8 planes: 98 KB/frame at
    # 64x1024, the fewest-bytes format for the H2D-bound tunnel path.
    # packed needs H*W <= 65536; rimg/rimg16 need num_points_padded >= H*W
    # (rimg8: + (H+W)/2 plane rows; rimg12: num_points_padded must equal
    # 4 x the encoded row count -- the buffer IS its full static shape).
    # All apply to aggregated/kdtree modes.
    upload_format: str = "f32"
    # Aggregated-map mode: frames per device execution (lax.scan).  B > 1
    # amortizes dispatch overhead; constant-velocity priors then chain on
    # device and per-frame `odometry_pose` outputs are unavailable (use
    # batch_size=1 when loop closure / backend consume per-frame poses).
    batch_size: int = 1
    # kdtree (surfel) mode: shard the ICP target axis over this many devices
    # (jax.sharding.Mesh + shard_map; each chip searches its target shard
    # against the replicated map and the 6x6 normal equations psum over ICI
    # -- SURVEY.md section 5.8b).  0/1 = single device.
    shard_points: int = 0
    # Batched mode: issue each batch's stacked host->device transfer from a
    # dedicated uploader thread and dispatch its compute one flush later, so
    # the upload of batch k+1 overlaps the device execution of batch k
    # (upload ~4.5 ms/frame and device ~5 ms/frame are the two comparable
    # legs of the measured pipeline; serializing them is the throughput
    # wall).  Costs one extra batch of result latency.
    async_upload: bool = True
    # Batched mode: completed pose flushes kept IN FLIGHT before
    # drain_batch_results hands them to downstream consumers (loop closure /
    # backend), i.e. downstream runs batch_size x this many frames behind
    # the odometry.  Larger values hide the ~200 ms tunneled host fetch
    # behind a busier queue; smaller values tighten loop-closure latency
    # (relevant when `min_id_distance`-scale revisits are close to the lag).
    batch_results_lag: int = 4


class ICPStepResult(NamedTuple):
    pose_params: jnp.ndarray  # (6,)
    pose_matrix: jnp.ndarray  # (4, 4)
    loss: jnp.ndarray  # () final weighted residual loss
    num_iters: jnp.ndarray  # () int32 ICP iterations executed
    num_matches: jnp.ndarray  # () int32 valid correspondences in last iter
    inserted: jnp.ndarray  # () bool - frame inserted into the map


def make_icp_frame_step(proj: projection.SphericalProjection,
                        max_num_alignments: int,
                        threshold_delta_pose: float,
                        threshold_trans: float,
                        threshold_rot: float,
                        gn: GaussNewtonConfig,
                        normals_kernel_size: int = 5):
    """Builds the fused (jitted) per-frame ICP step.

    Returns ``step(map_state, delta_since_update, vmap, init_pose)`` ->
    ``(map_state', delta_since_update', ICPStepResult)``.
    """

    def register(map_state: lm.ProjectiveMapState, vmap: jnp.ndarray,
                 init_pose: jnp.ndarray):
        """The ICP outer loop (reference register_new_frame, 248-299)."""
        tgt_pts = vmap.reshape(-1, 3)
        tgt_valid = jnp.max(jnp.abs(tgt_pts), axis=-1) > 0

        def body(carry):
            pose_mat, _, it, _, _, _ = carry
            pts = se3.apply_transformation(tgt_pts[None], pose_mat[None])[0]
            tvmap = projection.build_vertex_map(pts, proj, mask=tgt_valid)

            nbrs, nrms = lm.nearest_neighbors(map_state, tvmap)
            t = tvmap.reshape(-1, 3)
            r = nbrs.reshape(-1, 3)
            n = nrms.reshape(-1, 3)
            mask = (jnp.max(jnp.abs(t), axis=-1) > 0) & \
                   (jnp.max(jnp.abs(r), axis=-1) > 0) & \
                   (jnp.max(jnp.abs(n), axis=-1) > 0)
            sq_dists = jnp.sum((t - r) ** 2, axis=-1)

            # Robust GN on the correspondences, starting from zero params
            # (one step by default -- reference alignment gauss_newton_config)
            res_fun = lambda p: optimization.point_to_plane_residuals(p, t, r, n, mask)
            jac_fun = lambda p: optimization.point_to_plane_jacobian(p, t, n, mask)
            result = optimization.gauss_newton(
                jnp.zeros(6, tgt_pts.dtype), res_fun, jac_fun,
                max_iters=gn.max_iters, norm_stop_criterion=gn.norm_stop_criterion,
                scheme=gn.scheme, sigma=gn.sigma, sq_dists=sq_dists, eps=gn.eps)

            delta_norm = jnp.linalg.norm(result.params)
            # The reference breaks BEFORE composing a sub-threshold delta
            # (icp_odometry.py:292-297).
            apply = (delta_norm >= threshold_delta_pose) & (~result.singular)
            delta_mat = se3.build_pose_matrix(result.params[None])[0]
            new_pose = se3.normalize_pose_matrix((delta_mat @ pose_mat)[None])[0]
            pose_out = jnp.where(apply, new_pose, pose_mat)
            return (pose_out, delta_norm, it + 1, result.loss,
                    jnp.sum(mask).astype(jnp.int32), result.singular)

        def cond(carry):
            _, delta_norm, it, _, _, singular = carry
            return (it < max_num_alignments) & \
                   (delta_norm >= threshold_delta_pose) & (~singular)

        init = (init_pose, jnp.array(jnp.inf, vmap.dtype),
                jnp.array(0, jnp.int32), jnp.array(0.0, vmap.dtype),
                jnp.array(0, jnp.int32), jnp.array(False))
        pose_mat, _, it, loss, matches, _ = jax.lax.while_loop(cond, body, init)
        pose_params = se3.from_pose_matrix(pose_mat[None])[0]
        return pose_params, pose_mat, loss, it, matches

    def step(map_state: lm.ProjectiveMapState,
             delta_since_update: jnp.ndarray,
             vmap: jnp.ndarray,
             init_pose: jnp.ndarray):
        pose_params, pose_mat, loss, it, matches = register(
            map_state, vmap, init_pose)

        # Map insertion decision (reference __update_map, 360-380): insert when
        # the motion since the last inserted frame exceeds the thresholds.
        new_delta = delta_since_update @ pose_mat
        d_params = se3.from_pose_matrix(new_delta[None])[0]
        insert = (jnp.linalg.norm(d_params[:3]) > threshold_trans) | \
                 (jnp.linalg.norm(d_params[3:]) * 180.0 / math.pi > threshold_rot)

        map_state = lm.update_projective_map(
            map_state, pose_mat, vmap, proj, insert,
            normals_kernel_size=normals_kernel_size)
        delta_out = jnp.where(insert, jnp.eye(4, dtype=new_delta.dtype), new_delta)
        return map_state, delta_out, ICPStepResult(
            pose_params, pose_mat, loss, it, matches, insert)

    def first_frame(map_state: lm.ProjectiveMapState, vmap: jnp.ndarray):
        """Initializes the map with the first frame (reference 171-181)."""
        eye = jnp.eye(4, dtype=vmap.dtype)
        return lm.update_projective_map(
            map_state, eye, vmap, proj, jnp.array(True),
            normals_kernel_size=normals_kernel_size)

    def build_vmap_from_points(points: jnp.ndarray, mask: jnp.ndarray):
        return projection.build_vertex_map(points, proj, mask=mask)

    return (jax.jit(step, donate_argnums=(0,)),
            jax.jit(first_frame, donate_argnums=(0,)),
            jax.jit(build_vmap_from_points))


# ----------------------------------------------------------------------------
# Host-side odometry module (data_dict protocol)
# ----------------------------------------------------------------------------

class ICPFrameToModel:
    """Host wrapper driving the fused device step with the reference's
    ``data_dict`` key contract.

    Accepted inputs under ``config.data_key`` (reference _read_input, 319-358):
    an (N, 3) numpy point cloud (padded + rasterized on device), an
    (H, W, 3) / (3, H, W) vertex map array, or a jnp array of the same.
    """

    def __init__(self, config: ICPFrameToModelConfig,
                 projector: projection.SphericalProjection = None,
                 **kwargs):
        if not isinstance(config, ICPFrameToModelConfig):
            config = dataclass_from_dict(ICPFrameToModelConfig, config)
        self.config = config
        assert_debug(projector is not None, "ICP odometry requires a projector")
        self.projector = projector

        lm_dict = config.local_map if isinstance(config.local_map, dict) else {}
        self._mode = lm_dict.get("type", "projective_local_map")
        known_modes = ("projective_local_map", "aggregated_local_map",
                       "kdtree_local_map", "voxel_local_map")
        assert_debug(self._mode in known_modes,
                     f"Unknown local_map type '{self._mode}'. "
                     f"Known: {list(known_modes)}")
        align_cfg = config.alignment if isinstance(config.alignment, dict) else {}
        gn_cfg = dataclass_from_dict(
            GaussNewtonConfig, align_cfg.get("gauss_newton_config", {}))
        self._elastic = bool(align_cfg.get("elastic", False))

        fmt = str(config.upload_format or "f32")
        assert_debug(
            fmt == "f32" or self._mode != "projective_local_map",
            f"upload_format='{fmt}' has no effect with "
            f"local_map.type=projective_local_map (it consumes vertex maps, "
            f"not host point uploads) -- use the aggregated or kdtree map, "
            f"or drop the override")

        if self._mode == "voxel_local_map":
            from pylidar_slam_tpu.slam.odometry import voxel_map as vm
            vox_cfg = dataclass_from_dict(vm.VoxelTableMapConfig, lm_dict)
            self.local_map_size = int(vox_cfg.local_map_size)
            self._vox_cfg = vox_cfg
            self._step, self._first, self._batch_step = \
                vm.make_voxel_icp_frame_step(
                    proj=projector,
                    map_cfg=vox_cfg,
                    reassoc_every=int(getattr(config, "reassoc_every", 1) or 1),
                    reassoc_motion_m=float(
                        getattr(config, "reassoc_motion_m", 0.0) or 0.0),
                    max_num_alignments=int(config.max_num_alignments),
                    threshold_delta_pose=float(config.threshold_delta_pose),
                    threshold_trans=float(config.threshold_trans),
                    threshold_rot=float(config.threshold_rot),
                    gn_scheme=gn_cfg.scheme,
                    gn_sigma=float(gn_cfg.sigma),
                    gn_eps=float(gn_cfg.eps),
                    upload_quantization=float(config.upload_quantization or 0.0),
                )
            self._build_vmap = None
        elif self._mode == "kdtree_local_map":
            from pylidar_slam_tpu.slam.odometry import surfel_map as sm
            surfel_cfg = dataclass_from_dict(sm.SurfelRingMapConfig, lm_dict)
            self.local_map_size = int(surfel_cfg.local_map_size)
            self._surfel_cfg = surfel_cfg
            shard_mesh = None
            n_shard = int(getattr(config, "shard_points", 0) or 0)
            if n_shard > 1:
                from jax.sharding import Mesh
                devices = jax.devices()
                assert_debug(
                    len(devices) >= n_shard,
                    f"shard_points={n_shard} but only {len(devices)} "
                    f"device(s) visible")
                shard_mesh = Mesh(
                    np.array(devices[:n_shard]), ("sp",))
            self._step, self._first, self._batch_step = \
                sm.make_surfel_icp_frame_step(
                    shard_mesh=shard_mesh,
                    proj=projector,
                    map_cfg=surfel_cfg,
                    reassoc_every=int(getattr(config, "reassoc_every", 1) or 1),
                    reassoc_motion_m=float(
                        getattr(config, "reassoc_motion_m", 0.0) or 0.0),
                    max_num_alignments=int(config.max_num_alignments),
                    threshold_delta_pose=float(config.threshold_delta_pose),
                    threshold_trans=float(config.threshold_trans),
                    threshold_rot=float(config.threshold_rot),
                    gn_scheme=gn_cfg.scheme,
                    gn_sigma=float(gn_cfg.sigma),
                    gn_eps=float(gn_cfg.eps),
                    upload_quantization=float(config.upload_quantization or 0.0),
                )
            self._build_vmap = None
        elif self._mode == "aggregated_local_map":
            from pylidar_slam_tpu.slam.odometry import aggregated_map as am
            agg_cfg = dataclass_from_dict(am.AggregatedLocalMapConfig, lm_dict)
            self.local_map_size = int(agg_cfg.local_map_size)
            self._agg_cfg = agg_cfg
            self._step, self._first, self._batch_step = am.make_agg_icp_frame_step(
                proj=projector,
                map_cfg=agg_cfg,
                max_num_alignments=int(config.max_num_alignments),
                reassoc_every=int(getattr(config, "reassoc_every", 3) or 3),
                reassoc_motion_m=float(
                    getattr(config, "reassoc_motion_m", 0.0) or 0.0),
                threshold_delta_pose=float(config.threshold_delta_pose),
                threshold_trans=float(config.threshold_trans),
                threshold_rot=float(config.threshold_rot),
                gn_scheme=gn_cfg.scheme,
                gn_sigma=float(gn_cfg.sigma),
                gn_eps=float(gn_cfg.eps),
                gn_sigma_start=float(gn_cfg.sigma_start or 0.0),
                gn_sigma_anneal_iters=int(gn_cfg.sigma_anneal_iters or 0),
                max_dist_to_plane=float(gn_cfg.max_dist_to_plane or 0.0),
                beta_location_consistency=float(
                    gn_cfg.beta_location_consistency or 0.0),
                beta_constant_velocity=float(
                    gn_cfg.beta_constant_velocity or 0.0),
                beta_small_velocity=float(gn_cfg.beta_small_velocity or 0.0),
                beta_orientation_consistency=float(
                    gn_cfg.beta_orientation_consistency or 0.0),
                upload_quantization=float(config.upload_quantization or 0.0),
                deskew=bool(align_cfg.get("deskew", False)),
                elastic=bool(align_cfg.get("elastic", False)),
                alignment_mode=str(align_cfg.get(
                    "mode", "point_to_plane_gauss_newton")),
            )
            self._build_vmap = None
        else:
            lm_cfg = dataclass_from_dict(lm.ProjectiveLocalMapConfig, lm_dict)
            self.local_map_size = int(lm_cfg.local_map_size)
            self._step, self._first, self._build_vmap = make_icp_frame_step(
                proj=projector,
                max_num_alignments=int(config.max_num_alignments),
                threshold_delta_pose=float(config.threshold_delta_pose),
                threshold_trans=float(config.threshold_trans),
                threshold_rot=float(config.threshold_rot),
                gn=gn_cfg,
                normals_kernel_size=int(lm_cfg.normals_kernel_size),
            )

        self._map_state = None
        self._delta_since_update: Optional[jnp.ndarray] = None
        self._frame_buffer: list = []  # batched mode: buffered (points, mask)
        # Batched mode: when True, every flush fetches the (B, 6) params to
        # the host (ONE transfer per batch) and queues per-frame float64
        # relative poses for SLAM to feed loop closure / backend / init.
        self.emit_batch_poses: bool = False
        self._pending_rposes: list = []
        self._pending_param_fetches: list = []
        # Async-upload pipeline: the future of the batch whose H2D transfer
        # is in flight but whose compute has not been dispatched yet.
        self._upload_pool = None
        self._inflight_upload = None
        # Pose-fetch pool: the (B, 6) params transfer of each flush costs a
        # full tunnel round-trip (~26 ms) even when the data is long since
        # computed; a dedicated thread eats that latency off the pipeline
        # thread and drain_batch_results just collects finished futures.
        self._fetch_pool = None
        # Pipeline-phase telemetry (negligible cost: two perf_counter calls
        # per flush): where the batched pipeline thread actually blocks.
        self.pipe_stats = {"upload_wait_s": 0.0, "dispatch_s": 0.0,
                           "flushes": 0}
        self._device_pad_cache: dict = {}
        self._ones_mask_arr: Optional[jnp.ndarray] = None
        # Device-side pose log: one (6,) params array per frame.  Fetched in
        # ONE batched transfer at the end of the sequence -- any per-frame
        # device->host fetch pays a full dispatch round-trip and would
        # serialize the pipeline (measured ~26 ms on a tunneled TPU).
        self._params_log: list = []
        self._iter = 0
        self.last_rpose_device: Optional[jnp.ndarray] = None
        self.last_result: Optional[ICPStepResult] = None
        self._viz = None  # lazy ImageVisualizer when config.viz_debug
        # EI bootstrap state: frame-0 cloud (host or device) + the jitted
        # BEV registration, cached per padded capacity.
        self._boot_cloud = None
        self._boot_fns: dict = {}

    def _viz_update(self):
        """Live per-frame model rendering when `viz_debug` is set (the
        capability of the reference's in-ICP vertex-map/model windows,
        icp_odometry.py:209-240): the local map's range image is colormapped
        to a cv2 window when available and PNGs under ./viz_debug.  Debug
        only -- each update fetches the model image from the device."""
        if not bool(self.config.viz_debug):
            return
        if self._viz is None:
            from pylidar_slam_tpu.viz.visualizer import ImageVisualizer
            self._viz = ImageVisualizer(output_dir="viz_debug",
                                        use_window=True)
        st = self._map_state
        img = None
        if self._mode == "aggregated_local_map":
            img = np.asarray(st.rng)
        elif self._mode == "projective_local_map":
            img = np.linalg.norm(np.asarray(st.vmaps[0]), axis=-1)
        if img is not None:
            self._viz.update(img, tag="model_range")

    # -- lifecycle ----------------------------------------------------------

    def init(self):
        k = self.local_map_size
        h, w = self.projector.height, self.projector.width
        if self._mode == "aggregated_local_map":
            from pylidar_slam_tpu.slam.odometry import aggregated_map as am
            self._map_state = am.init_agg_map(h, w)
        elif self._mode == "kdtree_local_map":
            from pylidar_slam_tpu.slam.odometry import surfel_map as sm
            use_hash = str(getattr(self._surfel_cfg, "nn_backend",
                                   "exact")) == "hash"
            self._map_state = sm.init_surfel_map(
                k, int(self._surfel_cfg.points_per_frame),
                hash_buckets=int(self._surfel_cfg.hash_buckets)
                if use_hash else 0,
                hash_capacity=int(self._surfel_cfg.hash_capacity)
                if use_hash else 0)
        elif self._mode == "voxel_local_map":
            from pylidar_slam_tpu.slam.odometry import voxel_map as vm
            self._map_state = vm.init_voxel_map(self._vox_cfg)
        else:
            self._map_state = init_projective_map(k, h, w)
        self._delta_since_update = jnp.eye(4, dtype=jnp.float32)
        self._params_log = []
        self._frame_buffer = []
        self._pending_rposes = []
        self._pending_param_fetches = []
        self._inflight_upload = None
        self.pipe_stats = {"upload_wait_s": 0.0, "dispatch_s": 0.0,
                           "flushes": 0}
        self._iter = 0
        if int(self.config.batch_size or 1) > 1 and \
                self._mode in ("aggregated_local_map", "kdtree_local_map", "voxel_local_map"):
            self._prewarm_single_step()
        self.last_rpose_device = None
        self.last_result = None
        self._boot_cloud = None

    # -- EI bootstrap -------------------------------------------------------

    def _boot_cloud_of(self, data_dict: dict, fallback=None):
        """Meters (N, 3) cloud for the EI bootstrap, preferring the raw
        host array over (possibly encoded) upload buffers."""
        raw = data_dict.get(self.config.data_key)
        if raw is not None:
            arr = raw if isinstance(raw, jnp.ndarray) else np.asarray(raw)
            if arr.ndim == 3:  # vertex map, (H, W, 3) or channels-first
                a = np.asarray(arr, np.float32)
                if a.shape[0] == 3 and a.shape[-1] != 3:
                    a = np.transpose(a, (1, 2, 0))  # mirror _read_input
                return a.reshape(-1, 3)
            if arr.ndim == 2 and arr.shape[1] >= 3:
                return np.asarray(arr[:, :3], np.float32)
        if fallback is not None and getattr(fallback, "ndim", 0) == 2 \
                and fallback.dtype == np.float32:
            return np.asarray(fallback[:, :3], np.float32)
        return None

    def _ei_bootstrap_pose(self, data_dict: dict, fallback=None):
        """BEV phase-correlation alignment of frame 1 to frame 0.

        Returns a (4, 4) float32 init pose (current frame -> previous
        frame), or None when either cloud is unavailable or the estimate
        fails its sanity clamp."""
        cur = self._boot_cloud_of(data_dict, fallback)
        prev = self._boot_cloud
        if cur is None or prev is None:
            return None
        size = int(self.config.ei_bootstrap_size)
        px = float(self.config.ei_bootstrap_pixel)
        cap = 1 << max(int(np.ceil(np.log2(max(
            prev.shape[0], cur.shape[0], 1)))), 10)
        fn = self._boot_fns.get(cap)
        if fn is None:
            from pylidar_slam_tpu.ops import bev as _bev
            steps = int(self.config.ei_bootstrap_yaw_steps)
            yaw_range = float(self.config.ei_bootstrap_yaw_range)

            def _img(p):
                # Ground suppression is load-bearing: see
                # bev.ground_suppressed_mask (raw single-scan phase
                # correlation locks onto the egocentric ground pattern at
                # zero shift).
                return _bev.build_elevation_image(
                    p, _bev.ground_suppressed_mask(p), px, size)

            def _boot(pa, pb):
                res = _bev.register_bev(_img(pa), _img(pb),
                                        num_yaw_steps=steps,
                                        yaw_range=yaw_range)
                return _bev.bev_transform_to_se3(res, px), res.score

            fn = self._boot_fns[cap] = jax.jit(_boot)

        def pad(c):
            out = np.zeros((cap, 3), np.float32)
            out[:c.shape[0]] = c
            return out

        mat, score = fn(jnp.asarray(pad(prev)), jnp.asarray(pad(cur)))
        mat_np = np.asarray(mat)
        # Score gate: a weak correlation peak means the BEV pair carries no
        # usable structure -- identity (the status quo) is safer.
        if float(score) < float(self.config.ei_bootstrap_min_score):
            return None
        # Sanity clamp: a shift beyond 80% of the correlation half-extent is
        # aliasing territory -- identity (the status quo) is safer.
        if float(np.linalg.norm(mat_np[:2, 3])) > 0.4 * size * px:
            return None
        return mat

    def _maybe_bootstrap(self, data_dict: dict, init_pose, fallback=None):
        """Swaps an uninformative (identity) frame-1 init for the EI
        estimate; a caller-supplied real prior (PoseNet/NI) wins."""
        if self._iter != 1 or not bool(self.config.ei_bootstrap) \
                or self._boot_cloud is None:
            return init_pose
        informative = float(np.abs(np.asarray(init_pose) -
                                   np.eye(4, dtype=np.float32)).max()) > 1e-5
        boot = None if informative else \
            self._ei_bootstrap_pose(data_dict, fallback)
        self._boot_cloud = None
        return init_pose if boot is None else boot

    # -- helpers ------------------------------------------------------------

    def _pad_points(self, points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        n_cap = self.config.num_points_padded
        pts = points[:, :3].astype(np.float32)
        # NaN scrub (reference remove_nan / modify_nan_pmap, 356-358)
        nan_rows = np.isnan(pts).any(axis=1)
        if nan_rows.any():
            pts = pts[~nan_rows]
        n = min(pts.shape[0], n_cap)
        padded = np.zeros((n_cap, 3), dtype=np.float32)
        padded[:n] = pts[:n]
        mask = np.zeros((n_cap,), dtype=bool)
        mask[:n] = True
        return padded, mask

    def _read_input(self, data_dict: dict) -> jnp.ndarray:
        key = self.config.data_key
        assert_debug(key in data_dict,
                     f"Could not find the key `{key}` in the input dictionary "
                     f"(keys: {list(data_dict.keys())}). Set `slam.odometry.data_key`.")
        data = data_dict[key]
        if isinstance(data, jnp.ndarray) and data.ndim == 3:
            vmap = data
            if vmap.shape[0] == 3:  # (3, H, W) reference layout -> channels-last
                vmap = jnp.transpose(vmap, (1, 2, 0))
            return jnp.nan_to_num(vmap.astype(jnp.float32))
        arr = np.asarray(data)
        if arr.ndim == 3:
            if arr.shape[0] == 3:
                arr = arr.transpose(1, 2, 0)
            return jnp.nan_to_num(jnp.asarray(arr, dtype=jnp.float32))
        assert_debug(arr.ndim == 2 and arr.shape[1] >= 3,
                     f"Cannot interpret data under '{key}' with shape {arr.shape}")
        padded, mask = self._pad_points(arr)
        return self._build_vmap(jnp.asarray(padded), jnp.asarray(mask))

    def _read_points(self, data_dict: dict):
        """Reads the input as a padded (N, 3) device cloud + validity mask."""
        key = self.config.data_key
        assert_debug(key in data_dict,
                     f"Could not find the key `{key}` in the input dictionary "
                     f"(keys: {list(data_dict.keys())}).")
        data = data_dict[key]
        if isinstance(data, jnp.ndarray) and data.ndim == 3:
            arr3 = data
            if arr3.shape[0] == 3:
                arr3 = jnp.transpose(arr3, (1, 2, 0))
            pts = jnp.nan_to_num(arr3.reshape(-1, 3).astype(jnp.float32))
            mask = jnp.max(jnp.abs(pts), axis=-1) > 0
            return pts, mask
        arr = np.asarray(data)
        if arr.ndim == 3:
            if arr.shape[0] == 3:
                arr = arr.transpose(1, 2, 0)
            pts = jnp.nan_to_num(jnp.asarray(arr.reshape(-1, 3), dtype=jnp.float32))
            mask = jnp.max(jnp.abs(pts), axis=-1) > 0
            return pts, mask
        assert_debug(arr.ndim == 2 and arr.shape[1] >= 3,
                     f"Cannot interpret data under '{key}' with shape {arr.shape}")
        if self._mode in ("aggregated_local_map", "kdtree_local_map", "voxel_local_map"):
            return self._compact_upload(arr)
        padded, mask = self._pad_points(arr)
        return jnp.asarray(padded), jnp.asarray(mask)

    _UPLOAD_BUCKET = 16384

    def _compact_host_buffer(self, arr: np.ndarray) -> np.ndarray:
        """Scrubs + buckets a raw scan into the minimal host upload buffer.

        Only the VALID points cross the tunnel (bucketed up to a multiple of
        16384 rows); zero-padding to the static capacity happens on device
        and the validity mask is derived on device from the zero padding.
        Optional int16 quantization (config.upload_quantization) halves the
        bytes (costs ~0.25pt tr_err on noise-free synthetic -- default off).
        """
        cap = self.config.num_points_padded
        fmt = str(self.config.upload_format or "f32")
        if fmt == "rimg12":
            # 1.5 B/pixel: the buffer IS its full static shape (4 px/row),
            # so no device-side padding happens -- num_points_padded must
            # equal the decoded point count (4 x rows).
            from pylidar_slam_tpu.ops import projection as proj_ops
            buf = proj_ops.np_encode_rimg12(arr[:, :3], self.projector)
            assert_debug(cap == 4 * buf.shape[0],
                         f"rimg12 upload needs num_points_padded == "
                         f"{4 * buf.shape[0]} (4 x encoded rows; got {cap})")
            return buf
        if fmt in ("rimg", "rimg16", "rimg8"):
            # Fixed-shape range image: the z-buffer IS the capacity bound
            # (1 point/pixel), so no overflow drop is ever needed.  No NaN
            # pre-scrub either: both the native encoder and the numpy
            # fallback skip non-finite points themselves (saves ~1.4 ms of
            # the ~2.8 ms/frame host encode).
            h, w = self.projector.height, self.projector.width
            need = h * w + ((h + w + 1) // 2 if fmt == "rimg8" else 0)
            assert_debug(cap >= need,
                         f"{fmt} upload needs num_points_padded >= {need} "
                         f"(got {cap})")
            from pylidar_slam_tpu.ops import projection as proj_ops
            return proj_ops.np_encode_range_image(arr[:, :3], self.projector,
                                                  sub16=(fmt == "rimg16"),
                                                  planes=(fmt == "rimg8"))
        pts = arr[:, :3].astype(np.float32)
        nan_rows = np.isnan(pts).any(axis=1)
        if nan_rows.any():
            pts = pts[~nan_rows]
        if pts.shape[0] > cap:
            # Spatially uniform overflow drop (stride over scan order ==
            # azimuth-uniform).  Plain head-truncation would keep only the
            # top image rows -- the same bias that made the round-1 surfel
            # map fragile.
            pts = pts[:: -(-pts.shape[0] // cap)][:cap]
        if str(self.config.upload_format or "f32") == "packed" and \
                self.projector.height * self.projector.width <= 65536:
            from pylidar_slam_tpu.ops import projection as proj_ops
            enc = proj_ops.np_encode_packed_upload(pts, self.projector)
            n = min(enc.shape[0], cap)
            bucket = min(cap, max(self._UPLOAD_BUCKET,
                                  -(-n // self._UPLOAD_BUCKET) *
                                  self._UPLOAD_BUCKET))
            buf = np.zeros((bucket, 4), np.uint16)
            buf[:n] = enc[:n]
            return buf
        n = min(pts.shape[0], cap)
        bucket = min(cap, max(self._UPLOAD_BUCKET,
                              -(-n // self._UPLOAD_BUCKET) * self._UPLOAD_BUCKET))
        q = float(self.config.upload_quantization or 0.0)
        if q > 0.0:
            chunk = pts[:n]
            if self.config.upload_dither:
                self._dither_rng = getattr(self, "_dither_rng", None) or \
                    np.random.default_rng(0)
                chunk = chunk + (self._dither_rng.random(
                    chunk.shape, dtype=np.float32) - 0.5) * q
            steps = np.round(chunk / q)
            # Points beyond the int16 range are DROPPED (clamping would warp
            # far-field geometry and bias the registration).
            steps[(np.abs(steps) > 32767).any(axis=1)] = 0.0
            buf = np.zeros((bucket, 3), np.int16)
            buf[:n] = steps
        else:
            buf = np.zeros((bucket, 3), np.float32)
            buf[:n] = pts[:n]
        return buf

    def encode_upload(self, arr: np.ndarray) -> np.ndarray:
        """Host-side upload encoding, safe to call from prefetch workers.

        Store the result under ``data_dict["encoded_upload"]`` to keep the
        per-frame encode (NaN scrub + grid bucketing or range-image codec)
        off the main pipeline thread in batched mode."""
        return self._compact_host_buffer(np.asarray(arr))

    def _compact_upload(self, arr: np.ndarray):
        """Tunnel-frugal host->device upload of a raw scan (upload bandwidth
        is the measured bottleneck: ~45 MB/s through the tunneled chip)."""
        buf = self._compact_host_buffer(arr)
        return self._device_pad(jnp.asarray(buf)), self._ones_mask()

    def _device_pad(self, dev: jnp.ndarray) -> jnp.ndarray:
        cap = self.config.num_points_padded
        rows = int(dev.shape[0])
        if rows >= cap:
            return dev
        if dev.dtype == jnp.uint8 and int(dev.shape[-1]) == 6:
            return dev  # rimg12: already its full static shape (4 px/row)
        cols = int(dev.shape[1])
        key = (rows, cols, str(dev.dtype))
        fn = self._device_pad_cache.get(key)
        if fn is None:
            pad = cap - rows
            fn = jax.jit(lambda x: jnp.concatenate(
                [x, jnp.zeros((pad, cols), x.dtype)], axis=0))
            self._device_pad_cache[key] = fn
        return fn(dev)

    def _ones_mask(self) -> jnp.ndarray:
        if self._ones_mask_arr is None:
            self._ones_mask_arr = jnp.ones(
                (self.config.num_points_padded,), bool)
        return self._ones_mask_arr

    def _device_pad_batch(self, dev: jnp.ndarray) -> jnp.ndarray:
        cap = self.config.num_points_padded
        b, rows, cols = int(dev.shape[0]), int(dev.shape[1]), int(dev.shape[2])
        if rows >= cap:
            return dev
        if dev.dtype == jnp.uint8 and cols == 6:
            return dev  # rimg12: already its full static shape (4 px/row)
        key = (b, rows, cols, str(dev.dtype))
        fn = self._device_pad_cache.get(key)
        if fn is None:
            pad = cap - rows
            fn = jax.jit(lambda x: jnp.concatenate(
                [x, jnp.zeros((b, pad, cols), x.dtype)], axis=1))
            self._device_pad_cache[key] = fn
        return fn(dev)

    def _ones_mask_batch(self, b: int) -> jnp.ndarray:
        key = ("bmask", b)
        arr = self._device_pad_cache.get(key)
        if arr is None:
            arr = jnp.ones((b, self.config.num_points_padded), bool)
            self._device_pad_cache[key] = arr
        return arr

    @staticmethod
    def pointcloud_key() -> str:
        return "odometry_pc"

    @staticmethod
    def relative_pose_key() -> str:
        return "odometry_pose"

    # -- main ---------------------------------------------------------------

    def process_next_frame(self, data_dict: dict):
        if self._mode in ("aggregated_local_map", "kdtree_local_map", "voxel_local_map"):
            # Both modes share the (points, mask) fused-step interface.
            return self._process_next_frame_agg(data_dict)
        vmap = self._read_input(data_dict)

        if self._iter == 0:
            self._map_state = self._first(self._map_state, vmap)
            self.last_rpose_device = jnp.eye(4, dtype=jnp.float32)
            self._params_log.append(jnp.zeros((1, 6), dtype=jnp.float32))
            self._iter += 1
            data_dict[self.relative_pose_key()] = self.last_rpose_device
            if bool(self.config.ei_bootstrap):
                self._boot_cloud = self._boot_cloud_of(data_dict)
            return

        init_np = data_dict.get("init_rpose", None)
        if init_np is None:
            init_pose = jnp.eye(4, dtype=jnp.float32)
        elif isinstance(init_np, jnp.ndarray):
            init_pose = init_np.astype(jnp.float32)
        else:
            init_pose = jnp.asarray(np.asarray(init_np), dtype=jnp.float32)
        init_pose = self._maybe_bootstrap(data_dict, init_pose)

        self._map_state, self._delta_since_update, result = self._step(
            self._map_state, self._delta_since_update, vmap, init_pose)
        self.last_rpose_device = result.pose_matrix
        self.last_result = result
        self._params_log.append(result.pose_params[None])

        # NO host sync here: the pose stays a device array and is fetched in
        # one batched transfer by get_relative_poses().  Downstream consumers
        # (loop closure / backend) convert on demand.
        data_dict[self.relative_pose_key()] = result.pose_matrix
        data_dict[self.pointcloud_key()] = vmap  # device array, fetched lazily
        self._iter += 1
        self._viz_update()

    def _process_next_frame_agg(self, data_dict: dict):
        batched = int(self.config.batch_size or 1) > 1

        if batched and self._iter > 0:
            # Batched fast path: keep the frame as a compact HOST buffer; the
            # whole batch crosses the tunnel as ONE stacked transfer at flush
            # (8 separate uploads measurably fragment tunnel bandwidth).
            raw = data_dict.get(self.config.data_key)
            arr = None if isinstance(raw, jnp.ndarray) else np.asarray(raw)
            pre = data_dict.get("encoded_upload")
            if pre is not None:
                # The prefetch worker already ran encode_upload() off the
                # main thread (the 3 ms/frame host encode otherwise
                # serializes with flushes in the pipelined loop).
                entry = pre
                pc_out = entry if (entry.dtype == np.float32 or arr is None) \
                    else arr[:, :3]
            elif arr is not None and arr.ndim == 2 and arr.shape[1] >= 3:
                entry = self._compact_host_buffer(arr)
                # Downstream consumers (loop closure) need METERS; hand them
                # the raw cloud when the upload buffer is an encoded format.
                pc_out = entry if entry.dtype == np.float32 else arr[:, :3]
            else:  # vertex-map / device input: fall back to device arrays
                entry = self._read_points(data_dict)
                pc_out = entry[0]
            if self._iter == 1 and bool(self.config.ei_bootstrap) and \
                    self._boot_cloud is not None:
                # Batched EI bootstrap: the CV chain starts from
                # last_rpose_device (identity after frame 0) -- replace it
                # with the BEV estimate so frame 1's in-scan init is real.
                fb = pc_out if isinstance(pc_out, np.ndarray) else None
                boot = self._ei_bootstrap_pose(data_dict, fallback=fb)
                if boot is not None:
                    self.last_rpose_device = boot
                self._boot_cloud = None
            self._frame_buffer.append(entry)
            self._iter += 1
            # The points stay available to downstream consumers (loop
            # closure) even though the pose arrives only at the next flush.
            data_dict[self.pointcloud_key()] = pc_out
            if len(self._frame_buffer) >= int(self.config.batch_size):
                self._flush_batch()
            return

        points, mask = self._read_points(data_dict)

        if self._iter == 0:
            self._map_state = self._first(self._map_state, points, mask)
            self.last_rpose_device = jnp.eye(4, dtype=jnp.float32)
            self._params_log.append(jnp.zeros((1, 6), dtype=jnp.float32))
            self._iter += 1
            data_dict[self.relative_pose_key()] = self.last_rpose_device
            if bool(self.config.ei_bootstrap):
                self._boot_cloud = self._boot_cloud_of(data_dict)
            return

        init_np = data_dict.get("init_rpose", None)
        if init_np is None:
            init_pose = jnp.eye(4, dtype=jnp.float32)
        elif isinstance(init_np, jnp.ndarray):
            init_pose = init_np.astype(jnp.float32)
        else:
            init_pose = jnp.asarray(np.asarray(init_np), dtype=jnp.float32)
        init_pose = self._maybe_bootstrap(data_dict, init_pose)

        (self._map_state, self._delta_since_update, rpose, pose_params,
         diag) = self._step(self._map_state, self._delta_since_update,
                            points, mask, init_pose)
        loss, it, matches, inserted = diag
        self.last_rpose_device = rpose
        self.last_result = ICPStepResult(pose_params, rpose, loss, it,
                                         matches, inserted)
        self._params_log.append(pose_params[None])
        data_dict[self.relative_pose_key()] = rpose
        if points.dtype != jnp.float32:
            # Encoded upload (packed/rimg/quantized): downstream consumers
            # get the raw meters cloud.
            raw = data_dict.get(self.config.data_key)
            data_dict[self.pointcloud_key()] = \
                np.asarray(raw)[:, :3] if raw is not None else points
        else:
            data_dict[self.pointcloud_key()] = points
        self._iter += 1
        self._viz_update()

    def _stack_and_upload(self, bufs: list):
        """Stacks host buffers and issues the ONE batched H2D transfer.

        Called either inline (sync path) or from the uploader thread (the
        async path, where the transfer overlaps the previous batch's device
        execution)."""
        rows = max(b.shape[0] for b in bufs)
        stacked = np.zeros((len(bufs), rows, bufs[0].shape[1]), bufs[0].dtype)
        for i, b in enumerate(bufs):
            stacked[i, :b.shape[0]] = b
        pts = self._device_pad_batch(jnp.asarray(stacked))
        msks = self._ones_mask_batch(len(bufs))
        return pts, msks

    def _dispatch_batch(self, pts, msks):
        """Dispatches one batched device execution (async w.r.t. the host)."""
        if self.last_rpose_device is None:
            self.last_rpose_device = jnp.eye(4, dtype=jnp.float32)
        (self._map_state, self._delta_since_update, self.last_rpose_device,
         params, _diags) = self._batch_step(
            self._map_state, self._delta_since_update,
            self.last_rpose_device, pts, msks)
        self._params_log.append(params)
        if self.emit_batch_poses:
            # Queue the host FETCH of the params, not the device array: the
            # np.asarray runs in a fetch thread (its ~26 ms tunnel round-trip
            # overlaps the next accumulate/compute phase) and
            # drain_batch_results only collects the finished result a few
            # flushes later.
            try:
                params.copy_to_host_async()
            except Exception:
                pass
            if self._fetch_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._fetch_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="icp-fetch")
            self._pending_param_fetches.append(
                self._fetch_pool.submit(np.asarray, params, np.float64))

    def _dispatch_inflight(self):
        """Dispatches the batch whose upload was running in the background."""
        if self._inflight_upload is not None:
            fut = self._inflight_upload
            self._inflight_upload = None
            t0 = time.perf_counter()
            pts, msks = fut.result()
            t1 = time.perf_counter()
            self._dispatch_batch(pts, msks)
            t2 = time.perf_counter()
            st = self.pipe_stats
            st["upload_wait_s"] += t1 - t0
            st["dispatch_s"] += t2 - t1
            st["flushes"] += 1
            self._viz_update()  # batched mode: one model render per flush

    def _flush_batch(self):
        """Runs the buffered frames through one batched device execution."""
        if not self._frame_buffer:
            return
        bufs = self._frame_buffer
        self._frame_buffer = []
        if isinstance(bufs[0], np.ndarray):
            if bool(self.config.async_upload):
                # Double-buffered pipeline: start THIS batch's transfer in
                # the uploader thread, then dispatch the PREVIOUS batch
                # (whose transfer had the whole accumulate phase + this
                # call's gap to complete) -- its compute now runs while the
                # new transfer streams through the tunnel.
                if self._upload_pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    self._upload_pool = ThreadPoolExecutor(
                        max_workers=1, thread_name_prefix="icp-upload")
                fut = self._upload_pool.submit(self._stack_and_upload, bufs)
                self._dispatch_inflight()
                self._inflight_upload = fut
                return
            pts, msks = self._stack_and_upload(bufs)
        else:
            pts = jnp.stack([p for p, _ in bufs])
            msks = jnp.stack([m for _, m in bufs])
        self._dispatch_batch(pts, msks)

    def _flush_remainder(self):
        """Processes a final partial buffer with the per-frame step (avoids
        retracing the batched executable for a different batch size)."""
        # Dispatch the batch whose upload is still in flight FIRST: the map
        # state must chain in frame order before the remainder frames run.
        self._dispatch_inflight()
        # Drain any still-queued batched fetches FIRST: _pending_rposes must
        # stay in frame order, and the remainder frames come after every
        # already-flushed batch.
        while self._pending_param_fetches:
            fut = self._pending_param_fetches.pop(0)
            for p in fut.result():
                self._pending_rposes.append(_pose_matrix_f64(p))
        entries = [
            (self._device_pad(jnp.asarray(e)), self._ones_mask())
            if isinstance(e, np.ndarray) else e
            for e in self._frame_buffer]
        self._frame_buffer = entries
        for points, mask in self._frame_buffer:
            (self._map_state, self._delta_since_update, rpose, pose_params,
             _diag) = self._step(self._map_state, self._delta_since_update,
                                 points, mask, self.last_rpose_device)
            self.last_rpose_device = rpose
            self._params_log.append(pose_params[None])
            if self.emit_batch_poses:
                self._pending_rposes.append(
                    _pose_matrix_f64(np.asarray(pose_params, np.float64)))
        self._frame_buffer = []

    def drain_batch_results(self, final: bool = False) -> list:
        """Returns (and clears) float64 relative poses for frames whose device
        computation completed since the last drain (batched mode only).

        Keeps the most recent flushes in flight (a host fetch costs ~200 ms
        on the tunneled chip while the queue is busy, so downstream consumers
        run a few batches behind) unless `final` is True.
        """
        if final:
            self._dispatch_inflight()
        keep_in_flight = 0 if final else \
            max(int(self.config.batch_results_lag), 0)
        while len(self._pending_param_fetches) > keep_in_flight:
            fut = self._pending_param_fetches.pop(0)
            for p in fut.result():
                self._pending_rposes.append(_pose_matrix_f64(p))
        out = self._pending_rposes
        self._pending_rposes = []
        return out

    def finish(self):
        """Flushes any partially-filled batch buffer at sequence end."""
        if self._frame_buffer:
            self._flush_remainder()
        else:
            self._dispatch_inflight()

    def _prewarm_single_step(self):
        """Background-compiles the per-frame step used by _flush_remainder so
        sequence end does not pay a multi-second first-call compile."""
        if getattr(self, "_prewarmed", False):
            return
        self._prewarmed = True
        from pylidar_slam_tpu.utils.prewarm import start_prewarm

        map_state = self._map_state
        cap = self.config.num_points_padded
        fmt = str(self.config.upload_format or "f32")
        rows = cap
        if fmt == "rimg12":
            dtype, ncols, rows = jnp.uint8, 6, cap // 4
        elif fmt in ("rimg", "rimg16", "rimg8"):
            dtype, ncols = jnp.uint8, {"rimg": 3, "rimg16": 4,
                                       "rimg8": 2}[fmt]
        elif fmt == "packed" and \
                self.projector.height * self.projector.width <= 65536:
            dtype, ncols = jnp.uint16, 4
        elif float(self.config.upload_quantization or 0.0) > 0:
            dtype, ncols = jnp.int16, 3
        else:
            dtype, ncols = jnp.float32, 3

        def warm():
            try:
                eye = jnp.eye(4, dtype=jnp.float32)
                pts = jnp.zeros((rows, ncols), dtype)
                msk = jnp.ones((cap,), bool)
                # A real call on a THROWAWAY copy populates the jit cache
                # (map_state arg is donated, so pass a fresh tree copy).
                state = jax.tree.map(jnp.array, map_state)
                self._step(state, eye, pts, msk, eye)
            except Exception:
                pass  # prewarm is best-effort
        start_prewarm(warm, name="icp-prewarm")

    def fetch_params_log(self) -> Optional[np.ndarray]:
        """One batched device->host fetch of all logged pose params (T, 6)."""
        if self._frame_buffer:
            self._flush_remainder()
        else:
            self._dispatch_inflight()
        if not self._params_log:
            return None
        return np.asarray(jnp.concatenate(self._params_log, axis=0),
                          dtype=np.float64)

    def get_relative_poses(self) -> Optional[np.ndarray]:
        params = self.fetch_params_log()
        if params is None:
            return None
        # float64 pose matrices on host, kept float64 end-to-end (reference
        # keeps a float64 absolute ledger, slam.py:142-144; relative matrices
        # are rebuilt exactly from the float32 params the device solved for).
        rel = np.stack([_pose_matrix_f64(p) for p in params])
        pose_type = str(getattr(self.config, "pose_type", "") or "")
        if self._elastic and pose_type in ("mid_pose", "end_pose"):
            return _ct_relative_poses(rel,
                                      0.5 if pose_type == "mid_pose" else 1.0)
        return rel

    def get_ct_relative_poses(self, pose_type: str = "mid_pose") \
            -> Optional[np.ndarray]:
        """Continuous-time pose surface: per-frame relative poses between
        consecutive begin / mid / end scan poses (reference
        ct_icp_odometry.py:326-336).  Valid for any mode; in rigid modes the
        within-scan motion model still uses the frame-to-frame estimate."""
        params = self.fetch_params_log()
        if params is None:
            return None
        rel = np.stack([_pose_matrix_f64(p) for p in params])
        if pose_type == "begin_pose":
            return rel
        assert_debug(pose_type in ("mid_pose", "end_pose"),
                     f"Unknown pose_type '{pose_type}'")
        return _ct_relative_poses(rel, 0.5 if pose_type == "mid_pose" else 1.0)

    @property
    def absolute_poses(self) -> list:
        """Float64 absolute pose ledger (computed lazily from the log)."""
        params = self.fetch_params_log()
        if params is None:
            return []
        out = [np.eye(4)]
        for p in params[1:]:
            out.append(out[-1] @ _pose_matrix_f64(p))
        return out


def _pose_fraction_f64(mat: np.ndarray, frac: float) -> np.ndarray:
    """Geodesic fraction of an SE(3) matrix (float64 host): axis-angle
    rotation scaling + translation lerp -- the same interpolation the
    device-side elastic warp applies per point (se3.interpolate_pose)."""
    r = mat[:3, :3]
    cos = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    ang = float(np.arccos(cos))
    out = np.eye(4)
    if ang < 1e-12:
        out[:3, :3] = np.eye(3) + frac * (r - np.eye(3))
    else:
        axis = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                         r[1, 0] - r[0, 1]]) / (2.0 * np.sin(ang))
        a = ang * frac
        k = np.array([[0.0, -axis[2], axis[1]],
                      [axis[2], 0.0, -axis[0]],
                      [-axis[1], axis[0], 0.0]])
        out[:3, :3] = np.eye(3) + np.sin(a) * k + (1.0 - np.cos(a)) * (k @ k)
    out[:3, 3] = frac * mat[:3, 3]
    return out


def _ct_relative_poses(rel_begin: np.ndarray, frac: float) -> np.ndarray:
    """Relative poses between consecutive mid/end scan poses.

    Scan k's within-sweep motion is modeled as its frame-to-frame motion
    rel_begin[k] (the constant-velocity warp the elastic ICP converged
    under, aggregated_map.py::rasterize_target), so the absolute pose at
    sweep fraction `frac` is abs_begin_k @ fraction(rel_begin[k], frac).
    """
    n = rel_begin.shape[0]
    out = np.empty_like(rel_begin)
    prev_abs_f = None
    abs_begin = np.eye(4)
    for k in range(n):
        abs_begin = abs_begin @ rel_begin[k]
        abs_f = abs_begin @ _pose_fraction_f64(rel_begin[k], frac)
        out[k] = np.eye(4) if prev_abs_f is None else \
            np.linalg.solve(prev_abs_f, abs_f)
        prev_abs_f = abs_f
    return out


def _pose_matrix_f64(params: np.ndarray) -> np.ndarray:
    """Float64 euler-xyz pose matrix (host-side, for the absolute ledger)."""
    tx, ty, tz, ex, ey, ez = params
    cx, sx = np.cos(ex), np.sin(ex)
    cy, sy = np.cos(ey), np.sin(ey)
    cz, sz = np.cos(ez), np.sin(ez)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    mat = np.eye(4)
    mat[:3, :3] = rz @ ry @ rx
    mat[:3, 3] = [tx, ty, tz]
    return mat


def init_projective_map(k, h, w):
    return lm.init_projective_map(k, h, w)


ODOMETRY.register("icp_F2M", ICPFrameToModel, ICPFrameToModelConfig)
