"""Local maps for frame-to-model ICP, as explicit device pytree state.

Two designs with the same capability surface as the reference
(slam/odometry/local_map.py):

* **ProjectiveLocalMap** -- a fixed-capacity ring buffer of the last K frames'
  vertex maps + normal maps + relative poses; nearest neighbors by projective
  association (per-pixel min over K re-projected model maps).  100% on-device,
  no data-dependent shapes; this is the TPU-native flagship.

* **VoxelLocalMap** (registered under the reference's ``kdtree_local_map``
  name) -- the TPU-native stand-in for the reference's pykdtree map: a fixed
  ring buffer of frame point clouds searched with a multi-probe voxel-grid
  association (see voxel_map.py).

Unlike the reference's mutating classes, the map is a NamedTuple pytree and
every operation is a pure function usable inside jit/scan.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.config import MISSING, Registry
from pylidar_slam_tpu.ops import geometry, projection, se3


# ----------------------------------------------------------------------------
# Configs
# ----------------------------------------------------------------------------

@dataclass
class LocalMapConfig:
    pose: str = "euler"
    type: str = MISSING


@dataclass
class ProjectiveLocalMapConfig(LocalMapConfig):
    type: str = "projective_local_map"
    local_map_size: int = 20
    normals_kernel_size: int = 5


# ----------------------------------------------------------------------------
# Projective local map state + pure ops
# ----------------------------------------------------------------------------

class ProjectiveMapState(NamedTuple):
    """Ring buffer of the last <= K frames (all arrays float32, channels-last).

    ``poses[k]`` maps stored-frame-k coordinates into the *current* frame;
    they are re-expressed (left-multiplied by inv(new_rpose)) at every update,
    exactly like the reference (local_map.py:152-165).
    """
    vmaps: jnp.ndarray  # (K, H, W, 3) vertex maps in their own sensor frame
    nmaps: jnp.ndarray  # (K, H, W, 3) normal maps in their own sensor frame
    poses: jnp.ndarray  # (K, 4, 4) stored-frame -> current-frame
    count: jnp.ndarray  # () int32 valid frames
    write_idx: jnp.ndarray  # () int32 next ring slot
    model_vmaps: jnp.ndarray  # (K, H, W, 3) re-projected model vertex maps
    model_nmaps: jnp.ndarray  # (K, H, W, 3) re-projected model normal maps


def init_projective_map(k: int, h: int, w: int, dtype=jnp.float32) -> ProjectiveMapState:
    # Distinct buffers per field (donation requires unaliased arguments).
    def zeros():
        return jnp.zeros((k, h, w, 3), dtype=dtype)

    eyes = jnp.tile(jnp.eye(4, dtype=dtype), (k, 1, 1))
    return ProjectiveMapState(
        vmaps=zeros(), nmaps=zeros(), poses=eyes,
        count=jnp.zeros((), jnp.int32), write_idx=jnp.zeros((), jnp.int32),
        model_vmaps=zeros(), model_nmaps=zeros())


def _slot_valid_mask(state: ProjectiveMapState) -> jnp.ndarray:
    k = state.vmaps.shape[0]
    return jnp.arange(k) < state.count  # (K,) ring fills 0..K-1 then reuses


def build_model(state: ProjectiveMapState,
                proj: projection.SphericalProjection) -> ProjectiveMapState:
    """Re-projects every stored frame into the current frame's image plane.

    Equivalent of reference ProjectiveLocalMap.build_model (local_map.py:177-202):
    transform stored clouds+normals by their poses, rasterize each into an
    aligned (H, W) vertex/normal map pair.
    """
    k, h, w, _ = state.vmaps.shape
    valid = _slot_valid_mask(state)

    def project_one(vmap, nmap, pose, is_valid):
        pts = vmap.reshape(-1, 3)
        nrm = nmap.reshape(-1, 3)
        mask = (jnp.max(jnp.abs(pts), axis=-1) > 0) & is_valid
        tpts = se3.apply_transformation(pts[None], pose[None])[0]
        tnrm = se3.apply_rotation(nrm[None], pose[None])[0]
        channels = jnp.concatenate([tpts, tnrm], axis=-1)
        img = projection.build_vertex_map(tpts, proj, mask=mask, channels=channels)
        return img[..., :3], img[..., 3:]

    model_vmaps, model_nmaps = jax.vmap(project_one)(
        state.vmaps, state.nmaps, state.poses, valid)
    return state._replace(model_vmaps=model_vmaps, model_nmaps=model_nmaps)


def update_projective_map(state: ProjectiveMapState,
                          new_rpose: jnp.ndarray,
                          new_vmap: jnp.ndarray,
                          proj: projection.SphericalProjection,
                          insert: jnp.ndarray,
                          normals_kernel_size: int = 5) -> ProjectiveMapState:
    """Per-frame map update (pure, jit-safe).

    Always re-expresses stored poses in the new frame; conditionally inserts
    the new frame into the ring (thresholded by the caller, mirroring
    reference icp_odometry.py:360-380) and rebuilds the re-projected model.

    Args:
        new_rpose: (4, 4) relative pose of the new frame wrt the previous one.
        new_vmap: (H, W, 3) the new frame's vertex map (sensor frame).
        insert: () bool -- whether to insert the new frame into the ring.
    """
    k = state.vmaps.shape[0]
    inv = se3.inverse_pose_matrix(new_rpose[None])[0]
    shifted_poses = jnp.einsum("ij,kjl->kil", inv, state.poses)

    def do_insert(_):
        nmap = geometry.compute_normal_map(new_vmap, normals_kernel_size)
        slot = state.write_idx
        return state._replace(
            vmaps=state.vmaps.at[slot].set(new_vmap),
            nmaps=state.nmaps.at[slot].set(nmap),
            poses=shifted_poses.at[slot].set(jnp.eye(4, dtype=shifted_poses.dtype)),
            count=jnp.minimum(state.count + 1, k),
            write_idx=(state.write_idx + 1) % k)

    def no_insert(_):
        return state._replace(poses=shifted_poses)

    state = jax.lax.cond(insert, do_insert, no_insert, None)
    return build_model(state, proj)


def nearest_neighbors(state: ProjectiveMapState,
                      target_vmap: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projective NN search: (H, W, 3) target -> (neighbors, normals)."""
    return geometry.compute_neighbors(target_vmap, state.model_vmaps,
                                      state.model_nmaps)


LOCAL_MAP = Registry("local_map", type_key="type")
# VoxelLocalMap registers itself under "kdtree_local_map" in voxel_map.py.
LOCAL_MAP.register("projective_local_map", object, ProjectiveLocalMapConfig)
