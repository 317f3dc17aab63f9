"""Records reference-implementation intermediates as parity fixtures.

Runs the REFERENCE code (/root/reference, torch CPU) on deterministic
synthetic inputs and serializes per-stage outputs to
tests/fixtures/reference_parity.npz.  tests/test_reference_parity.py then
asserts our JAX ops agree on the SAME inputs -- the per-stage parity harness
SURVEY.md section 7 ("hard parts" #1) calls for, usable without any mounted
dataset.

Stages recorded (reference file:line):
  * spherical projection vertex map  (projection.py:331-418)
  * normal map                       (geometry.py:240-295)
  * robust LS scheme weights         (optimization.py:45-226)
  * one Gauss-Newton point-to-plane step (optimization.py:296-435)
  * pose matrix jacobian             (rotation.py:253-314, pose.py)
  * KITTI metrics / ATE / ARE        (eval_odometry.py:99-201)

Usage: python scripts/generate_parity_fixtures.py
"""
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def _shim_omegaconf():
    """Minimal omegaconf stand-in: the reference only needs the names at
    import time for the modules we exercise."""
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")
    mod.DictConfig = dict
    mod.MISSING = "???"

    class OmegaConf:  # pragma: no cover - not exercised
        @staticmethod
        def create(x=None):
            return x or {}

    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


def main():
    _shim_omegaconf()
    sys.path.insert(0, str(REFERENCE))
    import torch

    from slam.common.projection import SphericalProjector
    from slam.common.geometry import compute_normal_map
    from slam.common.optimization import GaussNewton, PointToPlaneCost, _LS_SCHEME
    from slam.common.pose import Pose
    from slam.eval import eval_odometry as ref_eval

    rng = np.random.default_rng(1234)
    out = {}

    # ------------------------------------------------------------------
    # A deterministic synthetic scan (our generator, host-side numpy only).
    sys.path.insert(0, str(REPO))
    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticSequence)
    cfg = SyntheticConfig(dataset="synthetic", num_frames=2, noise_std=0.005)
    seq = SyntheticSequence(cfg, "synth_00", seed=0)
    pc = np.asarray(seq[0]["numpy_pc"], np.float64)
    # The raycast beams sit EXACTLY on pixel centers, i.e. re-projection
    # lands on half-pixel rounding boundaries where float noise flips
    # round-to-even between torch and jax.  A fixed small rotation moves
    # every angle off the boundary so only real convention differences show.
    ang = 0.2347
    rot = np.array([[np.cos(ang), -np.sin(ang), 0.0],
                    [np.sin(ang), np.cos(ang), 0.0],
                    [0.0, 0.0, 1.0]])
    tilt = 0.0113
    rot = rot @ np.array([[np.cos(tilt), 0, np.sin(tilt)],
                          [0, 1, 0],
                          [-np.sin(tilt), 0, np.cos(tilt)]])
    pc = pc @ rot.T
    out["pointcloud"] = pc

    # ------------------------------------------------------------------
    # 1. Vertex map (z-buffered spherical projection)
    h, w = 64, 1024
    projector = SphericalProjector(height=h, width=w, num_channels=3,
                                   up_fov=3.0, down_fov=-24.0)
    t_pc = torch.from_numpy(pc.astype(np.float32))[None]
    vmap = projector.build_projection_map(t_pc)  # (1, 3, H, W)
    out["vertex_map"] = vmap[0].permute(1, 2, 0).numpy()  # (H, W, 3)
    out["proj_params"] = np.array([h, w, 3.0, -24.0])

    # 2. Normal map from that vertex map
    nmap = compute_normal_map(vmap, kernel_size=5)
    out["normal_map"] = nmap[0].permute(1, 2, 0).numpy()

    # ------------------------------------------------------------------
    # 3. Robust scheme weights on a shared residual vector
    res = torch.from_numpy(rng.normal(0.0, 0.4, size=(1, 512)))
    out["scheme_residuals"] = res[0].numpy()
    for scheme, kwargs in (("least_square", {}),
                           ("huber", {"sigma": 0.3}),
                           ("geman_mcclure", {"sigma": 0.3}),
                           ("cauchy", {"sigma": 0.3})):
        weights = _LS_SCHEME.get(scheme, **kwargs).weights(res)
        out[f"scheme_weights_{scheme}"] = weights[0].numpy()
    # neighborhood scheme: weights by match distance ||q - p||
    nb_tgt = rng.uniform(-5, 5, size=(1, 512, 3))
    nb_ref = nb_tgt + rng.normal(0.0, 0.2, size=(1, 512, 3))
    out["scheme_nb_target"] = nb_tgt[0]
    out["scheme_nb_reference"] = nb_ref[0]
    weights = _LS_SCHEME.get("neighborhood", sigma=0.2).weights(
        res, target_points=torch.from_numpy(nb_tgt),
        reference_points=torch.from_numpy(nb_ref))
    out["scheme_weights_neighborhood"] = weights[0].numpy()

    # ------------------------------------------------------------------
    # 4. One point-to-plane Gauss-Newton step from x0 = 0
    n_pts = 400
    ref_points = rng.uniform(-10, 10, size=(1, n_pts, 3))
    normals = rng.normal(size=(1, n_pts, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    gt_params = np.array([[0.08, -0.05, 0.03, 0.02, -0.015, 0.025]])
    pose = Pose("euler")
    t_gt = pose.build_pose_matrix(torch.from_numpy(gt_params))
    tgt = (np.einsum("ij,nj->ni", np.asarray(t_gt[0, :3, :3]),
                     ref_points[0]) + np.asarray(t_gt[0, :3, 3]))[None]
    t_tgt = torch.from_numpy(tgt)
    t_ref = torch.from_numpy(ref_points)
    t_nrm = torch.from_numpy(normals)
    res_fun = PointToPlaneCost.get_residual_fun(t_tgt, t_ref, t_nrm, pose)
    jac_fun = PointToPlaneCost.get_residual_jac_fun(t_tgt, t_ref, t_nrm, pose)
    x0 = torch.zeros(1, 6, dtype=torch.float64)
    gn = GaussNewton(max_iters=1, norm_stop_criterion=1e-12,
                     scheme="least_square")
    x1, _ = gn.compute(x0, res_fun, jac_fun)
    out["gn_target_points"] = tgt[0]
    out["gn_ref_points"] = ref_points[0]
    out["gn_ref_normals"] = normals[0]
    out["gn_gt_params"] = gt_params[0]
    out["gn_dx"] = x1[0].numpy()  # x0=0, so x1 == dx

    # 5. Pose-matrix jacobian at random params
    params = rng.normal(0, 0.2, size=(3, 6))
    jac = pose.pose_matrix_jacobian(torch.from_numpy(params))
    out["pose_params"] = params
    out["pose_jacobian"] = jac.numpy()  # (3, 6, 4, 4)
    out["pose_matrices"] = pose.build_pose_matrix(
        torch.from_numpy(params)).numpy()

    # ------------------------------------------------------------------
    # 6. KITTI metrics on a synthetic noisy trajectory (the acceptance
    # instrument -- must match to the digit, SURVEY.md section 2.5)
    n_frames = 220
    yaw = np.cumsum(rng.normal(0.0, 0.01, n_frames))
    step = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n_frames)], -1) * 1.1
    pos = np.cumsum(step, axis=0)
    gt_abs = np.tile(np.eye(4), (n_frames, 1, 1))
    for i in range(n_frames):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        gt_abs[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        gt_abs[i, :3, 3] = pos[i]
    noise = rng.normal(0, 0.01, (n_frames, 3))
    pred_abs = gt_abs.copy()
    pred_abs[:, :3, 3] += noise
    tr_err, rot_err, errors = ref_eval.compute_kitti_metrics(
        pred_abs, gt_abs)
    rel_pred = ref_eval.compute_relative_poses(pred_abs)
    rel_gt = ref_eval.compute_relative_poses(gt_abs)
    ate, std_ate = ref_eval.compute_ate(rel_pred, rel_gt)
    are, std_are = ref_eval.compute_are(rel_pred, rel_gt)
    out["eval_pred_absolute"] = pred_abs
    out["eval_gt_absolute"] = gt_abs
    out["eval_tr_err"] = np.array(tr_err)
    out["eval_rot_err"] = np.array(rot_err)
    out["eval_ate"] = np.array([ate, std_ate])
    out["eval_are"] = np.array([are, std_are])

    dest = REPO / "tests" / "fixtures" / "reference_parity.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1e6:.2f} MB)")
    for k, v in out.items():
        print(f"  {k}: {getattr(v, 'shape', v)}")


if __name__ == "__main__":
    main()
