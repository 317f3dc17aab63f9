"""Records the reference implementation's FULL ICP odometry trajectories on
the 140-frame synthetic benchmark sequence as an end-to-end parity fixture.

Round-2 verdict: the north-star accuracy clause ("tr_err within 0.1%
absolute of the reference ICP", BASELINE.md) had only ever been *inferred*
from per-stage parity -- the reference's own odometry
(/root/reference/slam/odometry/icp_odometry.py:248-299 driven per frame as
slam/slam.py:118 does) had never been executed on the same input as this
repo's.  This script runs it (torch CPU) in both of its local-map modes:

  * projective frame-to-model (local_map.py:91-240), 15 iters -- the
    reference's GPU benchmark configuration class (kitti_benchmark.md:11);
  * kd-tree frame-to-model (local_map.py:244-446), map 30, 20 iters,
    neighborhood sigma=0.2, grid-sample 0.4 input -- the reference's BEST
    accuracy configuration class (kitti_benchmark.md:9).

with constant-velocity initialization (initialization.py:103-119), exactly
the frame-driving contract of the reference SLAM orchestrator, and records
trajectories + KITTI tr_err (computed with the reference's own
eval_odometry.py) into tests/fixtures/reference_e2e.npz.
tests/test_reference_parity.py::test_e2e_* then pin this repo's matching
configs within 0.1pt absolute tr_err -- measured, not inferred.

The reference's hydra / pykdtree / torchvision / open3d dependencies are
absent in this environment; minimal API shims below stand in for them (the
kd-tree shim is scipy's cKDTree, identical query semantics).

Usage: python scripts/generate_reference_e2e.py
"""
import dataclasses
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


# ----------------------------------------------------------------------------
# Dependency shims (API stand-ins only -- no reference logic reproduced here)
# ----------------------------------------------------------------------------

def install_shims():
    if "omegaconf" not in sys.modules:
        omega = types.ModuleType("omegaconf")
        omega.DictConfig = dict
        omega.MISSING = "???"

        class OmegaConf:
            @staticmethod
            def create(x=None):
                return x or {}

            @staticmethod
            def get_type(obj):
                return type(obj)

        omega.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = omega

    if "hydra" not in sys.modules:
        class _CS:
            """ConfigStore stand-in: store()/load() over a plain dict (the
            reference's RuntimeDefaultDict pulls group defaults from it)."""
            _inst = None

            def __init__(self):
                self.repo = {}

            @classmethod
            def instance(cls):
                if cls._inst is None:
                    cls._inst = cls()
                return cls._inst

            def store(self, name=None, node=None, group=None, **kw):
                key = f"{group}/{name}.yaml" if group else f"{name}.yaml"
                self.repo[key] = node

            def load(self, path):
                node = self.repo.get(path)
                if node is None:
                    return None
                if isinstance(node, type):
                    node = node()
                return types.SimpleNamespace(node=node)

        hydra = types.ModuleType("hydra")
        hconf = types.ModuleType("hydra.conf")
        hconf.dataclass = dataclasses.dataclass
        hconf.field = dataclasses.field
        hconf.MISSING = "???"
        hconf.ConfigStore = _CS
        hcore = types.ModuleType("hydra.core")
        hcs = types.ModuleType("hydra.core.config_store")
        hcs.ConfigStore = _CS
        hydra.conf = hconf
        hydra.core = hcore
        hcore.config_store = hcs
        sys.modules.update({"hydra": hydra, "hydra.conf": hconf,
                            "hydra.core": hcore,
                            "hydra.core.config_store": hcs})

    try:
        import pykdtree  # noqa: F401
    except ImportError:
        from scipy.spatial import cKDTree
        pyk = types.ModuleType("pykdtree")
        pykk = types.ModuleType("pykdtree.kdtree")

        class KDTree:
            def __init__(self, data, **kw):
                self._t = cKDTree(np.asarray(data))

            def query(self, pts, k=1, **kw):
                return self._t.query(np.asarray(pts), k=k)

        pykk.KDTree = KDTree
        pyk.kdtree = pykk
        sys.modules.update({"pykdtree": pyk, "pykdtree.kdtree": pykk})

    try:
        import torchvision  # noqa: F401
    except ImportError:
        import torch
        import torch.nn as nn
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvtf = types.ModuleType("torchvision.transforms.functional")

        def to_tensor(pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
            if t.dtype == torch.uint8:
                t = t.float().div(255)
            return t

        tvtf.to_tensor = to_tensor
        tvm = types.ModuleType("torchvision.models")
        tvmr = types.ModuleType("torchvision.models.resnet")

        def conv3x3(inp, out, stride=1, groups=1, dilation=1):
            return nn.Conv2d(inp, out, 3, stride=stride, padding=dilation,
                             groups=groups, bias=False, dilation=dilation)

        def conv1x1(inp, out, stride=1):
            return nn.Conv2d(inp, out, 1, stride=stride, bias=False)

        class BasicBlock(nn.Module):
            expansion = 1

            def __init__(self, inplanes, planes, stride=1, downsample=None,
                         groups=1, base_width=64, dilation=1, norm_layer=None):
                super().__init__()
                norm_layer = norm_layer or nn.BatchNorm2d
                self.conv1 = conv3x3(inplanes, planes, stride)
                self.bn1 = norm_layer(planes)
                self.relu = nn.ReLU(inplace=True)
                self.conv2 = conv3x3(planes, planes)
                self.bn2 = norm_layer(planes)
                self.downsample = downsample
                self.stride = stride

            def forward(self, x):
                idt = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                if self.downsample is not None:
                    idt = self.downsample(x)
                return self.relu(out + idt)

        class Bottleneck(nn.Module):
            expansion = 4

            def __init__(self, inplanes, planes, stride=1, downsample=None,
                         groups=1, base_width=64, dilation=1, norm_layer=None):
                super().__init__()
                norm_layer = norm_layer or nn.BatchNorm2d
                width = int(planes * (base_width / 64.0)) * groups
                self.conv1 = conv1x1(inplanes, width)
                self.bn1 = norm_layer(width)
                self.conv2 = conv3x3(width, width, stride, groups, dilation)
                self.bn2 = norm_layer(width)
                self.conv3 = conv1x1(width, planes * self.expansion)
                self.bn3 = norm_layer(planes * self.expansion)
                self.relu = nn.ReLU(inplace=True)
                self.downsample = downsample
                self.stride = stride

            def forward(self, x):
                idt = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                if self.downsample is not None:
                    idt = self.downsample(x)
                return self.relu(out + idt)

        tvmr.conv3x3 = conv3x3
        tvmr.conv1x1 = conv1x1
        tvmr.BasicBlock = BasicBlock
        tvmr.Bottleneck = Bottleneck
        tv.transforms = tvt
        tvt.functional = tvtf
        tv.models = tvm
        tvm.resnet = tvmr
        sys.modules.update({
            "torchvision": tv, "torchvision.transforms": tvt,
            "torchvision.transforms.functional": tvtf,
            "torchvision.models": tvm, "torchvision.models.resnet": tvmr})

    try:
        import open3d  # noqa: F401
    except ImportError:
        o3d = types.ModuleType("open3d")
        o3d.geometry = types.SimpleNamespace(PointCloud=object)

        def _no_io(*a, **k):
            raise RuntimeError("open3d shim: IO unavailable")

        o3d.io = types.SimpleNamespace(read_point_cloud=_no_io)
        o3d.pipelines = types.SimpleNamespace(
            registration=types.SimpleNamespace())
        o3d.utility = types.SimpleNamespace(Vector3dVector=lambda x: x)
        sys.modules["open3d"] = o3d


# ----------------------------------------------------------------------------

# The bench sequence (bench.py load_frames): 64x1024, 140 frames,
# 40 walls / 25 pillars, seed 0.
SEQ_KW = dict(lidar_height=64, lidar_width=1024, num_frames=140,
              num_walls=40, num_pillars=25)


def grid_sample_np(points: np.ndarray, voxel: float) -> np.ndarray:
    """1 point/voxel via spatial hash + first occurrence (the reference's
    GridSample preprocessing semantics, pointcloud.py:170-195, numpy)."""
    q = np.floor(points[:, :3] / voxel).astype(np.int64)
    h = (q[:, 0] * 73856093) ^ (q[:, 1] * 19349669) ^ (q[:, 2] * 83492791)
    _, idx = np.unique(h, return_index=True)
    return points[np.sort(idx)]


def run_reference_icp(frames, local_map_cfg, alignment_cfg, max_iters,
                      voxel=0.0, label=""):
    """Drives the reference ICPFrameToModel frame-by-frame with CV init
    (the reference SLAM contract: slam.py:118-144 + initialization CV)."""
    from slam.common.projection import SphericalProjector
    from slam.odometry.icp_odometry import (ICPFrameToModel,
                                            ICPFrameToModelConfig)

    projector = SphericalProjector(height=64, width=1024, num_channels=3,
                                   up_fov=3.0, down_fov=-24.0)
    cfg = ICPFrameToModelConfig(
        local_map=local_map_cfg,
        alignment=alignment_cfg,
        max_num_alignments=max_iters,
        data_key="numpy_pc")
    odom = ICPFrameToModel(cfg, projector=projector)
    odom.init()

    last_rpose = None
    t0 = time.time()
    for i, pc in enumerate(frames):
        if voxel > 0.0:
            pc = grid_sample_np(pc, voxel)
        d = {"numpy_pc": np.ascontiguousarray(pc, np.float32)}
        if last_rpose is not None:  # constant-velocity prior
            d["init_rpose"] = last_rpose
        odom.do_process_next_frame(d)
        if "odometry_pose" in d:
            last_rpose = d["odometry_pose"].reshape(4, 4)
        if (i + 1) % 20 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"  [{label}] frame {i + 1}/{len(frames)} "
                  f"({rate:.1f} scans/s)", flush=True)
    return np.stack(odom.absolute_poses)


def main():
    install_shims()
    sys.path.insert(0, str(REFERENCE))
    sys.path.insert(0, str(REPO))

    import torch
    torch.manual_seed(0)

    from slam.eval import eval_odometry as ref_eval
    from slam.odometry.alignment import GaussNewtonPointToPlaneConfig
    from slam.odometry.local_map import (KdTreeLocalMapConfig,
                                         ProjectiveLocalMapConfig)

    from pylidar_slam_tpu.dataset.synthetic import (SyntheticConfig,
                                                    SyntheticSequence)

    cfg = SyntheticConfig(**SEQ_KW)
    seq = SyntheticSequence(cfg, "synth_00", seed=cfg.seed)
    frames = [np.asarray(seq[i]["numpy_pc"], np.float32)
              for i in range(cfg.num_frames)]
    gt_abs = np.stack([np.asarray(seq[i]["absolute_pose_gt"], np.float64)
                       for i in range(cfg.num_frames)])
    gt_abs = np.linalg.inv(gt_abs[0]) @ gt_abs  # world = first frame

    out = {"seq_params": np.array([SEQ_KW["lidar_height"],
                                   SEQ_KW["lidar_width"],
                                   SEQ_KW["num_frames"],
                                   SEQ_KW["num_walls"],
                                   SEQ_KW["num_pillars"], cfg.seed]),
           "gt_absolute": gt_abs}

    # 1. Projective F2M: the reference's GPU benchmark config class
    #    (kitti_benchmark.md:11 -- map 20, 15 iters, p2plane GN defaults).
    print("reference projective F2M (15 iters, map 20) ...", flush=True)
    traj = run_reference_icp(
        frames,
        ProjectiveLocalMapConfig(local_map_size=20),
        # The reference's yaml alignment default: geman_mcclure sigma=0.3
        # (config/slam/odometry/alignment/point_to_plane_GN.yaml).
        GaussNewtonPointToPlaneConfig(
            gauss_newton_config=dict(max_iters=1, scheme="geman_mcclure",
                                     sigma=0.3)),
        max_iters=15, label="projective")
    tr_err, rot_err, _ = ref_eval.compute_kitti_metrics(traj, gt_abs)
    print(f"  projective: tr_err={tr_err:.6f} rot_err={rot_err:.6g}")
    out["projective_trajectory"] = traj
    out["projective_tr_err"] = np.array(tr_err)
    out["projective_rot_err"] = np.array(rot_err)

    # 2. KdTree F2M: the reference's best-accuracy config class
    #    (kitti_benchmark.md:9 -- map 30, 20 iters, neighborhood sigma=0.2,
    #    grid_sample 0.4).
    print("reference kdtree F2M (20 iters, map 30, grid 0.4) ...", flush=True)
    traj = run_reference_icp(
        frames,
        KdTreeLocalMapConfig(local_map_size=30),
        GaussNewtonPointToPlaneConfig(
            gauss_newton_config=dict(max_iters=1, scheme="neighborhood",
                                     sigma=0.2)),
        max_iters=20, voxel=0.4, label="kdtree")
    tr_err, rot_err, _ = ref_eval.compute_kitti_metrics(traj, gt_abs)
    print(f"  kdtree: tr_err={tr_err:.6f} rot_err={rot_err:.6g}")
    out["kdtree_trajectory"] = traj
    out["kdtree_tr_err"] = np.array(tr_err)
    out["kdtree_rot_err"] = np.array(rot_err)

    dest = REPO / "tests" / "fixtures" / "reference_e2e.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
