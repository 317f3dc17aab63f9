"""Runner infrastructure: multi-worker prefetcher + transfer-guard sanitizer
(the SURVEY.md section 5.2 race/sanitizer equivalents -- the reference has
none; ours are test infrastructure)."""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pylidar_slam_tpu.slam.odometry_runner import _Prefetcher


class _SlowDataset:
    def __init__(self, n, delay=0.002):
        self.n = n
        self.delay = delay
        self.loads = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        self.loads.append(i)
        return {"idx": i}


def test_prefetcher_ordered_multiworker():
    ds = _SlowDataset(40)
    out = [d["idx"] for d in _Prefetcher(ds, depth=8, num_workers=4)]
    assert out == list(range(40))
    assert sorted(ds.loads) == list(range(40))


def test_prefetcher_single_worker_sequential_loads():
    """num_workers=1 must LOAD strictly sequentially (rosbag contract)."""
    ds = _SlowDataset(10)
    out = [d["idx"] for d in _Prefetcher(ds, depth=3, num_workers=1)]
    assert out == list(range(10))
    assert ds.loads == list(range(10))


def test_prefetcher_max_frames_and_errors():
    ds = _SlowDataset(20)
    out = [d["idx"] for d in _Prefetcher(ds, max_frames=5, num_workers=3)]
    assert out == list(range(5))

    class _Bad(_SlowDataset):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(_Prefetcher(_Bad(10), num_workers=2))


def test_fused_step_no_implicit_transfers():
    """Sanitizer: the fused ICP step must not trigger implicit host<->device
    transfers once inputs are on device (jax transfer guard, the analog of
    the reference's absent race/sanitizer tooling, SURVEY section 5.2)."""
    from pylidar_slam_tpu.config import dataclass_from_dict
    from pylidar_slam_tpu.ops import projection
    from pylidar_slam_tpu.slam.odometry import aggregated_map as am

    proj = projection.SphericalProjection(32, 256, 3.0, -24.0)
    cfg = dataclass_from_dict(am.AggregatedLocalMapConfig,
                              {"type": "aggregated_local_map"})
    step, first, _ = am.make_agg_icp_frame_step(
        proj, cfg, max_num_alignments=3, reassoc_every=2,
        threshold_delta_pose=1e-4, threshold_trans=0.1, threshold_rot=0.3,
        gn_scheme="neighborhood", gn_sigma=0.2)
    state = am.init_agg_map(32, 256)
    pts = jax.device_put(jnp.zeros((16384, 3), jnp.float32))
    msk = jax.device_put(jnp.ones((16384,), bool))
    eye = jax.device_put(jnp.eye(4, dtype=jnp.float32))
    state = jax.device_put(state)
    # warm up the compile OUTSIDE the guard (compilation may transfer)
    out = step(jax.tree.map(jnp.array, state), jnp.array(eye), pts, msk, eye)
    jax.block_until_ready(out[2])
    with jax.transfer_guard("disallow"):
        out = step(jax.tree.map(jnp.array, state), jnp.array(eye), pts, msk,
                   eye)
        jax.block_until_ready(out[2])


@pytest.mark.slow
@pytest.mark.nightly
def test_multirun_parallel_jobs(tmp_path):
    """`-m parallel_jobs=N`: sweep jobs run concurrently, each pinned to its
    own device via jax.default_device round-robin (SURVEY section 5.8c --
    the sequence-parallel replacement for the reference's multirun across
    processes).  Verifies both jobs complete, write their own dated job
    dirs + overrides stamps, and produce metrics."""
    import run as run_cli

    sweep_root = tmp_path / "sweep"
    results = run_cli.main([
        "-m", "dataset=synthetic", "dataset.num_frames=6",
        "dataset.lidar_height=32", "dataset.lidar_width=256",
        "slam.odometry.max_num_alignments=2",
        "slam.odometry.num_points_padded=8192",
        "slam/odometry/local_map=aggregated",
        "dataset.speed=0.9,1.1",  # the sweep axis -> 2 jobs
        "parallel_jobs=2",
        f"log_dir={sweep_root}",
    ])
    assert len(results) == 2
    for idx in range(2):
        job_dir = sweep_root / str(idx)
        assert (job_dir / ".hydra" / "overrides.yaml").exists()
        assert (job_dir / "metrics.yaml").exists()
        # 6 frames is shorter than the 100 m KITTI segments, so tr_err is
        # not computable -- completion is proven by the saved trajectory.
        assert (job_dir / "synth_00.poses.txt").exists()
