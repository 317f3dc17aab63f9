"""Per-stage parity against RECORDED reference intermediates.

tests/fixtures/reference_parity.npz holds the reference implementation's
outputs on deterministic synthetic inputs (generated offline by
scripts/generate_parity_fixtures.py, which runs /root/reference on torch CPU).
These tests assert our JAX ops reproduce each stage on the SAME inputs --
the recorded-intermediates harness of SURVEY.md section 7 ("hard parts" #1),
runnable with no dataset mounted and no reference checkout.

Intentional, documented differences:
  * z-buffer ties: the reference resolves equal-range pixel collisions by
    descending-sort scatter order (projection.py:403-415); we pick the
    lowest point index among range winners (deterministic).  Pixels can
    differ only where two points project identically at the same range.
  * normals: solve families agree; signs are arbitrary on both sides, so
    direction parity is |cos| ~ 1.
"""
import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "reference_parity.npz"


@pytest.fixture(scope="module")
def fx():
    assert FIXTURE.exists(), (
        "missing fixture -- run scripts/generate_parity_fixtures.py")
    return np.load(FIXTURE)


def test_vertex_map_parity(fx):
    from pylidar_slam_tpu.ops import projection
    h, w, up, down = fx["proj_params"]
    proj = projection.SphericalProjection(int(h), int(w), float(up),
                                          float(down))
    pc = fx["pointcloud"].astype(np.float32)
    ours = np.asarray(projection.build_vertex_map(jnp.asarray(pc), proj))
    ref = fx["vertex_map"]

    hit_ours = np.linalg.norm(ours, axis=-1) > 0
    hit_ref = np.linalg.norm(ref, axis=-1) > 0
    # identical pixel occupancy
    assert (hit_ours == hit_ref).mean() > 0.9999, "occupancy mismatch"
    both = hit_ours & hit_ref
    # the z-buffer keeps the closest point: per-pixel ranges must agree
    r_ours = np.linalg.norm(ours, axis=-1)[both]
    r_ref = np.linalg.norm(ref, axis=-1)[both]
    assert np.quantile(np.abs(r_ours - r_ref), 0.999) < 1e-4
    # and the winning points themselves agree except on exact range ties
    same_xyz = (np.abs(ours - ref).max(axis=-1) < 1e-4)[both]
    assert same_xyz.mean() > 0.999


def test_normal_map_parity(fx):
    from pylidar_slam_tpu.ops import geometry
    ref_vmap = fx["vertex_map"].astype(np.float32)
    ours = np.asarray(geometry.compute_normal_map(jnp.asarray(ref_vmap), 5))
    ref = fx["normal_map"]
    valid_ours = np.linalg.norm(ours, axis=-1) > 0.5
    valid_ref = np.linalg.norm(ref, axis=-1) > 0.5
    # the two solves agree EXACTLY on which pixels admit a normal
    assert (valid_ours == valid_ref).all()
    valid = valid_ours & valid_ref
    assert valid.mean() > 0.5
    cos = np.abs(np.sum(ours * ref, axis=-1))[valid]
    # ~92% of pixels agree to cos > 0.99; the remainder are depth
    # discontinuities where the boxed covariance is near-singular and the
    # f32 summation order legitimately flips the ill-determined direction.
    assert np.median(cos) > 0.999
    assert np.quantile(cos, 0.1) > 0.98
    assert cos.mean() > 0.97


def test_robust_scheme_parity(fx):
    from pylidar_slam_tpu.ops import optimization
    res = jnp.asarray(fx["scheme_residuals"])
    for scheme in ("huber", "geman_mcclure", "cauchy"):
        ours = np.asarray(optimization.robust_weights(scheme, res, 0.3))
        np.testing.assert_allclose(ours, fx[f"scheme_weights_{scheme}"],
                                   rtol=1e-6, atol=1e-8, err_msg=scheme)
    # neighborhood: reference weights exp(-||q-p||^2 / sigma^2)
    sq_d = np.sum((fx["scheme_nb_target"] - fx["scheme_nb_reference"]) ** 2,
                  axis=-1)
    ours = np.asarray(optimization.robust_weights(
        "neighborhood", res, 0.2, sq_dists=jnp.asarray(sq_d)))
    np.testing.assert_allclose(ours, fx["scheme_weights_neighborhood"],
                               rtol=1e-6, atol=1e-8)


def test_gauss_newton_step_parity(fx):
    from pylidar_slam_tpu.ops import optimization
    tgt = jnp.asarray(fx["gn_target_points"])
    ref = jnp.asarray(fx["gn_ref_points"])
    nrm = jnp.asarray(fx["gn_ref_normals"])
    zero = jnp.zeros(6, tgt.dtype)
    res = optimization.point_to_plane_residuals(zero, tgt, ref, nrm)
    jac = optimization.point_to_plane_jacobian(zero, tgt, nrm)
    dx, _, singular = optimization.gauss_newton_step(
        res, jac, jnp.ones_like(res))
    assert not bool(singular)
    np.testing.assert_allclose(np.asarray(dx), fx["gn_dx"],
                               rtol=1e-5, atol=1e-8)


def test_pose_matrix_and_jacobian_parity(fx):
    from pylidar_slam_tpu.ops import rotation, se3
    params = jnp.asarray(fx["pose_params"])
    mats = np.asarray(se3.build_pose_matrix(params))
    np.testing.assert_allclose(mats, fx["pose_matrices"], rtol=1e-6,
                               atol=1e-10)
    jac = np.asarray(rotation.pose_matrix_jacobian(params))
    np.testing.assert_allclose(jac, fx["pose_jacobian"], rtol=1e-6,
                               atol=1e-10)


def test_eval_metrics_parity(fx):
    """The acceptance instrument must match the reference to the digit
    (SURVEY.md section 2.5)."""
    from pylidar_slam_tpu.eval import eval_odometry as ev
    pred = fx["eval_pred_absolute"]
    gt = fx["eval_gt_absolute"]
    tr_err, rot_err, _ = ev.compute_kitti_metrics(pred, gt)
    np.testing.assert_allclose(tr_err, float(fx["eval_tr_err"]), rtol=1e-10)
    np.testing.assert_allclose(rot_err, float(fx["eval_rot_err"]), rtol=1e-10)
    rel_pred = ev.compute_relative_poses(pred)
    rel_gt = ev.compute_relative_poses(gt)
    ate, std_ate = ev.compute_ate(rel_pred, rel_gt)
    are, std_are = ev.compute_are(rel_pred, rel_gt)
    np.testing.assert_allclose([ate, std_ate], fx["eval_ate"], rtol=1e-10)
    np.testing.assert_allclose([are, std_are], fx["eval_are"], rtol=1e-10)


# ----------------------------------------------------------------------------
# End-to-end accuracy vs the reference's OWN full ICP odometry
# (fixture from scripts/generate_reference_e2e.py: the reference
# ICPFrameToModel, torch CPU, driven frame-by-frame with CV init over the
# 140-frame synthetic benchmark sequence).  This measures the north-star
# clause directly: our tr_err must be within 0.1pt ABSOLUTE of the
# reference ICP on the same input (BASELINE.md).
# ----------------------------------------------------------------------------

E2E_FIXTURE = Path(__file__).parent / "fixtures" / "reference_e2e.npz"


@pytest.fixture(scope="module")
def e2e():
    assert E2E_FIXTURE.exists(), (
        "missing fixture -- run scripts/generate_reference_e2e.py")
    return np.load(E2E_FIXTURE)


OURS_FIXTURE = Path(__file__).parent / "fixtures" / "ours_e2e.npz"


def test_e2e_accuracy_vs_reference_projective(e2e):
    """Aggregated-map odometry (our throughput flagship: geman_mcclure 0.4
    on dense full clouds, motion-gated 8-iter schedule, rimg8 upload -- the
    EXACT bench.py recorded config) vs the reference's projective F2M run on
    the SAME sequence: within 0.1pt absolute tr_err (reference
    icp_odometry.py:248-299 + local_map.py:91-240, recorded by
    scripts/generate_reference_e2e.py).

    Verified against the trajectory RECORDED on the TPU (the deployment
    platform) by scripts/record_e2e_ours.py: the same f32 program measures
    0.140% there vs 0.269% on the CPU backend (reduction-order-sensitive
    trajectory divergence -- both valid f32, the acceptance claim is for the
    device the framework targets).  Live CPU execution of this config class
    is covered by test_slam_e2e.py::test_aggregated_odometry_tracks_*."""
    from pylidar_slam_tpu.eval.eval_odometry import compute_kitti_metrics

    assert OURS_FIXTURE.exists(), (
        "missing fixture -- run scripts/record_e2e_ours.py (on the TPU)")
    ours = np.load(OURS_FIXTURE)
    np.testing.assert_array_equal(ours["seq_params"], e2e["seq_params"])
    np.testing.assert_allclose(ours["gt_absolute"], e2e["gt_absolute"],
                               atol=1e-9)

    traj = ours["aggregated_trajectory"]
    tr_err, _, _ = compute_kitti_metrics(traj, ours["gt_absolute"])
    np.testing.assert_allclose(tr_err, float(ours["aggregated_tr_err"]),
                               atol=1e-9)  # fixture integrity
    ref = float(e2e["projective_tr_err"])
    assert tr_err <= ref + 0.001, (
        f"ours {tr_err:.6f} vs reference projective {ref:.6f} "
        f"(+0.1pt bar {ref + 0.001:.6f})")


def test_bench_config_is_the_champion(monkeypatch):
    """The config bench.py times (and the driver records) must BE the
    config whose recorded trajectory the accuracy tests verify -- otherwise
    the two north-star clauses could be met by different configs without
    any test noticing.  Asserts structural equality under default env."""
    import bench

    for k in list(os.environ):
        if k.startswith("BENCH_"):
            monkeypatch.delenv(k)
    from pylidar_slam_tpu.eval import acceptance
    champ = acceptance.champion_configs()["aggregated"]
    got = bench.build_icp_config("aggregated", "rimg8")
    assert got == champ, (
        "bench.py's recorded aggregated config no longer matches "
        "acceptance.champion_configs()['aggregated'] -- re-align them and "
        "re-record the fixture (scripts/record_e2e_ours.py)")


def test_e2e_bench_config_meets_kdtree_bar(e2e):
    """North-star: ONE config meets BOTH clauses against the reference's
    BEST mode.  The aggregated trajectory in ours_e2e.npz is recorded at the
    exact bench.py config (equality pinned by
    test_bench_config_is_the_champion; staleness by the code stamp); the
    driver measures that config at >=200 scans/s (BENCH_r05.json), and this
    test pins its accuracy within 0.1pt absolute of the reference's kd-tree
    CHAMPION (not merely its projective class) on the same 140-frame
    sequence (reference local_map.py:244-446, the winner of the reference's
    own benchmark)."""
    from pylidar_slam_tpu.eval.eval_odometry import compute_kitti_metrics

    assert OURS_FIXTURE.exists(), (
        "missing fixture -- run scripts/record_e2e_ours.py (on the TPU)")
    ours = np.load(OURS_FIXTURE)
    traj = ours["aggregated_trajectory"]
    tr_err, _, _ = compute_kitti_metrics(traj, ours["gt_absolute"])
    ref_best = float(e2e["kdtree_tr_err"])
    assert tr_err <= ref_best + 0.001, (
        f"bench config {tr_err:.6f} vs reference kd-tree champion "
        f"{ref_best:.6f} (+0.1pt bar {ref_best + 0.001:.6f})")


def test_e2e_accuracy_vs_reference_kdtree(e2e):
    """Surfel-map ('kdtree') odometry vs the reference's BEST config (kd-tree
    F2M, map 30, 20 iters, neighborhood 0.2, grid 0.4) on the SAME sequence:
    within 0.1pt absolute tr_err (reference local_map.py:244-446).

    The full-scale surfel run (16384 targets x ~123k map points of exact NN
    x 20 iters x 140 frames) takes hours on the single-CPU CI host, so this
    test verifies the trajectory RECORDED on the TPU by
    scripts/record_e2e_ours.py: sequence identity is pinned against the
    reference fixture, the metric is recomputed here from the raw recorded
    trajectory, and a scaled-down live surfel execution is covered by
    test_slam_e2e.py::test_surfel_kdtree_odometry_tracks_synthetic."""
    from pylidar_slam_tpu.eval.eval_odometry import compute_kitti_metrics

    assert OURS_FIXTURE.exists(), (
        "missing fixture -- run scripts/record_e2e_ours.py (on the TPU)")
    ours = np.load(OURS_FIXTURE)
    # Same sequence as the reference fixture (GT pinned bit-for-bit).
    np.testing.assert_array_equal(ours["seq_params"], e2e["seq_params"])
    np.testing.assert_allclose(ours["gt_absolute"], e2e["gt_absolute"],
                               atol=1e-9)

    traj = ours["surfel_trajectory"]
    tr_err, _, _ = compute_kitti_metrics(traj, ours["gt_absolute"])
    np.testing.assert_allclose(tr_err, float(ours["surfel_tr_err"]),
                               atol=1e-9)  # fixture integrity
    ref = float(e2e["kdtree_tr_err"])
    assert tr_err <= ref + 0.001, (
        f"ours {tr_err:.6f} vs reference kdtree {ref:.6f} "
        f"(+0.1pt bar {ref + 0.001:.6f})")


def test_e2e_fixture_stamp_matches_current_code():
    """The recorded device fixture must correspond to the CURRENT champion
    code paths: the stamp hashes both champion configs' traced per-frame
    computations (jax.make_jaxpr), so any semantic change to the
    ICP/map/optimization code invalidates the fixture until
    scripts/record_e2e_ours.py is re-run on the device (kills the
    silent-stale-fixture hole -- a refactor can no longer keep acceptance
    green against a trajectory the code would not reproduce)."""
    from pylidar_slam_tpu.eval import acceptance

    assert OURS_FIXTURE.exists(), (
        "missing fixture -- run scripts/record_e2e_ours.py (on the TPU)")
    ours = np.load(OURS_FIXTURE)
    assert "stamp" in ours.files, (
        "fixture predates stamping -- re-record with scripts/record_e2e_ours.py")
    recorded = bytes(ours["stamp"]).decode()
    current = acceptance.code_stamp()
    assert recorded == current, (
        f"ours_e2e.npz was recorded under code stamp {recorded[:12]}... but "
        f"the current champion code path traces to {current[:12]}... -- "
        f"re-record the fixture on the device: python scripts/record_e2e_ours.py")
