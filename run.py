"""SLAM entry point (reference run.py CLI surface).

Usage (same override grammar as the reference's hydra CLI):

    python run.py dataset=kitti slam/odometry=icp_odometry \
        slam.odometry.local_map.local_map_size=30 num_workers=4

Composes ``config/slam.yaml`` with the command-line overrides, builds a
``SLAMRunner`` and runs odometry + evaluation over the dataset sequences.
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from pylidar_slam_tpu.config import compose
from pylidar_slam_tpu.slam.odometry_runner import SLAMRunner, SLAMRunnerConfig
from pylidar_slam_tpu.config import dataclass_from_dict


def run_slam(cfg: dict):
    runner = SLAMRunner(dataclass_from_dict(SLAMRunnerConfig, cfg))
    metrics = runner.run_odometry()
    for seq, m in metrics.items():
        print(f"[{seq}] " + " ".join(f"{k}={v:.6g}" for k, v in m.items()))
    return metrics


def _stamp_hydra_dir(log_dir: str, overrides: list):
    """Writes .hydra/overrides.yaml so sweep tooling (build_benchmark_md.py)
    can resurface the command line (reference keeps the same contract)."""
    import yaml
    hydra_dir = Path(log_dir) / ".hydra"
    hydra_dir.mkdir(parents=True, exist_ok=True)
    with open(hydra_dir / "overrides.yaml", "w") as f:
        yaml.safe_dump(list(overrides), f)


def _split_sweep(argv: list):
    """Separates sweep overrides (key=v1,v2,...) from fixed ones."""
    keys, value_sets, fixed = [], [], []
    for ov in argv:
        if "=" not in ov:
            raise ValueError(f"Malformed override '{ov}' (expected key=value)")
        key, value = ov.split("=", 1)
        if "," in value and not value.startswith(("[", "{", '"', "'")):
            keys.append(key)
            value_sets.append(value.split(","))
        else:
            fixed.append(ov)
    return keys, value_sets, fixed


def run_multirun(config_dir: Path, argv: list):
    """Hydra-style `-m` sweep: cartesian product of comma-separated override
    values, one dated job dir per combination (reference docs/benchmark.md
    sweeps + config/hydra/output/slam.yaml templating).

    `parallel_jobs=N` (consumed here, not part of the SLAM config) runs N
    jobs concurrently, each pinned to its own accelerator via
    ``jax.default_device`` round-robin over the visible devices -- the
    TPU-native replacement for the reference's multirun-across-processes
    workflow (SURVEY.md section 5.8c: different sequences/sweep points on
    different chips; device compute overlaps across the job threads).
    `parallel_jobs=auto` uses every visible device."""
    import datetime
    import itertools

    keys, value_sets, fixed = _split_sweep(argv)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d/%H-%M-%S")
    sweep_root = Path(".outputs/multirun") / stamp
    parallel_jobs = 1
    # log_dir becomes the sweep root; parallel_jobs is a runner knob.
    for ov in list(fixed):
        if ov.startswith("log_dir="):
            sweep_root = Path(ov.split("=", 1)[1])
            fixed.remove(ov)
        elif ov.startswith("parallel_jobs="):
            value = ov.split("=", 1)[1]
            parallel_jobs = 0 if value == "auto" else int(value)
            fixed.remove(ov)

    combos = list(itertools.product(*value_sets)) if keys else [()]
    print(f"[multirun] {len(combos)} jobs -> {sweep_root}")

    def one_job(idx, combo, device=None):
        job_overrides = fixed + [f"{k}={v}" for k, v in zip(keys, combo)]
        job_dir = sweep_root / str(idx)
        cfg = compose(str(config_dir), "slam",
                      job_overrides + [f"log_dir={job_dir}"])
        _stamp_hydra_dir(str(job_dir), job_overrides)
        print(f"[multirun] job {idx}: {' '.join(job_overrides)}"
              + (f" [device {device}]" if device is not None else ""))
        if device is None:
            return run_slam(cfg)
        import jax
        with jax.default_device(device):
            return run_slam(cfg)

    if parallel_jobs == 1 or len(combos) == 1:
        return [one_job(i, c) for i, c in enumerate(combos)]

    import concurrent.futures

    import jax
    devices = jax.devices()
    n_workers = min(len(devices) if parallel_jobs == 0 else parallel_jobs,
                    len(combos))
    print(f"[multirun] {n_workers} parallel workers over "
          f"{len(devices)} device(s)")
    with concurrent.futures.ThreadPoolExecutor(n_workers) as pool:
        futures = [pool.submit(one_job, i, c, devices[i % len(devices)])
                   for i, c in enumerate(combos)]
        return [f.result() for f in futures]


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    argv = list(argv if argv is not None else sys.argv[1:])
    config_dir = Path(__file__).parent / "config"
    multirun = False
    for flag in ("-m", "--multirun"):
        while flag in argv:
            argv.remove(flag)
            multirun = True
    if multirun:
        return run_multirun(config_dir, argv)
    cfg = compose(str(config_dir), "slam", argv)
    _stamp_hydra_dir(str(cfg.get("log_dir", ".")), argv)
    return run_slam(cfg)


if __name__ == "__main__":
    main()
