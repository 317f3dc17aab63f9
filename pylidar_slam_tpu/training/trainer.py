"""PoseNet trainer: optax AdamW + multi-step LR, fused jitted train step,
checkpoint/resume, optional data parallelism over a device mesh.

Capability match of reference slam/training/trainer.py (ATrainer): optimizer
zoo (adam/adamw/sgd/rmsprop), MultiStepLR-style schedule (x0.5 every
`scheduler_milestones` epochs), per-epoch train/eval loops with average
meters and NaN guards, checkpoint dict restored on init, config.yaml + git
hash stamping.  TPU-first differences:

* The ENTIRE step -- vertex-map rasterization of the padded point-cloud pair,
  ResNet forward, loss, backward, optimizer update -- is one jitted function.
* Data parallelism is jit-with-sharding over a ``jax.sharding.Mesh`` ("dp"
  axis): batch sharded across devices, XLA inserts the gradient psum.  This
  replaces the reference's absent DDP (its TODO at trainer.py:101).
"""
from __future__ import annotations

import dataclasses
import logging
import pickle
import queue
import subprocess
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from pylidar_slam_tpu.config import MISSING, dataclass_from_dict
from pylidar_slam_tpu.ops import projection
from pylidar_slam_tpu.training import loss_modules
from pylidar_slam_tpu.training.prediction_modules import (
    PoseNetPredictionModule, PredictionConfig, relative_ground_truth)
from pylidar_slam_tpu.utils import assert_debug

logger = logging.getLogger(__name__)


@dataclass
class ATrainerConfig:
    """Field names mirror reference trainer.py:45-91."""
    train_dir: str = ".train"
    num_epochs: int = 100
    batch_size: int = 4
    eval_batch_size: int = 4
    optimizer_type: str = "adamw"  # adam | adamw | sgd | rmsprop
    optimizer_learning_rate: float = 1.0e-4
    optimizer_beta: float = 0.9
    optimizer_weight_decay: float = 1.0e-3  # important for PoseNet stability
    optimizer_momentum: float = 0.9
    optimizer_scheduler_decay: float = 0.5
    optimizer_scheduler_milestones: int = 20  # epochs between LR decays
    num_workers: int = 2
    device: str = "tpu"
    do_train: bool = True
    do_eval: bool = True
    average_meter_frequency: int = 20
    num_points_padded: int = 131072
    data_parallel: bool = False  # shard batches over all visible devices
    tensor_parallel: int = 1  # split weight feature dims over a "tp" mesh axis
    seed: int = 0
    # TensorBoard logging (reference trainer.py:466-518): per-KIND
    # frequencies per split; 0 disables a kind.  Uses
    # torch.utils.tensorboard when importable.
    with_tensorboard: bool = True
    tensorboard_scalar_frequency: int = 20
    # Parameter histograms (reference logs weight/gradient histograms at a
    # lower cadence -- they fetch every parameter to host).
    tensorboard_histogram_frequency: int = 200
    # Vertex-map images: the first sample's previous/current range images,
    # colormapped (the reference's add_image + cv2 ImageVisualizer hook,
    # trainer.py:249-250, 505-518).
    tensorboard_image_frequency: int = 500
    # Live/persisted image visualization via viz.ImageVisualizer (PNGs under
    # train_dir/viz, cv2 window when available) at the image frequency.
    visualize: bool = False


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n

    @property
    def average(self) -> float:
        return self.sum / max(self.count, 1)


def _git_hash() -> str:
    try:
        return subprocess.check_output(["git", "rev-parse", "HEAD"],
                                       stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def make_optimizer(cfg: ATrainerConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.optimizer_learning_rate,
        transition_steps=1,  # stepped per-epoch via a scale-by-schedule below
        decay_rate=1.0)

    def lr_for_epoch(epoch: int) -> float:
        decays = epoch // max(cfg.optimizer_scheduler_milestones, 1)
        return cfg.optimizer_learning_rate * (cfg.optimizer_scheduler_decay ** decays)

    # The LR is injected per-epoch (MultiStepLR semantics) via inject_hyperparams.
    def build(lr):
        if cfg.optimizer_type == "adam":
            return optax.adam(lr, b1=cfg.optimizer_beta)
        if cfg.optimizer_type == "adamw":
            return optax.adamw(lr, b1=cfg.optimizer_beta,
                               weight_decay=cfg.optimizer_weight_decay)
        if cfg.optimizer_type == "sgd":
            return optax.sgd(lr, momentum=cfg.optimizer_momentum)
        if cfg.optimizer_type == "rmsprop":
            return optax.rmsprop(lr, momentum=cfg.optimizer_momentum)
        raise KeyError(f"Unknown optimizer {cfg.optimizer_type}")

    opt = optax.inject_hyperparams(
        lambda learning_rate: build(learning_rate))(
        learning_rate=cfg.optimizer_learning_rate)
    opt.lr_for_epoch = lr_for_epoch  # type: ignore[attr-defined]
    return opt


class PoseNetTrainer:
    """Trains PoseNet supervised or unsupervised on windowed scan pairs."""

    def __init__(self, config: ATrainerConfig,
                 prediction_config: PredictionConfig,
                 loss_config: Any,
                 dataset_loader,
                 proj: Optional[projection.SphericalProjection] = None):
        self.config = config
        self.dataset_loader = dataset_loader
        self.proj = proj if proj is not None else dataset_loader.projector()
        self.prediction = PoseNetPredictionModule(prediction_config)
        self.loss_config = loss_config
        self.is_supervised = getattr(loss_config, "mode", "supervised") == "supervised"

        self.train_dir = Path(config.train_dir)
        self.train_dir.mkdir(parents=True, exist_ok=True)

        self.params = None
        self.batch_stats = None
        self.exp_s = None  # learned uncertainty weights (supervised)
        self.opt_state = None
        self.optimizer = make_optimizer(config)
        self.num_train_epochs = 0
        self.train_iter = 0
        self.eval_iter = 0

        self._train_step = None
        self._eval_step = None
        self._sharding = None
        self._tb_writer = None
        self._image_visualizer = None

    def _tensorboard(self):
        """Lazy TensorBoard writer (no-op when unavailable/disabled)."""
        if not self.config.with_tensorboard or \
                self.config.tensorboard_scalar_frequency <= 0:
            return None
        if self._tb_writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb_writer = SummaryWriter(
                    log_dir=str(self.train_dir / "tensorboard"))
            except ImportError:
                self.config.with_tensorboard = False
                return None
        return self._tb_writer

    def _log_scalars(self, prefix: str, logs: dict, step: int):
        writer = self._tensorboard()
        if writer is None:
            return
        for key, value in logs.items():
            try:
                writer.add_scalar(f"{prefix}/{key}", float(value), step)
            except (TypeError, ValueError):
                pass

    def _log_histograms(self, prefix: str, trainable, step: int):
        """Parameter histograms per weight tensor (reference
        trainer.py:466-518 logs histograms at their own frequency)."""
        writer = self._tensorboard()
        if writer is None:
            return
        flat = jax.tree_util.tree_leaves_with_path(trainable)
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            try:
                writer.add_histogram(f"{prefix}/{name}",
                                     np.asarray(leaf).ravel(), step)
            except (TypeError, ValueError):
                pass

    def _log_images(self, prefix: str, points, masks, step: int):
        """Colormapped range images of the first window pair (the
        reference's vertex-map add_image + cv2 ImageVisualizer hook,
        trainer.py:249-250, 505-518)."""
        writer = self._tensorboard()
        want_viz = bool(self.config.visualize)
        if writer is None and not want_viz:
            return
        from pylidar_slam_tpu.viz.color_map import tensor_to_image
        for si in range(min(2, points.shape[1])):
            vm = np.asarray(projection.build_vertex_map(
                jnp.asarray(points[0, si]), self.proj,
                mask=jnp.asarray(masks[0, si])))
            rng_img = np.linalg.norm(vm, axis=-1)
            img = tensor_to_image(rng_img)  # (H, W, 3) uint8
            if writer is not None:
                try:
                    writer.add_image(f"{prefix}/vertex_map_{si}", img, step,
                                     dataformats="HWC")
                except (TypeError, ValueError):
                    pass
            if want_viz:
                if self._image_visualizer is None:
                    from pylidar_slam_tpu.viz.visualizer import ImageVisualizer
                    self._image_visualizer = ImageVisualizer(
                        output_dir=str(self.train_dir / "viz"),
                        use_window=True)
                self._image_visualizer.update(rng_img,
                                              tag=f"{prefix[1:]}_vm{si}")

    # ------------------------------------------------------------------
    # Initialization / checkpointing (contract: {train_dir}/checkpoint.ckp
    # + config.yaml, consumed read-only by posenet odometry/initialization)
    # ------------------------------------------------------------------

    def init(self):
        h, w = self.proj.height, self.proj.width
        net_cfg = self.prediction.net_config
        sample_shape = (1, net_cfg.sequence_len, net_cfg.num_input_channels, h, w)
        rng = jax.random.PRNGKey(self.config.seed)
        self.params, self.batch_stats = self.prediction.init_params(rng, sample_shape)
        if self.is_supervised and getattr(self.loss_config, "with_exp_weights", False):
            self.exp_s = jnp.asarray(self.loss_config.init_weights, jnp.float32)
        self.opt_state = self.optimizer.init(self._trainable())

        ckpt = self.train_dir / "checkpoint.ckp"
        if ckpt.exists():
            self.load_checkpoint(str(ckpt))
            logger.info("Restored checkpoint at epoch %d", self.num_train_epochs)

        with open(self.train_dir / "config.yaml", "w") as f:
            yaml.safe_dump({
                "git_hash": _git_hash(),
                "trainer": _plain(self.config),
                "prediction": _plain(self.prediction.config),
                "loss": _plain(self.loss_config),
                "projector": {"height": h, "width": w,
                              "up_fov": self.proj.up_fov,
                              "down_fov": self.proj.down_fov},
            }, f)

        self._build_steps()

    def _trainable(self):
        if self.exp_s is not None:
            return {"params": self.params, "exp_s": self.exp_s}
        return {"params": self.params}

    def _set_trainable(self, tree):
        self.params = tree["params"]
        if "exp_s" in tree:
            self.exp_s = tree["exp_s"]

    def save_checkpoint(self):
        state = {
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
            "exp_s": jax.device_get(self.exp_s) if self.exp_s is not None else None,
            "opt_state": jax.device_get(self.opt_state),
            "num_train_epochs": self.num_train_epochs,
            "train_iter": self.train_iter,
            "eval_iter": self.eval_iter,
        }
        with open(self.train_dir / "checkpoint.ckp", "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.device_put(state["params"])
        self.batch_stats = jax.device_put(state["batch_stats"])
        if state.get("exp_s") is not None:
            self.exp_s = jax.device_put(state["exp_s"])
        self.opt_state = jax.device_put(state["opt_state"])
        self.num_train_epochs = state["num_train_epochs"]
        self.train_iter = state.get("train_iter", 0)
        self.eval_iter = state.get("eval_iter", 0)

    # ------------------------------------------------------------------
    # The fused train step
    # ------------------------------------------------------------------

    def _loss_fn(self, trainable, batch_stats, points, masks, gt, train: bool):
        """points (B, 2, N, 3), masks (B, 2, N), gt (B, 2, 4, 4) or None."""
        b, s, n, _ = points.shape

        def raster(p, m):
            return projection.build_vertex_map(p, self.proj, mask=m)

        vmaps = jax.vmap(jax.vmap(raster))(points, masks)  # (B, 2, H, W, 3)
        vmaps = vmaps.transpose(0, 1, 4, 2, 3)  # (B, 2, 3, H, W)

        pose_params, pose_matrix, new_stats = self.prediction.apply(
            trainable["params"], batch_stats, vmaps, train=train)

        if self.is_supervised:
            rel_gt = relative_ground_truth(gt)
            loss, logs = loss_modules.supervised_loss(
                pose_params, rel_gt, self.loss_config,
                exp_s=trainable.get("exp_s"))
        else:
            loss_cfg = self.loss_config
            scheme_cfg = dict(getattr(loss_cfg, "least_square_scheme", {}) or {})
            loss, logs = loss_modules.point_to_plane_loss(
                vmaps, pose_params, self.proj,
                scheme=scheme_cfg.get("scheme", "geman_mcclure"),
                sigma=float(scheme_cfg.get("sigma", 0.5)))
        return loss, (logs, new_stats)

    def _build_steps(self):
        optimizer = self.optimizer

        def train_step(trainable, batch_stats, opt_state, points, masks, gt):
            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(trainable, batch_stats,
                                             points, masks, gt, True)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, new_stats, opt_state, loss, logs

        def eval_step(trainable, batch_stats, points, masks, gt):
            loss, (logs, _) = self._loss_fn(trainable, batch_stats,
                                            points, masks, gt, False)
            return loss, logs

        tp = max(1, int(self.config.tensor_parallel or 1))
        n_dev = len(jax.devices())
        if tp > 1 and n_dev > 1:
            # dp x tp mesh: batches sharded over "dp", weight feature dims
            # over "tp" (parallel/tp.py).  Parameters + optimizer moments are
            # committed with their shardings once; GSPMD propagates layouts
            # through the fused step and inserts the collectives on ICI.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            from pylidar_slam_tpu.parallel.tp import shard_param_tree
            assert_debug(n_dev % tp == 0,
                         f"tensor_parallel={tp} does not divide {n_dev} devices")
            dp = n_dev // tp
            mesh = Mesh(np.array(jax.devices()).reshape(dp, tp), ("dp", "tp"))
            self._sharding = NamedSharding(mesh, P("dp"))
            self.params = shard_param_tree(self.params, mesh)
            self.batch_stats = shard_param_tree(self.batch_stats, mesh)
            self.opt_state = shard_param_tree(self.opt_state, mesh)
            if self.exp_s is not None:
                self.exp_s = jax.device_put(self.exp_s, NamedSharding(mesh, P()))
            self._train_step = jax.jit(
                train_step,
                in_shardings=(None, None, None,  # keep committed placements
                              self._sharding, self._sharding, self._sharding))
            self._eval_step = jax.jit(
                eval_step,
                in_shardings=(None, None,
                              self._sharding, self._sharding, self._sharding))
        elif self.config.data_parallel and n_dev > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            mesh = Mesh(np.array(jax.devices()), ("dp",))
            self._sharding = NamedSharding(mesh, P("dp"))
            replicated = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step,
                in_shardings=(replicated, replicated, replicated,
                              self._sharding, self._sharding, self._sharding),
                out_shardings=(replicated,) * 5)
            self._eval_step = jax.jit(
                eval_step,
                in_shardings=(replicated, replicated,
                              self._sharding, self._sharding, self._sharding))
        else:
            self._train_step = jax.jit(train_step)
            self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    # Data pipeline: windowed pairs, padded, prefetched
    # ------------------------------------------------------------------

    def _pad(self, points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cap = self.config.num_points_padded
        pts = points[:, :3].astype(np.float32)
        pts = pts[~np.isnan(pts).any(axis=1)]
        n = min(len(pts), cap)
        out = np.zeros((cap, 3), np.float32)
        msk = np.zeros((cap,), bool)
        out[:n] = pts[:n]
        msk[:n] = True
        return out, msk

    def _batches(self, sequences, batch_size: int, shuffle: bool, rng):
        """Yields (points (B,2,N,3), masks (B,2,N), gt (B,2,4,4))."""
        windows = []
        for seq in sequences:
            for i in range(len(seq) - 1):
                windows.append((seq, i))
        order = rng.permutation(len(windows)) if shuffle else np.arange(len(windows))

        def load_window(idx):
            seq, i = windows[idx]
            d0, d1 = seq[i], seq[i + 1]
            p0, m0 = self._pad(d0["numpy_pc"])
            p1, m1 = self._pad(d1["numpy_pc"])
            gt0 = np.asarray(d0.get("absolute_pose_gt", np.eye(4)))
            gt1 = np.asarray(d1.get("absolute_pose_gt", np.eye(4)))
            return (np.stack([p0, p1]), np.stack([m0, m1]),
                    np.stack([gt0, gt1]).astype(np.float32))

        q: queue.Queue = queue.Queue(maxsize=4)
        n_batches = len(order) // batch_size

        def worker():
            for bi in range(n_batches):
                idxs = order[bi * batch_size:(bi + 1) * batch_size]
                items = [load_window(i) for i in idxs]
                q.put(tuple(np.stack(z) for z in zip(*items)))
            q.put(None)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    # ------------------------------------------------------------------
    # Epoch loops
    # ------------------------------------------------------------------

    def _set_epoch_lr(self):
        lr = self.optimizer.lr_for_epoch(self.num_train_epochs)  # type: ignore
        # inject_hyperparams exposes the lr inside opt_state.hyperparams
        try:
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        except Exception:
            pass
        return lr

    def train_epoch(self, sequences, rng) -> float:
        lr = self._set_epoch_lr()
        meter = AverageMeter()
        trainable = self._trainable()
        for points, masks, gt in self._batches(sequences, self.config.batch_size,
                                               shuffle=True, rng=rng):
            trainable, self.batch_stats, self.opt_state, loss, logs = \
                self._train_step(trainable, self.batch_stats, self.opt_state,
                                 jnp.asarray(points), jnp.asarray(masks),
                                 jnp.asarray(gt))
            self.train_iter += 1
            if self.train_iter % self.config.average_meter_frequency == 0:
                loss_val = float(loss)  # periodic host sync + NaN guard
                assert_debug(np.isfinite(loss_val),
                             f"NaN/Inf loss at iter {self.train_iter}")
                meter.update(loss_val)
                logger.info("epoch %d iter %d lr %.2e loss %.6f",
                            self.num_train_epochs, self.train_iter, lr, loss_val)
            if self.config.tensorboard_scalar_frequency > 0 and \
                    self.train_iter % self.config.tensorboard_scalar_frequency == 0:
                self._log_scalars(".train", {**logs, "lr": lr}, self.train_iter)
            if self.config.tensorboard_histogram_frequency > 0 and \
                    self.train_iter % \
                    self.config.tensorboard_histogram_frequency == 0:
                self._log_histograms(".train", trainable, self.train_iter)
            if self.config.tensorboard_image_frequency > 0 and \
                    self.train_iter % \
                    self.config.tensorboard_image_frequency == 0:
                self._log_images(".train", points, masks, self.train_iter)
        self._set_trainable(trainable)
        return meter.average

    def evaluate_epoch(self, sequences) -> float:
        meter = AverageMeter()
        trainable = self._trainable()
        rng = np.random.default_rng(0)
        for points, masks, gt in self._batches(sequences,
                                               self.config.eval_batch_size,
                                               shuffle=False, rng=rng):
            loss, logs = self._eval_step(trainable, self.batch_stats,
                                         jnp.asarray(points), jnp.asarray(masks),
                                         jnp.asarray(gt))
            self.eval_iter += 1
            meter.update(float(loss))
            if self.config.tensorboard_scalar_frequency > 0 and \
                    self.eval_iter % self.config.tensorboard_scalar_frequency == 0:
                self._log_scalars(".eval", logs, self.eval_iter)
            if self.config.tensorboard_image_frequency > 0 and \
                    self.eval_iter % \
                    self.config.tensorboard_image_frequency == 0:
                self._log_images(".eval", points, masks, self.eval_iter)
        return meter.average

    def train(self, num_epochs: Optional[int] = None):
        num_epochs = num_epochs or self.config.num_epochs
        (train_data, _), (eval_data, _), _, _ = self.dataset_loader.sequences()
        rng = np.random.default_rng(self.config.seed)
        for _ in range(num_epochs):
            if self.config.do_train:
                avg = self.train_epoch(train_data, rng)
                logger.info("epoch %d train loss %.6f", self.num_train_epochs, avg)
            self.num_train_epochs += 1
            self.save_checkpoint()
            if self.config.do_eval and eval_data:
                eval_avg = self.evaluate_epoch(eval_data)
                logger.info("epoch %d eval loss %.6f", self.num_train_epochs, eval_avg)


def _plain(obj):
    if dataclasses.is_dataclass(obj):
        return {f.name: _plain(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
