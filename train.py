"""PoseNet training entry point (reference train.py CLI surface).

    python train.py dataset=kitti training/loss=supervised \
        train_dir=.train num_epochs=100
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from pylidar_slam_tpu.config import compose, dataclass_from_dict
from pylidar_slam_tpu.dataset import DATASET
from pylidar_slam_tpu.training.loss_modules import (PointToPlaneLossConfig,
                                                    SupervisedLossConfig)
from pylidar_slam_tpu.training.prediction_modules import PredictionConfig
from pylidar_slam_tpu.training.trainer import ATrainerConfig, PoseNetTrainer


def build_trainer(cfg: dict) -> PoseNetTrainer:
    dataset_loader = DATASET.load(dict(cfg["dataset"]))
    training = cfg.get("training", {})
    loss_dict = dict(training.get("loss", {}) or {})
    mode = loss_dict.get("mode", "supervised")
    loss_cls = SupervisedLossConfig if mode == "supervised" else PointToPlaneLossConfig
    loss_cfg = dataclass_from_dict(loss_cls, loss_dict)
    pred_cfg = dataclass_from_dict(PredictionConfig,
                                   dict(training.get("prediction", {}) or {}))
    trainer_cfg = dataclass_from_dict(ATrainerConfig, cfg)
    return PoseNetTrainer(trainer_cfg, pred_cfg, loss_cfg, dataset_loader)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    argv = argv if argv is not None else sys.argv[1:]
    config_dir = Path(__file__).parent / "config"
    cfg = compose(str(config_dir), "train_posenet", argv)
    trainer = build_trainer(cfg)
    trainer.init()
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
