"""Train / test a NeRF.

Parity target: reference main_nerf.py:8-142 (torch-ngp CLI preserved):
-O expands to bf16 + occupancy-grid marching + preload; builds the network,
dataset loaders and Trainer; trains to --iters or renders the test split.
"""

import numpy as np

from nerfsafetyvalidation_tpu.cli import (build_parser, apply_O_flag,
                                           enable_compile_cache)
from nerfsafetyvalidation_tpu.config import network_config_from_opt
from nerfsafetyvalidation_tpu.models import make_network
from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
from nerfsafetyvalidation_tpu.train.trainer import Trainer
from nerfsafetyvalidation_tpu.train.metrics import PSNRMeter
from nerfsafetyvalidation_tpu.utils.seeding import seed_everything


def main():
    opt = build_parser("train").parse_args()
    opt = apply_O_flag(opt, "train")
    enable_compile_cache()

    seed_everything(opt.seed)
    cfg = network_config_from_opt(opt)
    net = make_network(cfg, opt)

    if opt.test:
        trainer = Trainer("ngp", opt, net, workspace=opt.workspace,
                          use_checkpoint=opt.ckpt, fp16=opt.fp16,
                          metrics=[PSNRMeter()])
        test_dataset = NeRFDataset(opt, type="test")
        test_loader = test_dataset.dataloader()
        if test_loader.has_gt:
            trainer.evaluate(test_loader)
        trainer.test(test_loader, write_video=True)
        trainer.save_mesh(resolution=256, threshold=10)
        return

    train_dataset = NeRFDataset(opt, type="train")
    train_loader = train_dataset.dataloader()
    valid_loader = NeRFDataset(opt, type="val", downscale=1).dataloader()

    max_epoch = int(np.ceil(opt.iters / len(train_loader)))
    trainer = Trainer("ngp", opt, net, workspace=opt.workspace,
                      use_checkpoint=opt.ckpt, fp16=opt.fp16,
                      ema_decay=0.95, metrics=[PSNRMeter()],
                      eval_interval=50, data_parallel=opt.data_parallel)
    trainer.train(train_loader, valid_loader, max_epoch)

    # also test at the end (main_nerf.py:131-140)
    test_loader = NeRFDataset(opt, type="test").dataloader()
    if test_loader.has_gt:
        trainer.evaluate(test_loader)
    trainer.test(test_loader, write_video=True)


if __name__ == "__main__":
    main()
