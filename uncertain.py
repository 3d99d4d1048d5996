"""Offline uncertainty-quantification driver.

Parity target: reference uncertain.py:251-471 — loads the trained NeRF,
builds the render/ray closures and runs `uncertainty()` over every train
image in offline mode (histograms + heatmaps land in results/).
"""

import os

import numpy as np
import jax.numpy as jnp

from nerfsafetyvalidation_tpu.cli import (build_parser, apply_O_flag,
                                           enable_compile_cache)
from nerfsafetyvalidation_tpu.config import network_config_from_opt, EnvConfig
from nerfsafetyvalidation_tpu.models import make_network
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
from nerfsafetyvalidation_tpu.data.rays import get_rays
from nerfsafetyvalidation_tpu.train.trainer import Trainer
from nerfsafetyvalidation_tpu.train.metrics import PSNRMeter
from nerfsafetyvalidation_tpu.utils.seeding import seed_everything
from nerfsafetyvalidation_tpu.uq.orchestrator import uncertainty


def main():
    opt = build_parser("uncertain").parse_args()
    opt = apply_O_flag(opt, "uncertain")
    enable_compile_cache()
    env = EnvConfig.load("envConfig.json")
    print(f"Reading environment parameters from envConfig.json")

    seed_everything(opt.seed)
    cfg = network_config_from_opt(opt)
    net = make_network(cfg, opt)
    trainer = Trainer("ngp", opt, net, workspace=opt.workspace,
                      use_checkpoint=opt.ckpt, fp16=opt.fp16,
                      metrics=[PSNRMeter()])
    params = trainer.params
    dataset = NeRFDataset(opt, type="test")  # intrinsics only

    render_fn = lambda ro, rd: R.render(net, params, ro, rd, staged=True,
                                        bg_color=1.0, perturb=False,
                                        num_steps=opt.num_steps,
                                        upsample_steps=opt.upsample_steps,
                                        max_ray_batch=opt.max_ray_batch)
    get_rays_fn = lambda pose: get_rays(pose, dataset.intrinsics, dataset.H,
                                        dataset.W)

    uncertainty(env.uq_method,
                path_to_images=os.path.join(opt.path, "train"),
                net=net, params=params, lr=opt.lr, render_fn=render_fn,
                get_rays_fn=get_rays_fn, dataset_path=opt.path,
                H=dataset.H, W=dataset.W)
    print("End of uncertainty computation".center(20, "."))


if __name__ == "__main__":
    main()
