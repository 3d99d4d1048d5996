"""Convergence gate for training-throughput variants (VERDICT r3 item 4 /
r5 item 4).

Throughput means nothing if the faster configuration starves training.
This trains the bench flagship config once per variant — same seed/iters/
scene, fresh workspaces — and compares validation PSNR, the same quantity
bench.py's gate is built on. Reference role: the mean_count-adaptive
sample allocation tradeoff (raymarching.py:196-227).

Variants (--variants, comma list):
  b16 / b8      post-carve sample budget 16 (bench default) vs 8
  pallas        budget 16 + train_gather=foldrow_pallas (numerically
                identical fold; this row guards the kernel end to end)
  pf64 / pf32   budget 16 + progressive fold resolution during warmup
                (opt.fold_warmup_scale — a real approximation, so this
                variant NEEDS the gate)

Run on the tunneled TPU:  python scripts/bench_budget_convergence.py
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

VARIANTS = {
    "b16": dict(budget=16),
    "b8": dict(budget=8),
    "pallas": dict(budget=16, train_gather="foldrow_pallas"),
    "pf64": dict(budget=16, fold_warmup_scale=64),
    "pf32": dict(budget=16, fold_warmup_scale=32),
}


def train_at_budget(budget, iters, scene_dir, tag, train_gather="foldrow",
                    fold_warmup_scale=0):
    import jax
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
    from nerfsafetyvalidation_tpu.train.trainer import Trainer

    cfg = NetworkConfig(encoding="mipfold", bound=1.0,
                        compute_dtype="bfloat16", num_levels=8, level_dim=4,
                        base_resolution=16, fold_max_scale=128,
                        grid_ray=True, density_thresh=10.0,
                        train_gather=train_gather)
    net = make_network(cfg)

    class O:
        path = scene_dir
        color_space = "srgb"
        scale = 1.0
        offset = (0.0, 0.0, 0.0)
        bound = 1.0
        fp16 = True
        preload = True
        rand_pose = -1
        downscale = 1
        num_rays = 4096
        error_map = False
        lr = 1e-2
        num_steps = 128
        upsample_steps = 0
        max_ray_batch = 4096
        grid_max_samples = 96
        grid_samples_per_hit = 2
        grid_sample_budget_per_ray = 48
        grid_warmup_steps = 512
        grid_budget_after_warmup = budget
        grid_max_samples_after_warmup = 32
        max_steps = 1024
        dt_gamma = 1.0 / 64
        seed = 0
    O.iters = iters
    if fold_warmup_scale:
        O.fold_warmup_scale = fold_warmup_scale

    ws = f"/tmp/budget_conv_{tag}"
    shutil.rmtree(ws, ignore_errors=True)
    train_loader = NeRFDataset(O, type="train").dataloader()
    valid_loader = NeRFDataset(O, type="val").dataloader()
    max_epoch = int(np.ceil(iters / len(train_loader)))
    trainer = Trainer(f"conv_{tag}", O, net, workspace=ws,
                      use_checkpoint="scratch", fp16=True, mute=True,
                      eval_interval=10 ** 9, ckpt_interval=10 ** 9)
    t0 = time.perf_counter()
    trainer.train(train_loader, valid_loader, max_epoch)
    wall = time.perf_counter() - t0
    avg_loss = trainer.evaluate(valid_loader)
    # metrics[0] is the PSNR meter (train/metrics.py); evaluate records
    # its measure in stats["results"]
    results = trainer.stats.get("results", [])
    psnr = float(results[-1]) if results else \
        -10.0 * np.log10(max(float(avg_loss), 1e-10))
    print(json.dumps({"variant": tag, "budget": budget,
                      "train_gather": train_gather,
                      "fold_warmup_scale": fold_warmup_scale,
                      "iters": iters, "train_wall_s": round(wall, 1),
                      "val_psnr": round(psnr, 2),
                      "val_loss": round(float(avg_loss), 6)}), flush=True)
    return psnr


def main():
    os.makedirs(bench._CACHE, exist_ok=True)
    bench._seed_cache_from_assets()
    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from nerfsafetyvalidation_tpu.data.synthetic import generate_dataset

    spec = bench.SCENE_SPECS["spheres"]
    scene_dir = os.path.join(bench._CACHE, spec["dir"])
    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        generate_dataset(scene_dir, n_train=bench.N_TRAIN_VIEWS, n_val=2,
                         n_test=4, H=bench.TRAIN_RES, W=bench.TRAIN_RES,
                         scene="spheres")
    iters = int(os.environ.get("CONV_ITERS", "1920"))
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="b16,b8")
    args = ap.parse_args()
    psnrs = {}
    for tag in args.variants.split(","):
        kw = dict(VARIANTS[tag])
        budget = kw.pop("budget")
        try:
            psnrs[tag] = train_at_budget(budget, iters, scene_dir, tag, **kw)
        except Exception as e:                              # noqa: BLE001
            # e.g. foldrow_pallas fails to lower on this toolchain
            # (bench_fold_pallas.py records the compiler errors); keep
            # the remaining variants running
            print(json.dumps({"variant": tag, "error": str(e)[:300]}),
                  flush=True)
            psnrs[tag] = None
    base = args.variants.split(",")[0]
    for tag, p in psnrs.items():
        if tag != base and p is not None and psnrs[base] is not None:
            print(json.dumps({"variant": tag, "vs": base,
                              "delta_db": round(float(p)
                                                - float(psnrs[base]), 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
