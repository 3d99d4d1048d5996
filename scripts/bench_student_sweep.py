"""Student capacity sweep: rays/s vs PSNR for the baked render path.

With the 400^2-trained teacher at 31 dB, the 256x6 student (584
kFLOP/sample) has fidelity headroom — smaller students cut the fine-pass
FLOPs linearly and may hold the 28 dB gate. Each config distills 8000 +
pixel-fine-tunes 4000 steps (cached per config), then measures the
4-pose PSNR mean/min and the median 800^2 frame time.

Usage: python scripts/bench_student_sweep.py [--configs 256x6,192x6,128x6,128x4]
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="256x6,192x6,128x6,128x4")
    ap.add_argument("--multires", type=int, default=12)
    ap.add_argument("--distill-steps", type=int, default=8000)
    ap.add_argument("--finetune-steps", type=int, default=4000)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as B
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models.bake import (distill, student_config,
                                                      finetune_render)
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays, trace)
    from nerfsafetyvalidation_tpu.data.rays import get_rays, nerf_matrix_to_ngp

    net, params, state = B._train_flagship()
    fparams = net.to_folded(params)

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    views = []
    for th, ph in B.HOLDOUT:
        pose = orbit_pose(th, ph, 2.4)
        o_np, d_np = camera_rays(pose, intr, H, W)
        gt_rgb, gt_a, _ = trace(o_np, d_np)
        gt = gt_rgb * gt_a[..., None] + (1.0 - gt_a[..., None])
        pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
        rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
        views.append((rays["rays_o"].reshape(-1, 3),
                      rays["rays_d"].reshape(-1, 3), gt))
    N = views[0][0].shape[0]

    # fine-tune ray pool (same recipe as bench._get_student)
    rng = np.random.default_rng(11)
    pool_res = 128
    pool_o, pool_d = [], []
    for _ in range(64):
        p = orbit_pose(rng.uniform(0, 2 * np.pi), rng.uniform(0.15, 1.2),
                       rng.uniform(2.2, 2.6))
        p_ngp = nerf_matrix_to_ngp(p, scale=1.0, offset=(0.0, 0.0, 0.0))
        fxp = 0.5 * pool_res / np.tan(0.5 * fov_x)
        r = get_rays(jnp.asarray(p_ngp[None]),
                     (fxp, fxp, pool_res / 2, pool_res / 2),
                     pool_res, pool_res)
        pool_o.append(np.asarray(r["rays_o"]).reshape(-1, 3))
        pool_d.append(np.asarray(r["rays_d"]).reshape(-1, 3))
    pool_o = jnp.asarray(np.concatenate(pool_o))
    pool_d = jnp.asarray(np.concatenate(pool_d))

    def fetch1(x):
        _ = np.asarray(x.ravel()[:1])

    def psnr_of(img, gt):
        pred = np.asarray(img[:N]).reshape(H, W, 3)
        return -10.0 * np.log10(max(float(np.mean((pred - gt) ** 2)), 1e-10))

    for spec in args.configs.split(","):
        hid, lay = (int(v) for v in spec.split("x"))
        scfg = student_config(net.cfg, multires=args.multires,
                              hidden_dim=hid, num_layers=lay)
        cache = os.path.join(
            B._CACHE, f"sweep_student_h{hid}_l{lay}_m{args.multires}"
            f"_d{args.distill_steps}_f{args.finetune_steps}.pkl")
        student = make_network(scfg)
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                sparams = pickle.load(f)
        else:
            t0 = time.perf_counter()
            student, sparams, dloss = distill(
                net, fparams, state, jax.random.PRNGKey(7),
                steps=args.distill_steps, cfg=scfg)
            sparams, ftloss = finetune_render(
                student, sparams, net, fparams, state, pool_o, pool_d,
                jax.random.PRNGKey(8), steps=args.finetune_steps, K=args.k)
            with open(cache, "wb") as f:
                pickle.dump(jax.device_get(sparams), f)
            print(json.dumps({"config": spec, "distill_loss": round(dloss, 6),
                              "ft_loss": round(float(ftloss), 6),
                              "train_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)

        fn = lambda ro, rd: R.render_frame_guided(
            student, sparams, state, ro, rd, H, W, prepass_factor=8,
            max_samples=args.k, tile=8192, max_steps=512, dt_gamma=1.0 / 64,
            prepass_mode="scout")["image"]
        psnrs = [psnr_of(fn(v[0], v[1]), v[2]) for v in views]
        ro, rd, _ = views[0]
        img = fn(ro, rd)
        fetch1(img)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            img = fn(ro, rd)
            fetch1(img)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[3]
        print(json.dumps({
            "config": spec, "K": args.k,
            "psnr_mean": round(float(np.mean(psnrs)), 2),
            "psnr_min": round(float(np.min(psnrs)), 2),
            "ms_med": round(med * 1e3, 1),
            "rays_per_s": round(N / med)}), flush=True)


if __name__ == "__main__":
    main()
