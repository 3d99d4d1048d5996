"""Compare render-path modes on the trained bench scene (TPU).

Loads the cached bench checkpoint (.bench_cache, created by bench.py),
rebuilds the occupancy state, and times each frame path at 800^2 against
the analytic ground truth:

  fast    - render_frame_fast (march + sorted shading; the r2 headline)
  guided  - render_frame_guided with the mip-fold teacher (march only in
            the low-res prepass)
  baked   - render_frame_guided with the distilled frequency-MLP student
            (gather-free full-res pass)

Usage: python scripts/bench_render_modes.py [--modes fast,guided,baked]
       [--distill-steps 2000] [--res 800]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch1(x):
    np.asarray(x.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="fast,guided,baked")
    ap.add_argument("--distill-steps", type=int, default=2000)
    ap.add_argument("--finetune-steps", type=int, default=0)
    ap.add_argument("--finetune-pool-views", type=int, default=64)
    ap.add_argument("--no-student-cache", action="store_true")
    ap.add_argument("--distill-hidden", type=int, default=128)
    ap.add_argument("--distill-layers", type=int, default=4)
    ap.add_argument("--multires", type=int, default=10)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--prepass-factor", type=int, default=8)
    ap.add_argument("--margin-cells", type=float, default=6.0)
    ap.add_argument("--guided-k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fine-order", default="natural",
                    choices=["natural", "partition"])
    ap.add_argument("--fine-tile", type=int, default=8192)
    ap.add_argument("--prepass-mode", default="march",
                    choices=["march", "scout"])
    ap.add_argument("--scout-samples", type=int, default=64)
    ap.add_argument("--fused-student", action="store_true",
                    help="run the student chain as one pallas megakernel")
    ap.add_argument("--fused-teacher", action="store_true",
                    help="route the teacher MLPs through the pallas "
                         "kernels (measured slower than XLA on the "
                         "tunnel, 2026-08-18 — default off)")
    args = ap.parse_args()
    modes = args.modes.split(",")

    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import bench
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays, trace)
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)
    from dataclasses import replace as _replace

    net, params, state = bench._train_flagship()
    fparams = net.to_folded(params)
    net_fused = make_network(_replace(net.cfg, fused=True)) \
        if args.fused_teacher else net

    H = W = args.res
    fov_x = 0.6911
    fx = fy = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fy, W / 2, H / 2)
    pose = orbit_pose(0.77, 0.52, 2.4)
    o_np, d_np = camera_rays(pose, intr, H, W)
    gt_rgb, gt_alpha, _ = trace(o_np, d_np)
    gt = gt_rgb * gt_alpha[..., None] + (1.0 - gt_alpha[..., None])

    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
    rays_o = rays["rays_o"].reshape(-1, 3)
    rays_d = rays["rays_d"].reshape(-1, 3)
    n_rays = rays_o.shape[0]

    def run_mode(name, fn, n_exp=None, hw=None):
        n_exp = n_exp or n_rays
        img = fn()
        fetch1(img)
        psnr = None
        if hw is None and n_exp == n_rays:
            pred = np.asarray(img[:n_exp]).reshape(H, W, 3)
            mse = float(np.mean((pred - gt) ** 2))
            psnr = round(-10.0 * np.log10(max(mse, 1e-10)), 2)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fetch1(fn())
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"mode": name, "rays_per_s": round(n_exp / dt),
                          "ms_per_frame": round(dt * 1e3, 1),
                          "psnr_db": psnr}), flush=True)
        return psnr, dt

    TILE = 131072
    n_tiles = (n_rays + TILE - 1) // TILE
    pad = n_tiles * TILE - n_rays
    ro_p, rd_p = rays_o, rays_d
    if pad:
        ro_p = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
        rd_p = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                      (pad, 3))])

    if "fast" in modes:
        run_mode("fast", lambda: R.render_frame_fast(
            net_fused, fparams, state, ro_p, rd_p, tile=TILE, max_samples=16,
            max_steps=512, samples_per_hit=2, dt_gamma=1.0 / 64)["image"])

    if "prepass" in modes:
        # cost of the guided prepass alone (march at 1/f^2 rays)
        f = args.prepass_factor
        h, w = H // f, W // f
        yy = np.clip(np.arange(h) * f + f // 2, 0, H - 1)
        xx = np.clip(np.arange(w) * f + f // 2, 0, W - 1)
        pre_idx = jnp.asarray((yy[:, None] * W + xx[None, :]).reshape(-1))
        pre_o = jnp.take(rays_o, pre_idx, axis=0)
        pre_d = jnp.take(rays_d, pre_idx, axis=0)
        run_mode("prepass", lambda: R.render_frame_fast(
            net_fused, fparams, state, pre_o, pre_d, tile=16384,
            max_samples=16, max_steps=512, samples_per_hit=2,
            dt_gamma=1.0 / 64, march_tile=8192)["image"],
            n_exp=h * w)

    gkw = dict(prepass_factor=args.prepass_factor,
               max_samples=args.guided_k, max_steps=512, dt_gamma=1.0 / 64,
               margin_cells=args.margin_cells, fine_order=args.fine_order,
               prepass_mode=args.prepass_mode,
               scout_samples=args.scout_samples,
               tile=args.fine_tile if args.fine_order == "natural" else TILE)

    if "guided" in modes:
        run_mode("guided", lambda: R.render_frame_guided(
            net_fused, fparams, state, rays_o, rays_d, H, W,
            **gkw)["image"])

    if "baked" in modes:
        import pickle
        from nerfsafetyvalidation_tpu.models.bake import (distill,
                                                          student_config)
        from nerfsafetyvalidation_tpu.models import make_network
        scfg = student_config(net.cfg, multires=args.multires,
                              hidden_dim=args.distill_hidden,
                              num_layers=args.distill_layers)
        cache_f = os.path.join(
            bench._CACHE,
            f"student_s{args.distill_steps}_h{args.distill_hidden}"
            f"_l{args.distill_layers}_m{args.multires}.pkl")
        if os.path.exists(cache_f) and not args.no_student_cache:
            with open(cache_f, "rb") as f:
                sparams = pickle.load(f)
            student = make_network(scfg)
            print(json.dumps({"mode": "distill", "cached": True}),
                  flush=True)
        else:
            t0 = time.perf_counter()
            student, sparams, loss = distill(
                net, fparams, state, jax.random.PRNGKey(7),
                steps=args.distill_steps, cfg=scfg, log_every=500)
            print(json.dumps({"mode": "distill", "loss": round(loss, 6),
                              "secs": round(time.perf_counter() - t0, 1)}),
                  flush=True)
            with open(cache_f, "wb") as f:
                pickle.dump(jax.device_get(sparams), f)
        if args.fused_student:
            student = make_network(_replace(student.cfg, fused=True))
        run_mode("baked", lambda: R.render_frame_guided(
            student, sparams, state, rays_o, rays_d, H, W, **gkw)["image"])
        # teacher-scout variant: windows placed by the teacher's march,
        # fine shade by the gather-free student
        run_mode("baked_tp", lambda: R.render_frame_guided(
            student, sparams, state, rays_o, rays_d, H, W,
            prepass_net=net_fused, prepass_params=fparams, **gkw)["image"])

        if args.finetune_steps:
            from nerfsafetyvalidation_tpu.models.bake import finetune_render
            ft_cache = cache_f.replace(".pkl",
                                       f"_ft{args.finetune_steps}"
                                       f"_k{args.guided_k}.pkl")
            if os.path.exists(ft_cache) and not args.no_student_cache:
                with open(ft_cache, "rb") as f:
                    sparams = pickle.load(f)
                print(json.dumps({"mode": "finetune", "cached": True}),
                      flush=True)
                run_ft_cached = True
            else:
                run_ft_cached = False
        if args.finetune_steps and not run_ft_cached:
            # ray pool from random orbit cameras covering the training shell
            rng = np.random.default_rng(11)
            pool_res = 128
            pool_o, pool_d = [], []
            for _ in range(args.finetune_pool_views):
                th = rng.uniform(0, 2 * np.pi)
                ph = rng.uniform(0.15, 1.2)
                rad = rng.uniform(2.2, 2.6)
                p = orbit_pose(th, ph, rad)
                p_ngp = nerf_matrix_to_ngp(p, scale=1.0,
                                           offset=(0.0, 0.0, 0.0))
                fxp = 0.5 * pool_res / np.tan(0.5 * fov_x)
                r = get_rays(jnp.asarray(p_ngp[None]),
                             (fxp, fxp, pool_res / 2, pool_res / 2),
                             pool_res, pool_res)
                pool_o.append(np.asarray(r["rays_o"]).reshape(-1, 3))
                pool_d.append(np.asarray(r["rays_d"]).reshape(-1, 3))
            pool_o = jnp.asarray(np.concatenate(pool_o))
            pool_d = jnp.asarray(np.concatenate(pool_d))
            t0 = time.perf_counter()
            sparams, ft_loss = finetune_render(
                student, sparams, net_fused, fparams, state, pool_o, pool_d,
                jax.random.PRNGKey(13), steps=args.finetune_steps,
                K=args.guided_k, margin_cells=args.margin_cells,
                log_every=500)
            print(json.dumps({"mode": "finetune", "loss": round(ft_loss, 6),
                              "secs": round(time.perf_counter() - t0, 1)}),
                  flush=True)
            with open(ft_cache, "wb") as f:
                pickle.dump(jax.device_get(sparams), f)
        if args.finetune_steps:
            run_mode("baked_ft", lambda: R.render_frame_guided(
                student, sparams, state, rays_o, rays_d, H, W,
                **gkw)["image"])
            run_mode("baked_ft_tp", lambda: R.render_frame_guided(
                student, sparams, state, rays_o, rays_d, H, W,
                prepass_net=net_fused, prepass_params=fparams,
                **gkw)["image"])


if __name__ == "__main__":
    main()
