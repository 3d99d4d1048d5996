"""Two-scene capacity gate for smaller baked students (VERDICT r3 item 1b,
ROADMAP "smallest equal-PSNR student").

The shipped student is 256x6 (~584 kFLOP/sample); its fine pass is
MXU-bound, so a smaller hidden width cuts frame time nearly linearly in
hidden_dim^2. This script distills + pixel-fine-tunes candidate widths
through bench.py's own `_get_student` (same cache tags, so a winner's
pkl can be frozen into bench_assets unchanged), then scores each on the
SAME two-scene / 4-pose relative gate bench.py enforces and times the
800^2 frame with the pipelined batched timer.

Usage: python scripts/bench_student_capacity_gate.py \
         [--configs 192x6,256x4] [--scenes spheres,gauntlet]
Prints one JSON line per (config, scene) and a final verdict per config.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="192x6,256x4")
    ap.add_argument("--scenes", default="spheres,gauntlet")
    ap.add_argument("--time-batches", type=int, default=4)
    ap.add_argument("--time-batch", type=int, default=4)
    ap.add_argument("--anchor-db", default="",
                    help="comma list scene=db to skip the anchor render "
                         "(e.g. gauntlet=23.18 from a previous capture)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench as B
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays,
                                                         trace_scene)
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)

    scenes = [s for s in args.scenes.split(",") if s]
    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    # match bench.py's knobs exactly so a winner's pkl + gate decision
    # transfer unchanged (ADVICE r4): same dt_gamma env override, same
    # PRNGKey derivation as bench._student_k (7 + K), and the variant
    # schedule comes from bench.STUDENT_SCHEDULES via _get_student
    dt_gamma = float(os.environ.get("BENCH_DT_GAMMA", str(1.0 / 64)))

    # per-scene teacher assets + held-out views (exactly bench.py's gate)
    assets = {}
    for scene in scenes:
        net, params, state = B._train_flagship(scene)
        fparams = net.to_folded(params)
        views = []
        for th, ph in B.HOLDOUT:
            pose = orbit_pose(th, ph, 2.4)
            o_np, d_np = camera_rays(pose, intr, H, W)
            gt_rgb, gt_a, _ = trace_scene(o_np, d_np, scene=scene)
            gt = gt_rgb * gt_a[..., None] + (1.0 - gt_a[..., None])
            p_ngp = nerf_matrix_to_ngp(pose, scale=1.0,
                                       offset=(0.0, 0.0, 0.0))
            rays = get_rays(jnp.asarray(p_ngp[None]), intr, H, W)
            views.append((rays["rays_o"].reshape(-1, 3),
                          rays["rays_d"].reshape(-1, 3), gt))
        assets[scene] = (net, fparams, state, views)

    n_rays = H * W

    def psnr_of(img, gt):
        pred = np.asarray(img[:n_rays]).reshape(H, W, 3)
        return -10.0 * np.log10(max(float(np.mean((pred - gt) ** 2)),
                                    1e-10))

    # the relative gauntlet anchor: the exact marched path's 4-pose mean
    # (bench.py "fast" mode), vs which a candidate must sit within the
    # rel_margin; spheres keeps the absolute bar
    anchor_known = dict(kv.split("=") for kv in args.anchor_db.split(",")
                        if kv)
    gate = {}
    gate_min = {}  # pose-wise min bar; only set when the anchor renders
    # here (a --anchor-db shortcut carries no per-pose min)
    for scene in scenes:
        spec = B.SCENE_SPECS[scene]
        gate_env, gate_default = spec["gate"]
        bar = float(os.environ.get(gate_env, str(gate_default)))
        if scene in anchor_known and "rel_margin" in spec:
            margin = float(os.environ.get(spec["rel_margin"][0],
                                          str(spec["rel_margin"][1])))
            bar = min(bar, float(anchor_known[scene]) - margin)
            print(json.dumps({"scene": scene,
                              "anchor_db": float(anchor_known[scene]),
                              "gate_db": round(bar, 2),
                              "anchor": "given"}), flush=True)
        elif "rel_margin" in spec:
            net, fparams, state, views = assets[scene]
            TILE = B.TILE
            pad = ((n_rays + TILE - 1) // TILE) * TILE - n_rays

            def fast(ro, rd):
                if pad:
                    ro = jnp.concatenate([ro, jnp.zeros((pad, 3))])
                    rd = jnp.concatenate(
                        [rd, jnp.broadcast_to(jnp.asarray([0., 0., 1.]),
                                              (pad, 3))])
                return R.render_frame_fast(
                    net, fparams, state, ro, rd, tile=TILE,
                    max_samples=B.MAX_SAMPLES, max_steps=512,
                    samples_per_hit=2, dt_gamma=dt_gamma)["image"]

            apsnrs = [psnr_of(fast(v[0], v[1]), v[2]) for v in views]
            anchor = float(np.mean(apsnrs))
            margin = float(os.environ.get(spec["rel_margin"][0],
                                          str(spec["rel_margin"][1])))
            bar = min(bar, anchor - margin)
            # pose-wise min bar, same margin (bench.py's r5 min gate)
            gate_min[scene] = min(float(os.environ.get(
                spec["gate"][0], str(spec["gate"][1]))),
                float(np.min(apsnrs)) - margin)
            print(json.dumps({"scene": scene, "anchor_db": round(anchor, 2),
                              "gate_db": round(bar, 2),
                              "gate_min_db": round(gate_min[scene], 2)}),
                  flush=True)
        gate[scene] = bar

    results = {}
    for cfgs in args.configs.split(","):
        hd, nl = (int(x) for x in cfgs.split("x"))
        entry = {}
        ok = True
        for scene in scenes:
            net, fparams, state, views = assets[scene]
            student, sparams = B._get_student(
                net, fparams, state,
                jax.random.PRNGKey(7 + B.MAX_SAMPLES), scene,
                hidden_dim=hd, num_layers=nl)

            def render(ro, rd):
                return R.render_frame_guided(
                    student, sparams, state, ro, rd, H, W,
                    prepass_factor=8, max_samples=B.MAX_SAMPLES,
                    tile=16384, max_steps=512, dt_gamma=dt_gamma,
                    prepass_mode="scout", scout_samples=64,
                    natural_tile_cap=16384)["image"]

            psnrs = [psnr_of(render(v[0], v[1]), v[2]) for v in views]
            dt = B._time_render(render, views, n_rays,
                                batches=args.time_batches,
                                batch=args.time_batch)
            row = {"config": cfgs, "scene": scene,
                   "psnr_mean": round(float(np.mean(psnrs)), 2),
                   "psnr_min": round(float(np.min(psnrs)), 2),
                   "gate_db": round(gate[scene], 2),
                   "ms_frame": round(dt * 1e3, 1),
                   "rays_per_s": round(n_rays / dt)}
            row["pass"] = row["psnr_mean"] >= gate[scene] and (
                scene not in gate_min
                or row["psnr_min"] >= gate_min[scene])
            if scene in gate_min:
                row["gate_min_db"] = round(gate_min[scene], 2)
            ok = ok and row["pass"]
            entry[scene] = row
            print(json.dumps(row), flush=True)
        agg = len(scenes) * n_rays / sum(
            n_rays / entry[s]["rays_per_s"] for s in scenes)
        results[cfgs] = {"pass_both": ok, "agg_rays_per_s": round(agg),
                         **{s: entry[s] for s in scenes}}
        print(json.dumps({"config": cfgs, "pass_both": ok,
                          "agg_rays_per_s": round(agg)}), flush=True)

    print(json.dumps({"verdict": results}, default=str), flush=True)


if __name__ == "__main__":
    main()
