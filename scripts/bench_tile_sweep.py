"""Fine-pass tile-size sweep for the baked (gather-free student) path.

The guided renderer's fine pass is a lax.map over raster-order tiles
(renderer.py render_frame_guided); tile size trades per-iteration loop
overhead (fewer, larger dispatch bodies amortize better) against sky-skip
granularity (smaller tiles skip more pure-sky row-bands via the per-tile
cond). This measures the knee on the real trained bench assets at the
headline workload (800^2, K=16, scout prepass) — plus a scout_samples
halving at the best tile. Role: the MXU-stall profiling pass VERDICT r3
item 1c asked for, in A/B form.

Run on the tunneled TPU:  python scripts/bench_tile_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the committed-asset loaders)


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
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays,
                                                         trace_scene)
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)

    scene = os.environ.get("SWEEP_SCENE", "spheres")
    H = W = int(os.environ.get("BENCH_RES", "800"))
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)

    net, params, state = bench._train_flagship(scene)
    fparams = net.to_folded(params)
    student, sparams = bench._get_student(net, fparams, state,
                                          jax.random.PRNGKey(7), scene)

    views = []
    for th, ph in bench.HOLDOUT:
        pose = orbit_pose(th, ph, 2.4)
        o_np, d_np = camera_rays(pose, intr, H, W)
        gt_rgb, gt_alpha, _ = trace_scene(o_np, d_np, scene=scene)
        gt = gt_rgb * gt_alpha[..., None] + (1.0 - gt_alpha[..., None])
        pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0, 0, 0))
        rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
        views.append((rays["rays_o"].reshape(-1, 3),
                      rays["rays_d"].reshape(-1, 3), gt))
    n_rays = H * W

    def run(tile, scout_samples=64, f=8):
        def render(ro, rd):
            return R.render_frame_guided(
                student, sparams, state, ro, rd, H, W,
                prepass_factor=f, max_samples=16, tile=tile,
                max_steps=512, dt_gamma=1.0 / 64, prepass_mode="scout",
                scout_samples=scout_samples,
                natural_tile_cap=tile)["image"]
        sec = bench._time_render(render, views, n_rays)
        img = render(*views[0][:2])
        pred = np.asarray(img[:n_rays]).reshape(H, W, 3)
        mse = float(np.mean((pred - views[0][2]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        print(json.dumps({"tile": tile, "scout": scout_samples, "f": f,
                          "ms_frame": round(sec * 1e3, 1),
                          "rays_per_s": int(n_rays / sec),
                          "psnr_view0": round(psnr, 2)}), flush=True)
        return sec

    tiles = [int(t) for t in os.environ.get(
        "SWEEP_TILES", "8192,16384,32768,64000,128000").split(",")]
    best, best_t = 1e9, tiles[0]
    for t in tiles:
        sec = run(t)
        if sec < best:
            best, best_t = sec, t
    # scout halving + prepass_factor at the winning tile
    run(best_t, scout_samples=32)
    run(best_t, scout_samples=64, f=4)


if __name__ == "__main__":
    main()
