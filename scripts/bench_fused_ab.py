"""A/B: fused pallas kernels vs plain XLA for the teacher render paths.

Round 3 made pallas kernels actually compile on the axon platform
(previously interpret-mode silently ran them as XLA); the student
breakdown (bench_student_breakdown.py) then measured the fused student
kernel LOSING to XLA by ~2x per frame. This times the teacher fast +
guided paths both ways so bench.py picks the winner, not the assumption.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fetch1(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as B
    from dataclasses import replace
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays, trace)
    from nerfsafetyvalidation_tpu.data.rays import get_rays, nerf_matrix_to_ngp

    net, params, state = B._train_flagship()
    fparams = net.to_folded(params)
    net_fused = make_network(replace(net.cfg, fused=True))

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    pose = orbit_pose(*B.HOLDOUT[0], 2.4)
    o_np, d_np = camera_rays(pose, intr, H, W)
    gt_rgb, gt_alpha, _ = trace(o_np, d_np)
    gt = gt_rgb * gt_alpha[..., None] + (1.0 - gt_alpha[..., None])
    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
    ro = rays["rays_o"].reshape(-1, 3)
    rd = rays["rays_d"].reshape(-1, 3)
    N = ro.shape[0]
    TILE = 131072
    n_tiles = (N + TILE - 1) // TILE
    pad = n_tiles * TILE - N
    ro_p = jnp.concatenate([ro, jnp.zeros((pad, 3))]) if pad else ro
    rd_p = jnp.concatenate(
        [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))]) \
        if pad else rd

    def psnr_of(img):
        pred = np.asarray(img[:N]).reshape(H, W, 3)
        mse = float(np.mean((pred - gt) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    def run(label, fn, iters=3):
        try:
            img = fn()
            fetch1(img)
            p = psnr_of(img)
            t0 = time.perf_counter()
            for _ in range(iters):
                img = fn()
                fetch1(img)
            dt = (time.perf_counter() - t0) / iters
            print(f"[{label}] {dt * 1e3:.1f} ms  {N / dt / 1e6:.2f}M rays/s"
                  f"  psnr {p:.2f}")
        except Exception as e:  # noqa: BLE001
            print(f"[{label}] ERROR {str(e)[:160]}")

    for label, n in (("xla", net), ("fused", net_fused)):
        run(f"fast/{label}", lambda n=n: R.render_frame_fast(
            n, fparams, state, ro_p, rd_p, tile=TILE, max_samples=16,
            max_steps=512, samples_per_hit=2, dt_gamma=1.0 / 64)["image"])
        run(f"guided/{label}", lambda n=n: R.render_frame_guided(
            n, fparams, state, ro, rd, H, W, prepass_factor=8,
            max_samples=16, tile=8192, max_steps=512,
            dt_gamma=1.0 / 64)["image"])


if __name__ == "__main__":
    main()
