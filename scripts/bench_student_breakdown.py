"""Where do the baked-path milliseconds go? (round-3 perf triage)

The battery capture (BENCH_NOTES "Fixed-overhead teardown") measured the
distilled gather-free student at ~373 ms/frame (1.7M rays/s) — but its
FLOP roofline (~7 TFLOP/frame on a ~200 TFLOPs bf16 MXU) says 40-110 ms.
This script times each piece in isolation on the trained bench assets:

  A. raw student chain, XLA, one big batch (tile*K samples)  -> MXU ceiling
  B. same through the fused pallas kernel (fused=True)       -> kernel check
  C. scout prepass alone (occupancy-masked density scout)
  D. full baked frame at several tile sizes, fused on/off

Usage: python scripts/bench_student_breakdown.py [--iters 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fetch1(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def timeit(fn, iters=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch1(out)
    # fetch only at the end: per-iter fetch1 inside fn for frame paths
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-frames", action="store_true")
    args = ap.parse_args()

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
    from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
    from nerfsafetyvalidation_tpu.data.rays import get_rays, nerf_matrix_to_ngp

    net, params, state = B._train_flagship()
    fparams = net.to_folded(params)
    student, sparams = B._get_student(net, fparams, state,
                                      jax.random.PRNGKey(7))
    student_fused = make_network(replace(student.cfg, fused=True))

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    pose = orbit_pose(*B.HOLDOUT[0], 2.4)
    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
    ro = rays["rays_o"].reshape(-1, 3)
    rd = rays["rays_d"].reshape(-1, 3)

    K = 16
    N = H * W
    n_samples = N * K  # full-frame sample count: 10.24M

    # ---- A/B: raw student chain on one big sample batch
    cfg = student.cfg
    d_in = 3 + 3 * 2 * cfg.multires
    macs = (d_in * cfg.hidden_dim
            + (cfg.num_layers - 2) * cfg.hidden_dim ** 2
            + cfg.hidden_dim * (1 + 15))
    # color head (SH dir enc + geo feat -> hidden_dim_color x n_layers)
    macs += (32 * cfg.hidden_dim_color + cfg.hidden_dim_color ** 2
             + cfg.hidden_dim_color * 3)
    tflop_frame = 2 * macs * n_samples / 1e12
    print(f"student: {cfg.hidden_dim}x{cfg.num_layers} multires="
          f"{cfg.multires}  ~{2 * macs / 1e3:.0f} kFLOP/sample  "
          f"{tflop_frame:.2f} TFLOP/frame-equivalent")

    key = jax.random.PRNGKey(0)
    for batch in (131072, 524288):
        x = jax.random.uniform(key, (batch, 3), minval=-1, maxval=1)
        d = jax.random.normal(key, (batch, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        for label, snet in (("xla", student), ("fused", student_fused)):
            try:
                f = jax.jit(lambda p, x, d, n=snet: n.apply(p, x, d))
                dt = timeit(lambda: f(sparams, x, d), args.iters)
                per_frame = dt * n_samples / batch
                print(f"  [{label}] batch {batch}: {dt * 1e3:.2f} ms  ->"
                      f" {per_frame * 1e3:.1f} ms/frame-equiv"
                      f"  ({tflop_frame / per_frame:.1f} TFLOP/s)")
            except Exception as e:  # noqa: BLE001
                print(f"  [{label}] batch {batch}: ERROR {str(e)[:120]}")

    # ---- C: scout prepass alone
    f_pre = 8
    h = (H + f_pre - 1) // f_pre
    w = (W + f_pre - 1) // f_pre
    yy = np.clip(np.arange(h) * f_pre + f_pre // 2, 0, H - 1)
    xx = np.clip(np.arange(w) * f_pre + f_pre // 2, 0, W - 1)
    pre_idx = jnp.asarray((yy[:, None] * W + xx[None, :]).reshape(-1))
    from nerfsafetyvalidation_tpu.models.renderer import (_scout_field,
                                                          aabb_of)
    aabb = aabb_of(cfg)

    @jax.jit
    def scout(sparams, ro, rd, bf):
        pre_o = jnp.take(ro, pre_idx, axis=0)
        pre_d = jnp.take(rd, pre_idx, axis=0)
        return _scout_field(student, sparams, pre_o, pre_d, 64, cfg, aabb,
                            bitfield=bf, grid_size=cfg.grid_size)

    dt = timeit(lambda: scout(sparams, ro, rd, state.density_bitfield),
                args.iters)
    print(f"scout prepass (S=64, f=8, masked): {dt * 1e3:.1f} ms")

    if args.skip_frames:
        return

    # ---- D: full baked frame
    for tile in (8192, 16384, 32768):
        for label, snet in (("xla", student), ("fused", student_fused)):
            def frame(snet=snet, tile=tile):
                out = R.render_frame_guided(
                    snet, sparams, state, ro, rd, H, W, prepass_factor=8,
                    max_samples=K, tile=tile, max_steps=512,
                    dt_gamma=1.0 / 64, prepass_mode="scout")["image"]
                fetch1(out)
                return out

            try:
                dt = timeit(frame, args.iters)
                print(f"  [frame {label} tile={tile}] {dt * 1e3:.1f} ms"
                      f"  ({N / dt / 1e6:.2f}M rays/s)")
            except Exception as e:  # noqa: BLE001
                print(f"  [frame {label} tile={tile}] ERROR {str(e)[:120]}")


if __name__ == "__main__":
    main()
