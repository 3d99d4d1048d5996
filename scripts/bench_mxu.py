"""MXU speed-of-light table for the distilled-student render path
(VERDICT r4 item 2: establish the student-path ceiling with
bench_gather-grade rigor).

The baked render modes are gather-free: the whole fine pass is the
student MLP chain (frequency encode -> sigma net -> color head) on
tile*K sample rows, plus a scout prepass and compositing. Their ceiling
is therefore the MXU, not the gather engine. This script measures, on
the live chip:

  1. PEAK — dense bf16 matmul TFLOP/s at square sizes 2048..8192
     (the empirical MXU roof; the spec sheet is not trusted).
  2. LADDER — bf16 matmul TFLOP/s at the student's own GEMM shapes
     ([262144, h] x [h, h] for h in 64..512): how much of the roof a
     thin-operand GEMM can see at all.
  3. CHAIN — the student's full jitted apply (encode + both MLPs +
     activations) at the fine-pass batch, per variant (hidden x layers):
     achieved TFLOP/s, ms per 800^2-frame-equivalent (10.24M samples).
  4. FRAME — the measured baked frame (scout + fine pass + composite)
     for variants with a trained pkl in the cache, so the non-MLP
     overhead = frame - chain - scout is pinned down.

SOL(variant) = chain_frame_ms + scout_ms + overhead_ms gives the
ceiling rays/s for a gate-passing student of that size; the headline's
distance to its OWN wall (not the 50M north star) is the honest "at the
wall / not at the wall" verdict the round-4 judge asked for.

Usage: python scripts/bench_mxu.py [--iters 5] [--variants 256x6,192x6]
Prints one JSON line per measurement row.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fetch1(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def timeit(fn, iters=5, batch=4):
    """Pipelined batched timing (bench.py _time_render discipline): one
    completion fetch per back-to-back batch; median over batches."""
    fetch1(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(batch):
            out = fn()
        fetch1(out)
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", default="256x6,192x6,160x6,128x6")
    ap.add_argument("--skip-frames", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)

    # ---- 1. PEAK: dense bf16 square matmuls
    for n in (2048, 4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        dt = timeit(lambda: f(a, b), args.iters)
        tf = 2 * n ** 3 / dt / 1e12
        print(json.dumps({"row": "peak", "shape": f"{n}^3",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(tf, 1)}), flush=True)

    # ---- 2. LADDER: the student's GEMM aspect (262144 x h x h)
    B = 262144          # fine-pass rows: tile 16384 x K 16
    for h in (64, 128, 160, 192, 256, 384, 512):
        a = jax.random.normal(key, (B, h), jnp.bfloat16)
        w = jax.random.normal(key, (h, h), jnp.bfloat16)
        f = jax.jit(lambda a, w: jnp.maximum(a @ w, 0))
        dt = timeit(lambda: f(a, w), args.iters)
        tf = 2 * B * h * h / dt / 1e12
        print(json.dumps({"row": "ladder", "shape": f"{B}x{h}x{h}",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(tf, 1)}), flush=True)

    # ---- 3+4. CHAIN and FRAME per student variant
    import bench as Bch
    from dataclasses import replace
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models.bake import student_config
    from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)

    net, params, state = Bch._train_flagship()
    fparams = net.to_folded(params)

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    pose = orbit_pose(*Bch.HOLDOUT[0], 2.4)
    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
    ro = rays["rays_o"].reshape(-1, 3)
    rd = rays["rays_d"].reshape(-1, 3)
    K = Bch.MAX_SAMPLES
    n_rays = H * W
    n_samples = n_rays * K

    x = jax.random.uniform(key, (B, 3), minval=-1, maxval=1)
    d = jax.random.normal(key, (B, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    from nerfsafetyvalidation_tpu.models.renderer import _scout_field, aabb_of

    for vs in args.variants.split(","):
        hd, nl = (int(v) for v in vs.split("x"))
        scfg = student_config(net.cfg, multires=12, hidden_dim=hd,
                              num_layers=nl)
        student = make_network(scfg)
        # trained params when the bench cache has them (the frame row's
        # sky-tile skipping + scout windows are only representative on a
        # trained field); random params otherwise — FLOP-identical for
        # the chain row, and the frame row is labeled untrained
        import pickle
        tag = "" if (hd, nl) == (256, 6) else f"_h{hd}x{nl}"
        cache_f = os.path.join(Bch._CACHE, f"bench_student{tag}.pkl")
        trained = os.path.exists(cache_f)
        if trained:
            with open(cache_f, "rb") as fh:
                blob = pickle.load(fh)
            sparams = blob["params"] if isinstance(blob, dict) \
                and "params" in blob else blob
            # resident params: numpy pytrees re-upload per dispatch
            sparams = jax.device_put(sparams)
        else:
            sparams = student.init(jax.random.PRNGKey(1))

        d_in = 3 + 3 * 2 * scfg.multires
        macs = (d_in * hd + (nl - 2) * hd * hd + hd * 16)
        macs += (32 * scfg.hidden_dim_color + scfg.hidden_dim_color ** 2
                 + scfg.hidden_dim_color * 3)
        tflop_frame = 2 * macs * n_samples / 1e12

        f = jax.jit(lambda p, x, d, n=student: n.apply(p, x, d))
        dt = timeit(lambda: f(sparams, x, d), args.iters)
        chain_frame_ms = dt * n_samples / B * 1e3
        row = {"row": "chain", "variant": vs,
               "kflop_per_sample": round(2 * macs / 1e3, 1),
               "tflop_per_frame": round(tflop_frame, 2),
               "batch_ms": round(dt * 1e3, 2),
               "frame_equiv_ms": round(chain_frame_ms, 1),
               "achieved_tflops": round(
                   2 * macs * B / dt / 1e12, 1)}
        print(json.dumps(row), flush=True)

        # scout prepass at this variant (S=64, f=8, occupancy-masked)
        f_pre = 8
        h_ = (H + f_pre - 1) // f_pre
        w_ = (W + f_pre - 1) // f_pre
        yy = np.clip(np.arange(h_) * f_pre + f_pre // 2, 0, H - 1)
        xx = np.clip(np.arange(w_) * f_pre + f_pre // 2, 0, W - 1)
        pre_idx = jnp.asarray((yy[:, None] * W + xx[None, :]).reshape(-1))
        aabb = aabb_of(scfg)

        @jax.jit
        def scout(sp, ro, rd, bf, student=student, scfg=scfg, aabb=aabb,
                  pre_idx=pre_idx):
            pre_o = jnp.take(ro, pre_idx, axis=0)
            pre_d = jnp.take(rd, pre_idx, axis=0)
            return _scout_field(student, sp, pre_o, pre_d, 64, scfg, aabb,
                                bitfield=bf, grid_size=scfg.grid_size)

        sdt = timeit(lambda: scout(sparams, ro, rd,
                                   state.density_bitfield), args.iters)
        print(json.dumps({"row": "scout", "variant": vs,
                          "ms": round(sdt * 1e3, 1)}), flush=True)

        if args.skip_frames:
            continue

        def frame(student=student, sparams=sparams):
            return R.render_frame_guided(
                student, sparams, state, ro, rd, H, W, prepass_factor=8,
                max_samples=K, tile=16384, max_steps=512,
                dt_gamma=1.0 / 64, prepass_mode="scout",
                scout_samples=64, natural_tile_cap=16384)["image"]

        fdt = timeit(frame, args.iters)
        overhead_ms = fdt * 1e3 - chain_frame_ms - sdt * 1e3
        print(json.dumps({
            "row": "frame", "variant": vs,
            "ms": round(fdt * 1e3, 1),
            "rays_per_s": round(n_rays / fdt),
            "chain_ms": round(chain_frame_ms, 1),
            "scout_ms": round(sdt * 1e3, 1),
            "overhead_ms": round(overhead_ms, 1),
            "mlp_fraction": round(chain_frame_ms / (fdt * 1e3), 3),
            "untrained_params": not trained,
        }), flush=True)


if __name__ == "__main__":
    main()
