"""Breakdown of the training step + grid-refresh cost (tunnel TPU).

Times each piece of the post-carve training iteration separately so the
ms/step budget can be attributed (VERDICT r2 item 5 follow-up):

  march      - the DDA bitfield walk alone (ops/marching.march_rays)
  fwd        - run_grid forward (march + budgeted compaction + net + composite)
  fwd+bwd    - value_and_grad of the MSE loss
  step       - the trainer's full donated jitted step (adam + EMA)
  probe      - update_extra_state's density probe alone (1/n_blocks cells)
  packbits   - bitfield rebuild alone
  skipgrid   - chebyshev skip-grid rebuild alone
  refresh    - full update_extra_state (partial block)

Usage: python scripts/bench_train_breakdown.py [--budget 12]
       [--gather foldrow] [--num-rays 4096] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=12)
    ap.add_argument("--gather", default="foldrow")
    ap.add_argument("--num-rays", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-samples", type=int, default=32)
    ap.add_argument("--partial-blocks", type=int, default=4)
    args = ap.parse_args()

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
    from dataclasses import replace as _replace
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.ops.marching import march_rays
    from nerfsafetyvalidation_tpu.ops.ray_ops import (packbits,
                                                      occupancy_to_skip_grid)

    net, params, state = bench._train_flagship()
    net = make_network(_replace(net.cfg, train_gather=args.gather))
    cfg = net.cfg
    N = args.num_rays
    K = args.max_samples

    # training-like ray batch from a train pose
    from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
    from nerfsafetyvalidation_tpu.data.rays import get_rays, nerf_matrix_to_ngp
    pose = nerf_matrix_to_ngp(orbit_pose(0.9, 0.6, 2.4), scale=1.0,
                              offset=(0.0, 0.0, 0.0))
    res = 200
    fx = 0.5 * res / np.tan(0.5 * 0.6911)
    rays = get_rays(jnp.asarray(pose[None]), (fx, fx, res / 2, res / 2),
                    res, res)
    idx = jax.random.permutation(jax.random.PRNGKey(0), res * res)[:N]
    ro = jnp.take(rays["rays_o"].reshape(-1, 3), idx, axis=0)
    rd = jnp.take(rays["rays_d"].reshape(-1, 3), idx, axis=0)
    gt = jnp.ones((N, 3)) * 0.5
    aabb = R.aabb_of(cfg)

    def fetch1(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[:1])

    def timeit(name, fn, *a):
        out = fn(*a)
        fetch1(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fetch1(fn(*a))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"part": name, "ms": round(dt, 2)}), flush=True)
        return dt

    from nerfsafetyvalidation_tpu.ops.ray_ops import near_far_from_aabb

    # ---- component ablations at the training sample count: encoder alone
    # (fold build + gathers) and encoder+MLP, fwd and fwd+bwd — attributes
    # the fwd/bwd gap between the march and the full step
    M = N * args.budget
    kx, kd = jax.random.split(jax.random.PRNGKey(2))
    xyz = jax.random.uniform(kx, (M, 3), minval=-cfg.bound,
                             maxval=cfg.bound)
    dirs = jax.random.normal(kd, (M, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def enc_loss(p):
        return jnp.mean(net.encode_pos(p, xyz) ** 2)

    def apply_loss(p):
        sig, rgb = net.apply(p, xyz, dirs)
        return jnp.mean(sig ** 2) + jnp.mean(rgb ** 2)

    timeit("enc_fwd", jax.jit(enc_loss), params)
    timeit("enc_fwd+bwd", jax.jit(jax.grad(enc_loss)), params)
    timeit("apply_fwd", jax.jit(apply_loss), params)
    timeit("apply_fwd+bwd", jax.jit(jax.grad(apply_loss)), params)

    @jax.jit
    def march_only(ro, rd, key):
        nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.min_near)
        m = march_rays(ro, rd, nears, fars, state.density_bitfield,
                       cfg.bound, cfg.cascade, cfg.grid_size,
                       max_samples=K, max_steps=1024, dt_gamma=1.0 / 64,
                       perturb=key, skip_grid=state.skip_grid,
                       samples_per_hit=2)
        return m["ts"]

    def loss_plain(params, ro, rd, key):
        out = R.run_grid(net, params, state, ro, rd, max_samples=K,
                         max_steps=1024, dt_gamma=1.0 / 64, bg_color=1.0,
                         perturb_key=key, samples_per_hit=2,
                         sample_budget=N * args.budget)
        return jnp.mean((out["image"] - gt) ** 2)

    fwd = jax.jit(loss_plain)
    grad_fn = jax.jit(jax.value_and_grad(loss_plain))

    key = jax.random.PRNGKey(1)
    timeit("march", march_only, ro, rd, key)
    timeit("fwd", fwd, params, ro, rd, key)
    timeit("fwd+bwd", grad_fn, params, ro, rd, key)

    # full trainer step (non-donated copy of params for repeat timing)
    import optax
    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    @jax.jit
    def full_step(params, opt_state, ro, rd, key):
        loss, grads = jax.value_and_grad(
            lambda p: loss_plain(p, ro, rd, key))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    out = full_step(params, opt_state, ro, rd, key)
    fetch1(out[2])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = full_step(params, opt_state, ro, rd, key)
        fetch1(out[2])
    print(json.dumps({"part": "step", "ms": round(
        (time.perf_counter() - t0) / args.iters * 1e3, 2)}), flush=True)

    # ---- refresh pieces
    nb = args.partial_blocks
    total = cfg.grid_size ** 3
    fparams = net.to_folded(params)

    @jax.jit
    def probe(fparams, key):
        indices = jnp.arange(total // nb, dtype=jnp.int32) * nb
        from nerfsafetyvalidation_tpu.ops.ray_ops import morton3d_invert
        coords = morton3d_invert(indices)
        xyz = 2.0 * coords.astype(jnp.float32) / (cfg.grid_size - 1) - 1.0
        half = cfg.bound / cfg.grid_size
        pts = xyz * (cfg.bound - half)
        pts = pts + (jax.random.uniform(key, pts.shape) * 2 - 1) * half
        return net.density(fparams, pts)["sigma"]

    timeit("probe(folded)", probe, fparams, key)
    timeit("fold_table", jax.jit(net.to_folded), params)
    timeit("packbits", jax.jit(lambda g: packbits(g, 10.0)),
           state.density_grid)
    timeit("skipgrid", jax.jit(
        lambda g: occupancy_to_skip_grid(g > 10.0, cfg.grid_size)),
        state.density_grid)

    def refresh(p, key):
        return R.update_extra_state(net, p, state, key,
                                    grid_size=cfg.grid_size,
                                    n_blocks=nb, block=0)

    timeit("refresh(partial, unfolded params)", refresh, params, key)
    timeit("refresh(partial, folded params)", refresh, fparams, key)


if __name__ == "__main__":
    main()
