"""Steady-state training throughput (ms/step @ 4096 rays, post-carve).

VERDICT r2 item 5 measurement harness: loads the trained bench checkpoint
(.bench_cache), rebuilds the post-carve training configuration (K=32,
budget 16) and times (a) the bare jitted train step and (b) the amortized
grid refresh — full probe vs the strided partial probes
(--grid-partial-blocks), on the tunneled TPU.

Usage: python scripts/bench_train.py [--steps 64] [--interval 16]
       [--grid-partial-blocks 4]
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
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--interval", type=int, default=16)
    ap.add_argument("--grid-partial-blocks", type=int, default=4)
    ap.add_argument("--num-rays", type=int, default=4096)
    ap.add_argument("--gather-modes", default="corner8",
                    help="comma list of config.train_gather strategies to "
                         "sweep (corner8,pair,quad,cube,foldrow)")
    ap.add_argument("--budgets", default="16",
                    help="comma list of post-carve sample budgets per ray")
    ap.add_argument("--steps-per-dispatch", type=int, default=16,
                    help="block size for the fused lax.scan path "
                         "(0 disables the fused measurement)")
    args = ap.parse_args()

    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import bench
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.data.provider import NeRFDataset

    net, params, state = bench._train_flagship()

    # rebuild the trainer exactly as bench does, but resume from the
    # checkpoint and measure steps only
    from nerfsafetyvalidation_tpu.train.trainer import Trainer

    scene_dir = os.path.join(bench._CACHE, "scene")

    class Opt:
        path = scene_dir
        color_space = "srgb"
        scale = 1.0
        offset = (0.0, 0.0, 0.0)
        bound = 1.0
        fp16 = True
        preload = True
        rand_pose = -1
        downscale = 1
        num_rays = args.num_rays
        error_map = False
        lr = 1e-2
        iters = 10 ** 9
        num_steps = 128
        upsample_steps = 0
        max_ray_batch = 4096
        grid_max_samples = 32          # post-carve values
        grid_samples_per_hit = 2
        grid_sample_budget_per_ray = 16
        grid_warmup_steps = 0
        grid_budget_after_warmup = 16
        grid_max_samples_after_warmup = 32
        grid_partial_blocks = args.grid_partial_blocks
        update_extra_interval = args.interval
        max_steps = 1024
        dt_gamma = 1.0 / 64
        seed = 0

    train_loader = NeRFDataset(Opt, type="train").dataloader()
    data = next(iter(train_loader))

    def time_cfg(mode, budget):
        """Bare-step ms for one (train_gather, budget) configuration."""
        from dataclasses import replace as _replace
        Opt.grid_sample_budget_per_ray = budget
        Opt.grid_budget_after_warmup = budget
        net_m = make_network(_replace(net.cfg, train_gather=mode))
        tr = Trainer("flagship", Opt, net_m,
                     workspace=os.path.join(bench._CACHE, "ws"),
                     use_checkpoint="latest", fp16=True, mute=True,
                     eval_interval=10 ** 9)
        tr.renderer_state = state
        tr.global_step = max(tr.global_step, 10 ** 6)  # post-warmup

        def fetch():
            leaf = jax.tree_util.tree_leaves(tr.params)[0]
            _ = np.asarray(leaf.ravel()[:1])

        tr.train_step(data)
        fetch()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tr.train_step(data)
        fetch()
        return tr, (time.perf_counter() - t0) / args.steps

    modes = args.gather_modes.split(",")
    budgets = [int(b) for b in args.budgets.split(",")]
    sweep = {}
    for m in modes:
        for b in budgets:
            try:
                trainer, dt = time_cfg(m, b)
            except Exception as e:                          # noqa: BLE001
                print(json.dumps({"mode": m, "budget": b,
                                  "error": str(e)[:200]}), flush=True)
                continue
            sweep[f"{m}/b{b}"] = round(dt * 1e3, 2)
            print(json.dumps({"mode": m, "budget": b,
                              "ms_per_step_bare": round(dt * 1e3, 2)}),
                  flush=True)
    dt_step = min(sweep.values()) / 1e3 if sweep else float("nan")

    # grid refresh timing (full vs partial) through the trainer's single
    # jitted refresh program (fold rebuild + probe + packbits + skip grid)
    def time_update(n_blocks, block):
        import jax.numpy as jnp
        fn = trainer._refresh_fn(n_blocks, block)
        # non-donated copies: the timing loop reuses the same input state
        st0 = jax.tree_util.tree_map(jnp.array, trainer.renderer_state)
        st = fn(trainer.params, st0, jax.random.PRNGKey(0))
        _ = np.asarray(st.mean_density)          # warm + fence
        t0 = time.perf_counter()
        for i in range(4):
            st0 = jax.tree_util.tree_map(jnp.array, trainer.renderer_state)
            st = fn(trainer.params, st0, jax.random.PRNGKey(i))
            _ = np.asarray(st.mean_density)
        return (time.perf_counter() - t0) / 4

    t_full = time_update(1, 0)
    nb = args.grid_partial_blocks
    t_part = time_update(nb, 0) if nb > 1 else t_full

    # the REAL loop: fresh ray batch from the (preloaded, device-resident)
    # dataloader every step — measures what Trainer.train_one_epoch pays
    def fetch():
        leaf = jax.tree_util.tree_leaves(trainer.params)[0]
        _ = np.asarray(leaf.ravel()[:1])

    it = iter(train_loader)

    def next_batch():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(train_loader)
            return next(it)

    trainer.train_step(next_batch())
    fetch()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainer.train_step(next_batch())
    fetch()
    dt_loader = (time.perf_counter() - t0) / args.steps

    # fused multi-step path: k (collate + step) iterations per dispatch
    # (trainer._scan_block_fn over lax.scan — identical trajectory,
    # tests/test_trainer.py::test_fused_steps_match_stepwise)
    dt_fused = float("nan")
    k = args.steps_per_dispatch
    if k > 0:
        import jax.numpy as jnp
        ds = train_loader._data
        src_ids = (id(ds.poses), id(ds.images))
        if getattr(ds, "_dev_cache_ids", None) != src_ids:
            ds._poses_dev = jnp.asarray(ds.poses)
            ds._images_flat = ds.images.reshape(
                len(ds.poses), -1, ds.images.shape[-1])
            ds._dev_cache_ids = src_ids
        fn = trainer._scan_block_fn(ds, k)

        def block_inputs(i):
            idxs = jnp.asarray(
                np.arange(i, i + k, dtype=np.int32) % len(ds.poses))
            ckeys = jax.random.split(jax.random.PRNGKey(100 + i), k)
            return ckeys, idxs

        def run_block(i):
            ckeys, idxs = block_inputs(i)
            (trainer.params, trainer.opt_state, trainer.ema_params,
             trainer.key, loss) = fn(
                trainer.params, trainer.opt_state, trainer.ema_params,
                trainer.key, ckeys, idxs, ds._poses_dev, ds._images_flat,
                trainer.renderer_state)
            return loss

        np.asarray(run_block(0))                       # compile + fence
        n_blocks_timed = max(1, args.steps // k)
        t0 = time.perf_counter()
        loss = None
        for i in range(n_blocks_timed):
            loss = run_block(i + 1)
        np.asarray(loss)
        dt_fused = (time.perf_counter() - t0) / (n_blocks_timed * k)

    amort_full = t_full / args.interval
    amort_part = t_part / args.interval
    total_ms = (dt_step + amort_part) * 1e3
    total_loader_ms = (dt_loader + amort_part) * 1e3
    total_fused_ms = (dt_fused + amort_part) * 1e3
    print(json.dumps({
        "ms_per_step_bare": round(dt_step * 1e3, 2),
        "bare_step_sweep_ms": sweep,
        "ms_per_step_loader": round(dt_loader * 1e3, 2),
        "grid_update_full_ms": round(t_full * 1e3, 1),
        "grid_update_partial_ms": round(t_part * 1e3, 1),
        "partial_blocks": nb,
        "interval": args.interval,
        "ms_per_step_with_refresh": round(total_ms, 2),
        "steps_per_s": round(1e3 / total_ms, 1),
        "steps_per_s_loader": round(1e3 / total_loader_ms, 1),
        "ms_per_step_fused": round(dt_fused * 1e3, 2),
        "steps_per_dispatch": k,
        "steps_per_s_fused": round(1e3 / total_fused_ms, 1),
        "num_rays": args.num_rays,
    }), flush=True)


if __name__ == "__main__":
    main()
