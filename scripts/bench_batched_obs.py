"""Full-fidelity batched-rollout sweep cost vs observation resolution.

VERDICT r2 item 2: the reference's observation is 800^2
(envConfig.json:51-52); round 2 measured the batched engine only at 64^2.
This script builds the FullBatchedRolloutEngine on the TRAINED bench scene
(.bench_cache) and times one MC sweep at obs 100/200/400/800 with the
marched frame-render observation paths (obs_render="fast"/"guided",
in-pass UQ moments — [rays, K, 3] intermediates never materialize), for a
BENCH_NOTES table of wall-clock per sweep at each obs resolution.

Usage: python scripts/bench_batched_obs.py [--res 100,200,400,800]
       [--sims 2] [--steps 12] [--obs-render guided]
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
    ap.add_argument("--res", default="100,200,400,800")
    ap.add_argument("--sims", type=int, default=2)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--obs-render", default="guided",
                    choices=["uniform", "fast", "guided", "scout"])
    ap.add_argument("--uq", default="gaussian",
                    choices=["gaussian", "laplace"])
    ap.add_argument("--iters", type=int, default=1)
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
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)

    net, params, state = bench._train_flagship()
    fparams = net.to_folded(params)
    net_fused = make_network(_replace(net.cfg, fused=True))

    steps = args.steps
    actions = np.tile(np.asarray([10.0, 0.0, 0.0, 0.0], np.float32),
                      (steps, 1))
    sdf = np.full((96, 92, 24), 1.0, np.float32)
    start12 = np.concatenate([np.asarray([-0.5, -0.5, 0.1]),
                              np.zeros(9)]).astype(np.float32)

    for res in [int(r) for r in args.res.split(",")]:
        eng = FullBatchedRolloutEngine(
            actions=actions, dt=2.0 / steps, g=10.0, mass=1.0, I=np.eye(3),
            sdf=sdf, sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12), noise_std=np.full(12, 0.01),
            start_state=start12, net=net_fused, params=fparams,
            obs_res=res, base_res=800, renderer_state=state,
            grid_max_samples=16, obs_group=1, obs_render=args.obs_render,
            uq_method=args.uq, obs_dt_gamma=1.0 / 64)
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (args.sims, steps, 12))
        t0 = time.perf_counter()
        out = eng.run(z)
        _ = np.asarray(out["risk"].ravel()[:1])
        t_first = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eng.run(z)
            _ = np.asarray(out["risk"].ravel()[:1])
        dt = (time.perf_counter() - t0) / args.iters
        n_renders = args.sims * steps
        print(json.dumps({
            "obs_res": res, "obs_render": args.obs_render, "uq": args.uq,
            "sims": args.sims, "steps": steps,
            "sweep_s": round(dt, 3),
            "first_call_s": round(t_first, 1),
            "s_per_sim": round(dt / args.sims, 3),
            "ms_per_obs_render": round(dt / n_renders * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
