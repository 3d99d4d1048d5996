"""One definitive reference-configuration CEM headline (VERDICT r3 item 3).

Runs the full-fidelity batched CEM engine (validation/batched.py
FullBatchedRolloutEngine.cem — full-covariance [T,12,12] Cholesky
proposals, exact sequential proposal update, 27-column reference CSV
schema CrossEntropyMethod.py:173-189) at the reference sweep shape:
kmax=5 proposal rounds x m=10 rollouts (reference validate.py:39,
CrossEntropyMethod.py:49-305), 12 steps (envConfig.json:39), observations
rendered IN-SCAN at the reference 800^2 (envConfig.json:51-52) through the
scout/guided frame paths with in-pass UQ — both the Gaussian and the
in-scan Bayesian-Laplace variants.

Reports wall-clock per CEM sweep, rollouts/s (kmax*m rollouts of `steps`
steps each), and the restatement against the measured sequential
comparator (BENCH_NOTES "fixed_horizon" row: 7.71 s/step => a kmax=5 x
m=10 x 12-step sweep costs ~4626 s sequentially).

Usage: python scripts/bench_cem.py [--obs 800] [--m 10] [--kmax 5]
    [--steps 12] [--uq gaussian,laplace] [--obs-render scout]
    [--csv results/collisionValuesBatchedCEM.csv]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_S_PER_STEP = 7.71     # measured sequential --fixed_horizon comparator
                          # (BENCH_NOTES "MPC step cost", round 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=800)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--m-elite", type=int, default=3)
    ap.add_argument("--kmax", type=int, default=5)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--uq", default="gaussian,laplace")
    ap.add_argument("--obs-render", default="scout",
                    choices=["uniform", "fast", "guided", "scout"])
    ap.add_argument("--obs-group", type=int, default=1)
    ap.add_argument("--csv", default="results/collisionValuesBatchedCEM")
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
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)

    net, params, state = bench._train_flagship()
    fparams = net.to_folded(params)

    steps = args.steps
    actions = np.tile(np.asarray([10.0, 0.0, 0.0, 0.0], np.float32),
                      (steps, 1))
    sdf = np.full((96, 92, 24), 1.0, np.float32)
    start12 = np.concatenate([np.asarray([-0.5, -0.5, 0.1]),
                              np.zeros(9)]).astype(np.float32)
    # reference proposal init: mpc_noise_mean/std (envConfig.json:44-58)
    noise_std = np.asarray([0.02] * 3 + [0.01] * 3 + [0.01] * 3
                           + [0.005] * 3, np.float32)

    for uq in args.uq.split(","):
        eng = FullBatchedRolloutEngine(
            actions=actions, dt=2.0 / steps, g=10.0, mass=1.0, I=np.eye(3),
            sdf=sdf, sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12), noise_std=noise_std,
            start_state=start12, net=net, params=fparams,
            obs_res=args.obs, base_res=800, renderer_state=state,
            grid_max_samples=16, obs_group=args.obs_group,
            obs_render=args.obs_render, uq_method=uq,
            obs_dt_gamma=1.0 / 64)

        csv_path = f"{args.csv}_{uq}_n{args.m}.csv" if args.csv else None
        if csv_path and os.path.exists(csv_path):
            os.remove(csv_path)

        # warm the compile outside the timed sweep (one m-rollout round)
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (args.m, steps, 12))
        t0 = time.perf_counter()
        out = eng.run(z, adapt_std=False)
        _ = np.asarray(out["risk"].ravel()[:1])
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = eng.cem(jax.random.PRNGKey(1), m=args.m,
                      m_elite=args.m_elite, kmax=args.kmax,
                      csv_path=csv_path)
        wall = time.perf_counter() - t0
        n_rollouts = args.kmax * args.m
        seq_wall = SEQ_S_PER_STEP * steps * n_rollouts
        print(json.dumps({
            "uq": uq, "obs": args.obs, "obs_render": args.obs_render,
            "m": args.m, "m_elite": args.m_elite, "kmax": args.kmax,
            "steps": steps, "compile_s": round(compile_s, 1),
            "cem_wall_s": round(wall, 2),
            "rollouts_per_s": round(n_rollouts / wall, 3),
            "s_per_rollout": round(wall / n_rollouts, 3),
            "vs_sequential_x": round(seq_wall / wall, 1),
            "seq_comparator_s": round(seq_wall, 0),
            "csv": csv_path,
            "history": res["history"],
        }), flush=True)


if __name__ == "__main__":
    main()
