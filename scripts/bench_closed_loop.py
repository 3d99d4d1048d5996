"""Closed-loop batched engine measurement table (VERDICT r3 item 2).

Times the in-scan filtered-MPC engine (validation/closed_loop.py) on the
TRAINED bench flagship (.bench_cache) across the reference-shaped knob
grid — observation resolution x estimator N_iter x replan epochs — and,
with --seq, the like-for-like sequential loop (Agent + Estimator +
fixed-horizon Planner stepped by hand exactly as NerfSimulator.step does)
for the same knobs. Reference workload anchors: estimator N_iter=100 and
batch_size=1024 interest pixels (envConfig.json:7-11), planner steps=12 /
epochs_update=250 (envConfig.json:39-42), per-step estimate+replan loop
NerfSimulator.py:120-129 / estimator_helpers.py:261-319.

The engine runs obs_render="frame": the full obs^2 observation image is
rendered in-scan each step (the reference camera captures a whole frame,
NerfSimulator.py:113-115) and the fixed 1024-pixel interest set is
gathered from it — so the obs sweep pays the real camera cost.

Each config prints one JSON line:
  {"obs", "n_iter", "epochs", "sims", "steps", "compile_s", "sweep_s",
   "s_per_step", "s_per_sim_step"}.

Usage:
  python scripts/bench_closed_loop.py [--obs 32,64,100] [--n-iter 20,100]
      [--epochs 2,50,250] [--steps 12] [--sims 2] [--iters 1]
  python scripts/bench_closed_loop.py --seq --obs 64 --n-iter 20 --epochs 2
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PIXELS = 1024          # reference estimator batch_size (envConfig.json:9)


def interest_coords(H, W, n=N_PIXELS):
    """Fixed strided interest grid (the traceable stand-in for SIFT
    find_POI + dilation + RNG sampling; COMPONENTS.md known deltas)."""
    g = int(np.ceil(np.sqrt(n)))
    rows = np.linspace(0, H - 1, g).astype(int)
    cols = np.linspace(0, W - 1, g).astype(int)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    return np.stack([rr.reshape(-1), cc.reshape(-1)], axis=-1)[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", default="32,64,100")
    ap.add_argument("--n-iter", default="20,100")
    ap.add_argument("--epochs", default="2,50,250")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--sims", type=int, default=2)
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--seq", action="store_true",
                    help="run the sequential comparator instead")
    ap.add_argument("--obs-render", default="frame",
                    choices=["frame", "pixels"])
    ap.add_argument("--cem", action="store_true",
                    help="run a CLOSED-LOOP CEM sweep (kmax x m) through "
                         "the engine at each config — the reference's CEM "
                         "semantics, where every rollout steps the full "
                         "simulator incl. estimator+replan "
                         "(CrossEntropyMethod.py:79-198 via "
                         "NerfSimulator.step)")
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--m-elite", type=int, default=3)
    ap.add_argument("--kmax", type=int, default=5)
    ap.add_argument("--uq", default="none",
                    choices=["none", "gaussian", "laplace"],
                    help="compose a FullBatchedRolloutEngine obs chain so "
                         "every closed-loop step ALSO computes the "
                         "uncertainty-masked reward — the COMPLETE "
                         "NerfSimulator.step (NerfSimulator.py:66-181); "
                         "with --cem the risk carries the reward-scaled "
                         "adjustment (CEM.py:110-122)")
    ap.add_argument("--uq-obs-render", default="uniform",
                    choices=["uniform", "scout"],
                    help="the UQ engine's in-scan observation path")
    ap.add_argument("--sim-group", type=int, default=0,
                    help="vmap at most this many sims per device program "
                         "(0 = whole population). Required at obs 800 "
                         "frame observations: one sim's in-scan frame "
                         "intermediates are ~GBs")
    ap.add_argument("--csv", default="",
                    help="append the 27-col reference CSV here (--cem)")
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
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.nav.math_utils import vec_to_rot_matrix
    from nerfsafetyvalidation_tpu.nav.planner import Planner
    from nerfsafetyvalidation_tpu.validation.closed_loop import (
        ClosedLoopBatchedEngine)

    net, params, state = bench._train_flagship()
    fparams = net.to_folded(params)

    # planner/estimator shared configuration (test_closed_loop.py shape,
    # reference-scale geometry inside the unit bound)
    sp = jnp.asarray([-0.5, -0.5, 0.1])
    ep = jnp.asarray([0.5, 0.5, 0.1])
    zeros3 = jnp.zeros(3)
    sR = vec_to_rot_matrix(zeros3)
    start18 = jnp.concatenate([sp, zeros3, sR.reshape(-1), zeros3])
    end18 = jnp.concatenate([ep, zeros3, sR.reshape(-1), zeros3])
    start12 = jnp.concatenate([sp, zeros3, zeros3, zeros3])
    steps = args.steps
    dt = 2.0 / steps                       # T_final=2.0 (envConfig.json:38)
    sdf = np.full((96, 92, 24), 1.0, np.float32)    # free-space SDF grid

    rot = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    # params ride the engine jit as ARGUMENTS (render_params=fparams
    # below): the 537 MB folded table as a closure constant blows past the
    # tunneled remote-compile request limit (HTTP 413, caught 2026-08-19)
    def density_fn(p, x):
        return net.density(p, x.reshape((-1, 3)) @ rot)["sigma"] \
            .reshape(x.shape[:-1])

    def render_rays_fn(p, rays_o, rays_d):
        # the estimator DIFFERENTIATES the measurement render w.r.t. the
        # pose (closed_loop.py _estimate), so the obs chain must be the
        # uniform fixed-shape renderer (reverse-mode safe), not the
        # while-loop marcher — same choice as tests/test_closed_loop.py
        # and the reference's fully-differentiable torch render.
        # R.render takes [B, N, 3] — the engine passes (1, -1, 3).
        return R.render(net, p, rays_o, rays_d, staged=False,
                        bg_color=1.0, num_steps=32, upsample_steps=0)

    def planner_cfg(epochs):
        return {"T_final": 2.0, "steps": steps, "lr": 1e-3,
                "epochs_init": 2, "epochs_update": epochs,
                "fade_out_epoch": 0, "fade_out_sharpness": 10,
                "exp_name": "clbench", "I": jnp.eye(3), "g": 10.0,
                "mass": 1.0, "fixed_horizon": True,
                "body": np.asarray([[-0.05, 0.05], [-0.05, 0.05],
                                    [-0.02, 0.02]]),
                "nbins": [4, 4, 2]}

    obs_list = [int(v) for v in args.obs.split(",")]
    n_iter_list = [int(v) for v in args.n_iter.split(",")]
    epochs_list = [int(v) for v in args.epochs.split(",")]

    if args.seq:
        run_sequential(args, obs_list, n_iter_list, epochs_list, start12,
                       start18, end18, planner_cfg, density_fn, net,
                       fparams, state, dt)
        return

    density1 = lambda x: density_fn(fparams, x)   # host-side Planner form
    planner0 = Planner(start18, end18, planner_cfg(2), density1)
    knots0 = np.asarray(planner0.states)
    ia0 = np.asarray(planner0.initial_accel)

    for obs in obs_list:
        # intrinsics scale with obs like the batched engines (base 800)
        s = obs / 800.0
        intr = (1111.0 * s, 1111.0 * s, obs / 2.0, obs / 2.0)
        coords = interest_coords(obs, obs)
        uq_engine = None
        if args.uq != "none":
            from nerfsafetyvalidation_tpu.validation.batched import (
                FullBatchedRolloutEngine)
            uq_engine = FullBatchedRolloutEngine(
                actions=np.zeros((steps, 4), np.float32), dt=dt, g=10.0,
                mass=1.0, I=np.eye(3), sdf=sdf,
                sdf_start=[-1.4, -1.3, -0.1], granularity=40,
                noise_mean=np.zeros(12), noise_std=np.full(12, 0.01),
                start_state=start12, net=net, params=fparams,
                obs_res=obs, base_res=800, render_steps=32,
                obs_render=args.uq_obs_render, uq_method=args.uq,
                renderer_state=(state if args.uq_obs_render == "scout"
                                else None),
                uq_iters=20)
        for n_iter in n_iter_list:
            for epochs in epochs_list:
                eng = ClosedLoopBatchedEngine(
                    steps=steps, dt=dt, g=10.0, mass=1.0, I=np.eye(3),
                    sdf=sdf, sdf_start=[-1.4, -1.3, -0.1], granularity=40,
                    noise_mean=np.zeros(12), noise_std=np.full(12, 0.01),
                    start_state=start12, fixed_coords=coords,
                    intrinsics=intr, obs_hw=(obs, obs),
                    render_rays_fn=render_rays_fn, n_iter=n_iter,
                    est_lr=1e-3, filter=True, end_state=end18,
                    knots0=knots0, initial_accel0=ia0,
                    epochs_update=epochs, planner_lr=1e-3,
                    density_fn=density_fn, render_params=fparams,
                    robot_body=planner0.robot_body,
                    obs_render=args.obs_render, uq_engine=uq_engine,
                    sim_group=args.sim_group or None)
                key = jax.random.PRNGKey(0)
                if args.cem:
                    # warm the compile with one m-rollout round, then the
                    # timed closed-loop CEM sweep (inherits the base CEM
                    # host loop: full-cov Cholesky proposals + exact
                    # sequential proposal update; risk = min SDF)
                    zw = eng.sample_noises(key, args.m)
                    t0 = time.perf_counter()
                    out = eng.run(zw)
                    _ = np.asarray(out["risk"].ravel()[:1])
                    compile_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    res = eng.cem(jax.random.PRNGKey(1), m=args.m,
                                  m_elite=args.m_elite, kmax=args.kmax,
                                  csv_path=args.csv or None)
                    wall = time.perf_counter() - t0
                    n_roll = args.kmax * args.m
                    print(json.dumps({
                        "mode": "closed_loop_cem", "uq": args.uq, "obs": obs,
                        "n_iter": n_iter, "epochs": epochs,
                        "m": args.m, "m_elite": args.m_elite,
                        "kmax": args.kmax, "steps": args.steps,
                        "compile_s": round(compile_s, 1),
                        "cem_wall_s": round(wall, 2),
                        "s_per_rollout": round(wall / n_roll, 3),
                        "history": res["history"],
                    }), flush=True)
                    continue
                z = eng.sample_noises(key, args.sims)
                t0 = time.perf_counter()
                out = eng.run(z)
                _ = np.asarray(out["risk"].ravel()[:1])
                t_first = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = eng.run(z)
                    _ = np.asarray(out["risk"].ravel()[:1])
                sweep = (time.perf_counter() - t0) / args.iters
                print(json.dumps({
                    "uq": args.uq, "obs": obs, "n_iter": n_iter,
                    "epochs": epochs,
                    "sims": args.sims, "steps": steps,
                    "obs_render": args.obs_render,
                    "compile_s": round(t_first - sweep, 1),
                    "sweep_s": round(sweep, 3),
                    "s_per_step": round(sweep / steps, 4),
                    "s_per_sim_step": round(sweep / (steps * args.sims), 4),
                }), flush=True)


def run_sequential(args, obs_list, n_iter_list, epochs_list, start12,
                   start18, end18, planner_cfg, density_fn, net, fparams,
                   state, dt):
    """The like-for-like sequential comparator: Agent + Estimator
    (fixed_coords) + fixed-horizon Planner stepped by hand exactly as
    NerfSimulator.step / the cross-check test do."""
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.rays import get_rays
    from nerfsafetyvalidation_tpu.nav.agent import Agent
    from nerfsafetyvalidation_tpu.nav.camera import CannedCamera
    from nerfsafetyvalidation_tpu.nav.estimator import Estimator
    from nerfsafetyvalidation_tpu.nav.planner import Planner
    from nerfsafetyvalidation_tpu.validation.closed_loop import state12_to_18

    def render_fn(rays_o, rays_d):
        # differentiable obs chain — must match the engine path (the
        # sequential Estimator also grads through render_fn); Estimator
        # passes [B, N, 3] / get_rays dicts, R.render's native shape.
        # Eager full-frame form (render_from_pose) — closure params fine.
        return R.render(net, fparams, rays_o, rays_d, staged=False,
                        bg_color=1.0, num_steps=32, upsample_steps=0)

    def render_batch_p(p, rays_o, rays_d):
        # jitted-measurement form: params ride the Estimator fit as an
        # ARGUMENT (render_params below) — closure-captured folded tables
        # exceed the tunneled remote-compile request limit (HTTP 413)
        return R.render(net, p, rays_o, rays_d, staged=False,
                        bg_color=1.0, num_steps=32, upsample_steps=0)

    for obs in obs_list:
        s = obs / 800.0
        intr = (1111.0 * s, 1111.0 * s, obs / 2.0, obs / 2.0)
        coords = interest_coords(obs, obs)

        def get_rays_fn(pose):
            return get_rays(pose, intr, obs, obs)

        for n_iter in n_iter_list:
            for epochs in epochs_list:
                pcfg = planner_cfg(epochs)
                filter_cfg = {"dil_iter": 2, "kernel_size": 3,
                              "batch_size": len(coords), "lrate": 1e-3,
                              "N_iter": n_iter, "render_viz": False,
                              "show_rate": [20, 100], "sig0": jnp.eye(12),
                              "Q": jnp.eye(12), "fixed_coords": coords}
                agent = Agent({"x0": start12, "dt": dt, "g": 10.0,
                               "mass": 1.0, "I": np.eye(3).tolist()},
                              {"res_x": obs, "res_y": obs, "trans": True,
                               "mode": "RGBA"},
                              camera=CannedCamera(res_x=obs, res_y=obs))
                est = Estimator(filter_cfg, agent, start12,
                                get_rays_fn=get_rays_fn,
                                render_fn=render_fn,
                                render_batch_fn=render_batch_p,
                                render_params=fparams)
                # density params ride the jitted replan block as an
                # argument (Planner density_params) — see the 413 note
                planner = Planner(start18, end18, pcfg, density_fn,
                                  density_params=fparams)
                rng = np.random.default_rng(7)
                t0 = time.perf_counter()
                t_first = None
                for t in range(args.steps):
                    action = np.asarray(planner.get_next_action())
                    true_pose, true_state, _ = agent.step(
                        action, noise=jnp.asarray(
                            rng.normal(0, 0.01, 12), dtype=jnp.float32))
                    nerf_img = est.render_from_pose(jnp.asarray(true_pose))
                    img_u8 = (np.asarray(nerf_img).reshape(obs, obs, 3)
                              * 255).astype(np.uint8)
                    xt = est.estimate_state(img_u8, true_pose, action)
                    planner.update_state(state12_to_18(xt))
                    planner.learn_update(t)
                    if t_first is None:
                        t_first = time.perf_counter() - t0
                        t0 = time.perf_counter()
                total = time.perf_counter() - t0
                warm_steps = max(args.steps - 1, 1)
                print(json.dumps({
                    "mode": "sequential", "obs": obs, "n_iter": n_iter,
                    "epochs": epochs, "steps": args.steps,
                    "first_step_s": round(t_first, 1),
                    "s_per_step": round(total / warm_steps, 4),
                }), flush=True)


if __name__ == "__main__":
    main()
