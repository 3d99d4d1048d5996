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

    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.ops.ray_ops import packbits
    from nerfsafetyvalidation_tpu.parallel.mesh import (get_mesh,
                                                        replicate_params,
                                                        shard_batch)
    from nerfsafetyvalidation_tpu.parallel.render import render_frame_sharded
    from nerfsafetyvalidation_tpu.validation.batched import (
        BatchedRolloutEngine)

    cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0,
                        grid_ray=True)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    st = R.RendererState.create(cfg.cascade, cfg.grid_size)
    grid = jnp.full_like(st.density_grid, 10.0)
    state = R.RendererState(grid, packbits(grid, 0.5), st.mean_density,
                            st.iter_density, None)

    rng = np.random.default_rng(0)
    rows_render = []
    rows_roll = []
    for n_dev in (1, 2, 4, 8):
        mesh = get_mesh(n_dev)
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
                                       max_samples=8, max_steps=64)
            jax.block_until_ready(out["image"])

        run()
        t0 = time.perf_counter()
        for _ in range(3):
            run()
        dt = (time.perf_counter() - t0) / 3
        rows_render.append((n_dev, n, dt))
        print(f"render {n_dev} dev x {args.rays_per_dev} rays: {dt*1e3:.1f} ms")

        # rollout engine (dynamics+SDF core; population sharded)
        eng = BatchedRolloutEngine(
            actions=np.tile(np.asarray([10.2, 0.01, 0, 0], np.float32),
                            (12, 1)),
            dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
            sdf=np.full((96, 92, 24), 1.0, np.float32),
            sdf_start=[-1.4, -1.3, -0.1], granularity=40,
            noise_mean=np.zeros(12, np.float32),
            noise_std=np.full(12, 0.01, np.float32),
            start_state=np.concatenate(
                [np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(
                    np.float32),
            mesh=mesh)
        m = args.sims_per_dev * n_dev
        noises = eng.sample_noises(jax.random.PRNGKey(1), m)

        def roll():
            jax.block_until_ready(eng.run(noises)["risk"])

        roll()
        t0 = time.perf_counter()
        for _ in range(3):
            roll()
        dtr = (time.perf_counter() - t0) / 3
        rows_roll.append((n_dev, m, dtr))
        print(f"rollouts {n_dev} dev x {args.sims_per_dev} sims: "
              f"{dtr*1e3:.1f} ms")

    with open(args.out, "w") as f:
        f.write("# Multi-chip weak scaling (virtual CPU mesh)\n\n")
        f.write("Measured by scripts/measure_scaling.py — per-device "
                "workload FIXED, mesh grown 1->8. Ideal weak scaling = "
                "flat time. The virtual CPU mesh shares host cores, so "
                "these numbers certify program structure (sharding "
                "compiles, outputs correct, time grows sub-linearly in "
                "total work); real-slice numbers ride ICI.\n\n")
        f.write(f"## shard_map frame render ({args.rays_per_dev} rays/dev, "
                "marched, 8 slots)\n\n| devices | rays | time (ms) | vs 1-dev |\n|---|---|---|---|\n")
        base = rows_render[0][2]
        for n_dev, n, dt in rows_render:
            f.write(f"| {n_dev} | {n} | {dt*1e3:.1f} | {dt/base:.2f}x |\n")
        f.write(f"\n## batched rollouts ({args.sims_per_dev} sims/dev, "
                "12 steps)\n\n| devices | sims | time (ms) | vs 1-dev |\n|---|---|---|---|\n")
        base = rows_roll[0][2]
        for n_dev, m, dt in rows_roll:
            f.write(f"| {n_dev} | {m} | {dt*1e3:.1f} | {dt/base:.2f}x |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
