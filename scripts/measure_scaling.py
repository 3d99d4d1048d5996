"""Weak-scaling measurement over the data mesh (VERDICT r1 item 8).

Runs the shard_map frame renderer and the full batched rollout engine at a
FIXED per-device workload for n_devices in {1, 2, 4, 8} and records
wall-clock times into MULTICHIP_NOTES.md. On this machine the mesh is 8
virtual CPU devices (numbers are indicative of program structure, not ICI);
on a real slice the same script runs unchanged.

Usage: python scripts/measure_scaling.py [--rays-per-dev 4096] [--out FILE]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays-per-dev", type=int, default=4096)
    ap.add_argument("--sims-per-dev", type=int, default=64)
    ap.add_argument("--out", default="MULTICHIP_NOTES.md")
    args = ap.parse_args()

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
