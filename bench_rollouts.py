"""Secondary benchmark: batched rollout throughput (rollouts/sec) for the
safety-validation stress tests — BASELINE.json configs 4-5.

The reference runs MC/CEM rollouts strictly sequentially
(MonteCarlo.py:38-93); each rollout costs seconds-to-minutes (Blender render
+ estimator + replan per step). This measures the TPU-native vmapped engine
(validation/batched.py): whole disturbance populations of
(dynamics -> SDF collision -> likelihood) trajectories as one jit.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured against an OPTIMISTIC estimate of the reference's
rollout rate (1 rollout/sec — the reference's own loop does NeRF renders and
1000-epoch replans per step, so its true rate is far lower; >=10x this
number is the BASELINE.json bar).
"""

import json
import time

import numpy as np

REFERENCE_ROLLOUTS_PER_SEC = 1.0


def main():
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.validation.batched import BatchedRolloutEngine

    steps = 12                       # envConfig.json planner steps
    n_sims = 8192                    # population per launch
    actions = np.tile(np.asarray([10.0, 0.0, 0.0, 0.0], dtype=np.float32),
                      (steps, 1))
    g = 64
    xs = np.linspace(-1, 1, g)
    sdf = np.ones((g, g, g), dtype=np.float32)
    sdf[np.abs(xs)[:, None, None] * np.ones((1, g, g)) > 0.7] = 0.0

    eng = BatchedRolloutEngine(
        actions=actions, dt=2.0 / steps, g=10.0, mass=1.0, I=np.eye(3),
        sdf=sdf, sdf_start=[-1, -1, -1], granularity=g / 2,
        noise_mean=np.zeros(12),
        noise_std=np.asarray([2e-2] * 3 + [1e-2] * 3 + [2e-2] * 3 + [1e-2] * 3,
                             dtype=np.float32),
        start_state=np.zeros(12, dtype=np.float32))

    key = jax.random.PRNGKey(0)
    noises = eng.sample_noises(key, n_sims)
    out = eng.run(noises)
    _ = np.asarray(out["risk"][:1])  # force completion (tunneled platform)

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = eng.run(noises)
        _ = np.asarray(out["risk"][:1])
    dt = (time.perf_counter() - t0) / n_iters

    rollouts_per_sec = n_sims / dt
    print(json.dumps({
        "metric": f"rollouts/sec (batched 12-step MC rollouts, "
                  f"dynamics+SDF+likelihood core ONLY, population {n_sims})",
        "value": round(rollouts_per_sec),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_sec / REFERENCE_ROLLOUTS_PER_SEC, 1),
    }))

    # full-fidelity engine: NeRF observation render + Gaussian UQ + reward +
    # SDF inside the scan (validate.py --batched_rollouts path)
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import make_network

    cfg = NetworkConfig(num_levels=8, desired_resolution=512, bound=1.0)
    net = make_network(cfg)
    params = net.init(jax.random.PRNGKey(0))
    m_full = 16
    feng = FullBatchedRolloutEngine(
        actions=actions, dt=2.0 / steps, g=10.0, mass=1.0, I=np.eye(3),
        sdf=sdf, sdf_start=[-1, -1, -1], granularity=g / 2,
        noise_mean=np.zeros(12),
        noise_std=np.asarray([2e-2] * 3 + [1e-2] * 3 + [2e-2] * 3
                             + [1e-2] * 3, dtype=np.float32),
        start_state=np.zeros(12, dtype=np.float32), net=net, params=params,
        obs_res=64, render_steps=32, base_intrinsics=(90.0, 90.0, 32, 32),
        base_res=64, obs_group=2)
    z = jax.random.normal(jax.random.PRNGKey(1), (m_full, steps, 12))
    out = feng.run(z)
    _ = np.asarray(out["risk"][:1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = feng.run(z)
        _ = np.asarray(out["risk"][:1])
    dtf = (time.perf_counter() - t0) / 3
    print(json.dumps({
        "metric": f"rollouts/sec (FULL-fidelity 12-step rollouts: 64^2 "
                  f"NeRF obs render + Gaussian UQ + reward + SDF in-scan, "
                  f"population {m_full})",
        "value": round(m_full / dtf, 2),
        "unit": "rollouts/s",
        "vs_baseline": round(m_full / dtf / REFERENCE_ROLLOUTS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
