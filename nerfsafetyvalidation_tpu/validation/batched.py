"""Batched (vmapped) rollout engine — the TPU-native rewrite of the
validation loop.

The reference runs Monte-Carlo / CEM rollouts strictly sequentially in Python
(MonteCarlo.py:38-93, CrossEntropyMethod.py:79-198): one disturbance vector
at a time through dynamics -> SDF lookup -> likelihood. On TPU the entire
population of disturbance trajectories runs as ONE jitted program:
`vmap(scan(step))` over [n_sims, steps, 12] noise tensors — dynamics, SDF
collision checks, per-step Gaussian log-likelihoods and collision masking all
on-device (SURVEY.md §2c "rollout parallelism", BASELINE.json configs 4-5).

This engine drives the open-loop rollout core (planner actions precomputed,
estimator/replan excluded from the jit boundary — those interleave host cv2 /
external cameras). The full-fidelity sequential mode in stresstests/ remains
for exact reference semantics; this is the throughput path, and what the
`rollouts/sec` benchmark measures. Optionally shards the simulation axis over
a device mesh for multi-chip scaling.
"""

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nav.agent import drone_dynamics

_LOG_2PI = float(np.log(2.0 * np.pi))


class BatchedRolloutEngine:
    def __init__(self, actions, dt, g, mass, I, sdf, sdf_start, granularity,
                 noise_mean, noise_std, start_state, mesh=None):
        """actions: [T, 4] planner action sequence (open loop);
        sdf: [X, Y, Z] signed distances (meters); sdf_start: [3] world coords
        of grid origin; granularity: cells per meter; noise_mean/std: [12]."""
        self.actions = jnp.asarray(actions, dtype=jnp.float32)
        self.steps = self.actions.shape[0]
        self.dt = float(dt)
        self.g = float(g)
        self.mass = float(mass)
        self.I = jnp.asarray(I, dtype=jnp.float32)
        self.invI = jnp.linalg.inv(self.I)
        self.sdf = jnp.asarray(sdf, dtype=jnp.float32)
        self.sdf_start = jnp.asarray(sdf_start, dtype=jnp.float32)
        self.granularity = float(granularity)
        self.noise_mean = jnp.asarray(noise_mean, dtype=jnp.float32)
        self.noise_std = jnp.asarray(noise_std, dtype=jnp.float32)
        self.start_state = jnp.asarray(start_state, dtype=jnp.float32)
        self.mesh = mesh
        self._run = self._build()

    # ------------------------------------------------------------------ core
    def _sdf_lookup(self, pos):
        """SDF value at world position; out-of-bounds reads as 'not collided'
        (NerfSimulator.py:142-144 IndexError -> no collision)."""
        idx_f = jnp.floor((pos - self.sdf_start) * self.granularity)
        idx = idx_f.astype(jnp.int32)
        shape = jnp.asarray(self.sdf.shape)
        inb = jnp.all((idx >= 0) & (idx < shape))
        cidx = jnp.clip(idx, 0, shape - 1)
        val = self.sdf[cidx[0], cidx[1], cidx[2]]
        return jnp.where(inb, val, 9999.0)

    def _log_likelihood(self, noise):
        """Per-step diagonal-Gaussian log-likelihood with the reference's
        pdf clipping (MonteCarlo.py:29-35)."""
        var = self.noise_std ** 2
        logpdf = -0.5 * ((noise - self.noise_mean) ** 2 / var
                         + jnp.log(var) + _LOG_2PI)
        logpdf = jnp.clip(logpdf, jnp.log(1e-8), jnp.log(1e8))
        return jnp.sum(logpdf)

    def _build(self):
        collide_thresh = 1.0 / self.granularity

        def rollout(noises):
            """noises: [T, 12] -> per-trajectory outputs."""
            def step(carry, inp):
                state, done = carry
                action, noise = inp
                nxt = drone_dynamics(state, action, self.dt, self.g,
                                     self.mass, self.I, self.invI) + noise
                # frozen after first collision (sequential loop breaks there)
                state = jnp.where(done, state, nxt)
                sdf_val = self._sdf_lookup(state[:3])
                collided_now = (sdf_val < collide_thresh) & ~done
                loglik = self._log_likelihood(noise)
                out = (state[:3], sdf_val, collided_now, loglik)
                return (state, done | collided_now), out

            (final_state, ever), (positions, sdf_vals, collided, logliks) = \
                jax.lax.scan(step, (self.start_state, jnp.asarray(False)),
                             (self.actions[:self.steps], noises))
            return {
                "positions": positions,          # [T, 3]
                "sdf_vals": sdf_vals,            # [T]
                "collided": collided,            # [T] bool (first hit only)
                "ever_collided": ever,           # []
                "log_likelihoods": logliks,      # [T]
                "risk": jnp.min(sdf_vals),       # CEM risk (CEM.py:166)
            }

        batched = jax.vmap(rollout)

        @jax.jit
        def run(noises):
            return batched(noises)

        return run

    # ------------------------------------------------------------------ APIs
    def sample_noises(self, key, n_sims: int, means=None, covs_diag=None):
        """[n_sims, T, 12] disturbances. Per-step means/diag-stds optional
        (CEM proposal); defaults to the MC mean/std."""
        if means is None:
            means = jnp.broadcast_to(self.noise_mean, (self.steps, 12))
        if covs_diag is None:
            stds = jnp.broadcast_to(self.noise_std, (self.steps, 12))
        else:
            stds = jnp.sqrt(covs_diag)
        z = jax.random.normal(key, (n_sims, self.steps, 12))
        return means[None] + stds[None] * z

    def run(self, noises):
        """noises: [n_sims, T, 12] -> dict of batched rollout outputs."""
        noises = jnp.asarray(noises, dtype=jnp.float32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            noises = shard_batch(noises, self.mesh, batch_axis=0)
        return self._run(noises)

    def monte_carlo(self, key, n_sims: int):
        """Batched MC sweep: returns summary dict (collision rate etc.)."""
        noises = self.sample_noises(key, n_sims)
        out = self.run(noises)
        ever = np.asarray(out["ever_collided"])
        first_step = np.asarray(
            jnp.argmax(out["collided"], axis=1))  # 0 when no collision
        return {
            "noises": np.asarray(noises),
            "collision_rate": float(ever.mean()),
            "ever_collided": ever,
            "first_collision_step": first_step,
            "risk": np.asarray(out["risk"]),
            "positions": np.asarray(out["positions"]),
            "log_likelihoods": np.asarray(out["log_likelihoods"]),
        }

    def cem(self, key, m: int, m_elite: int, kmax: int):
        """Batched CEM: population sampling + rollouts on device, elite
        reweighting host-side (mirrors CEM.py:211-262 with diagonal
        covariances)."""
        means = np.broadcast_to(np.asarray(self.noise_mean),
                                (self.steps, 12)).copy()
        vars_ = np.broadcast_to(np.asarray(self.noise_std) ** 2,
                                (self.steps, 12)).copy()
        p_mean, p_var = means.copy(), vars_.copy()
        history = []
        for k in range(kmax):
            key, sub = jax.random.split(key)
            noises = self.sample_noises(sub, m, jnp.asarray(means),
                                        jnp.asarray(vars_))
            out = self.run(noises)
            risks = np.asarray(out["risk"])
            elite_idx = np.argsort(risks)[:m_elite]
            elite = np.asarray(noises)[elite_idx]  # [E, T, 12]

            # importance weights p/q per step (log-sum-exp normalized)
            for t in range(self.steps):
                lp = self._diag_logpdf(elite[:, t], p_mean[t], p_var[t])
                lq = self._diag_logpdf(elite[:, t], means[t], vars_[t])
                lw = lp - lq
                lw = lw - (np.max(lw) + np.log(np.exp(lw - np.max(lw)).sum()))
                w = np.clip(np.exp(lw), 1e-8, None)
                w = w / w.sum()
                mean_t = (w[:, None] * elite[:, t]).sum(0)
                var_t = (w[:, None] * (elite[:, t] - mean_t) ** 2).sum(0)
                var_t = np.clip(var_t, 1e-12, 0.1)  # diag clamp (CEM.py:243-249)
                means[t] = mean_t
                vars_[t] = var_t
            history.append({"mean_risk": float(risks.mean()),
                            "elite_risk": float(risks[elite_idx].mean()),
                            "collision_rate":
                                float(np.asarray(out["ever_collided"]).mean())})
        return {"means": means, "vars": vars_, "history": history}

    @staticmethod
    def _diag_logpdf(x, mean, var):
        return (-0.5 * ((x - mean) ** 2 / var + np.log(var) + _LOG_2PI)).sum(-1)
