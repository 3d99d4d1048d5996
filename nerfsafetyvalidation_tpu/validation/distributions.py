"""Seedable per-step multivariate normals.

Parity target: reference validation/distributions/SeedableMultivariateNormal.py
— a list of per-step MultivariateNormal distributions with per-simulation
reseeding (:19-22) and `compute_best_solution` (:24-45). torch Generators map
to threefry: sample(simulationNumber) folds the simulation number into the
base key, so every simulation's noise sequence is reproducible and
independent of execution order.
"""

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

_LOG_2PI = float(np.log(2.0 * np.pi))


def mvn_log_prob(x, mean, cov):
    """Gaussian log-density (matches torch MultivariateNormal.log_prob)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    mean = jnp.asarray(mean, dtype=jnp.float32)
    cov = jnp.asarray(cov, dtype=jnp.float32)
    L = jnp.linalg.cholesky(cov)
    diff = x - mean
    sol = jax.scipy.linalg.solve_triangular(L, diff, lower=True)
    k = mean.shape[-1]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (k * _LOG_2PI + logdet + jnp.sum(sol ** 2))


def mvn_sample(key, mean, cov):
    mean = jnp.asarray(mean, dtype=jnp.float32)
    cov = jnp.asarray(cov, dtype=jnp.float32)
    L = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, mean.shape)
    return mean + L @ z


class _Dist:
    """One step's distribution with a torch-like log_prob/sample API."""

    def __init__(self, mean, cov):
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.cov = jnp.asarray(cov, dtype=jnp.float32)
        # fail fast on non-PD covariance like torch's constructor
        chol = np.linalg.cholesky(np.asarray(self.cov))
        if not np.isfinite(chol).all():
            raise ValueError("covariance_matrix is not positive definite")

    def log_prob(self, x):
        return mvn_log_prob(x, self.mean, self.cov)

    def sample(self, key):
        return mvn_sample(key, self.mean, self.cov)


class SeedableMultivariateNormal:
    def __init__(self, means: List, covs, noise_seed=None):
        self.means = [jnp.asarray(m, dtype=jnp.float32) for m in means]
        self.covs = [jnp.asarray(c, dtype=jnp.float32) for c in covs]
        if noise_seed is None:
            noise_seed = 0
        if hasattr(noise_seed, "initial_seed"):  # torch Generator compat
            noise_seed = noise_seed.initial_seed()
        if isinstance(noise_seed, (int, np.integer)):
            self.base_key = jax.random.PRNGKey(int(noise_seed))
            self.noise_seed = int(noise_seed)
        else:
            self.base_key = noise_seed
            self.noise_seed = 0
        self.distributions = [_Dist(m, c)
                              for m, c in zip(self.means, self.covs)]

    def sample(self, simulationNumber: int):
        """Per-simulation reseed (SeedableMultivariateNormal.py:19-22)."""
        key = jax.random.fold_in(self.base_key, int(simulationNumber))
        keys = jax.random.split(key, len(self.distributions))
        return [d.sample(k) for d, k in zip(self.distributions, keys)]

    def compute_best_solution(self, simulator):
        """Probe the final distribution on the simulator (:24-45)."""
        best_objective_value = 999999999
        best_mean = None
        best_cov = None
        simulator.reset()
        key = jax.random.fold_in(self.base_key, 2 ** 30)
        for stepNumber in range(len(self.means)):
            key, sub = jax.random.split(key)
            noise = self.distributions[stepNumber].sample(sub)
            result = simulator.step(noise)
            isCollision, collisionVal, currentPos = result[:3]
            if collisionVal < best_objective_value:
                best_mean = self.means[stepNumber]
                best_cov = self.covs[stepNumber]
                best_objective_value = collisionVal
            if isCollision:
                break
        return best_mean, best_cov, best_objective_value
