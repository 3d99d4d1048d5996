"""Gaussian approximation of volume-density uncertainty.

Parity target: reference uncertainty/quantification/
gaussian_approximation_density_uncertainty.py — MLE of (mu_d, sigma_d) by
minimizing

  log(sum(c^2 d^2 sigma^2)) + (mean(r) - sum(c mu d))^2 / sum(c^2 sigma^2 d^2)

over the rendered samples (:24-52). The reference uses scipy Nelder-Mead-ish
`minimize`; the objective is 2-parameter and smooth, so the default here is
the same scipy path (host, identical results) with the sufficient statistics
precomputed ON DEVICE once — the per-evaluation cost is then O(1) instead of
O(N*T) tensor reductions per scipy step.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize


class GaussianApproximationDensityUncertainty:
    def __init__(self, c, d, r):
        """c: [N, T, 3] colors; d: per-sample densities (any shape reshaping
        to [N, T, 1]); r: rendered color."""
        c = jnp.asarray(c)
        d = jnp.asarray(d).reshape(c.shape[0], c.shape[1], -1)
        r = jnp.asarray(r)
        # sufficient statistics (single device pass)
        self.S_c2d2 = float(jnp.sum(c ** 2 * d ** 2))
        self.S_cd = float(jnp.sum(c * d))
        self.r_mean = float(jnp.mean(r))
        self.d_mean = float(jnp.mean(d))
        self.d_std = float(jnp.std(d))

    def objective(self, params):
        mu_d, sigma_d = params
        s2 = self.S_c2d2 * sigma_d ** 2
        # guard the log like the torch objective (log of a positive sum)
        s2 = max(s2, 1e-30)
        return float(np.log(s2) + (self.r_mean - self.S_cd * mu_d) ** 2 / s2)

    def optimize(self):
        """Returns (mu_d_opt, sigma_d_opt) (reference :38-52)."""
        initial_guess = [self.d_mean, self.d_std]  # reference :45
        result = minimize(self.objective, initial_guess)
        mu_d_opt, sigma_d_opt = result.x
        return float(mu_d_opt), float(sigma_d_opt)
