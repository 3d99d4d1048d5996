"""Numerical toy validation of the Hessian approximators.

Parity target: reference uncertainty/quantification/hessian/
HessianToyExample.py — compares every approximation strategy against the
exact autodiff Hessian on a known quadratic, sweeping the finite-difference
epsilon, regression delta and ridge alpha, and reporting the max-abs error
per configuration. Run as a script:

    python -m nerfsafetyvalidation_tpu.uq.hessian_toy
"""

import numpy as np
import jax
import jax.numpy as jnp

from .hessian import HessianApproximator


def quadratic(A):
    A = jnp.asarray(A, dtype=jnp.float32)
    return lambda x: 0.5 * x @ A @ x


def run_toy_example(verbose: bool = True):
    A = np.asarray([[3.0, 1.0, 0.0], [1.0, 2.0, 0.5], [0.0, 0.5, 4.0]])
    f = quadratic(A)
    x0 = jnp.asarray([1.0, -1.0, 0.5])
    exact = np.asarray(jax.hessian(f)(x0))

    results = {}

    for eps in (1e-2, 1e-3, 1e-4):
        H = np.asarray(HessianApproximator(f, "finite_difference",
                                           epsilon=eps).compute(x0))
        results[f"finite_difference(eps={eps:g})"] = np.abs(H - exact).max()

    results["autodiff"] = np.abs(
        np.asarray(HessianApproximator(f, "autodiff").compute(x0))
        - exact).max()

    for delta in (1e-2, 1e-3):
        H = np.asarray(HessianApproximator(f, "regression_gradient",
                                           delta=delta).compute(x0))
        results[f"regression_gradient(delta={delta:g})"] = \
            np.abs(H - exact).max()

    for alpha in (0.1, 1.0):
        H = np.asarray(HessianApproximator(
            f, "regression_gradient_regularized", delta=1e-2,
            alpha=alpha).compute(x0))
        results[f"regression_regularized(alpha={alpha:g})"] = \
            np.abs(H - exact).max()

    # LM returns g g^T — not the true Hessian; report its PSD-ness instead
    H_lm = np.asarray(HessianApproximator(
        f, "levenberg_marquardt").compute(x0))
    results["levenberg_marquardt (gg^T, min eig)"] = \
        float(np.linalg.eigvalsh(H_lm).min())

    if verbose:
        print(f"exact Hessian:\n{exact}")
        for name, err in results.items():
            print(f"{name:45s} {err:.3e}")
    return results


if __name__ == "__main__":
    run_toy_example()
