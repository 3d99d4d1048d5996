"""Hessian approximation strategies.

Parity target: reference uncertainty/quantification/hessian/
{HessianApproximator,methods}.py — five methods: finite_difference (:7),
lbfgs (:45; optax.lbfgs iterate + grad-of-grad, plus an 'autodiff' extra
that is the pure jax.hessian of the same quantity),
regression_gradient (:79), regression_gradient_regularized (:118), and
levenberg_marquardt (:158) whose returned approximation is the gradient
outer product g g^T at the LM iterate — the one the production
Bayesian-Laplace path uses (bayesian_laplace.py:33).
"""

import numpy as np
import jax
import jax.numpy as jnp


def finite_difference(x, func, epsilon=1e-8):
    """Row-wise finite differences of the gradient (methods.py:7-43)."""
    x = jnp.asarray(x)
    grad = jax.grad(func)
    g0 = np.asarray(grad(x))
    n = x.size
    hessian = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        gi = np.asarray(grad(x.at[i].add(epsilon)))
        hessian[i] = (gi - g0) / epsilon
    return jnp.asarray(hessian)


def autodiff_hessian(x, func):
    """Exact Hessian via grad-of-grad (the quantity methods.py:45-77 computes
    by re-backpropagating each gradient entry)."""
    return jax.hessian(func)(jnp.asarray(x))


def lbfgs(x, func, max_iter=20, lr=1.0):
    """LBFGS Hessian strategy (methods.py:45-77): run one torch
    LBFGS.step(closure) — up to 20 inner iterations at lr=1 — to move x to a
    quasi-Newton iterate, then form the Hessian at that iterate by
    re-backpropagating each gradient entry. The optimizer here is
    optax.lbfgs (same Nocedal-Wright two-loop recursion); the second stage is
    jax.hessian (identical quantity to the reference's per-row double
    backprop, without the in-place grad buffer plumbing)."""
    import optax

    x = jnp.asarray(x, dtype=jnp.float32)
    opt = optax.lbfgs(learning_rate=lr)
    state = opt.init(x)
    vg = jax.jit(jax.value_and_grad(func))

    for _ in range(max_iter):
        value, grad = vg(x)
        if not bool(jnp.isfinite(grad).all()):
            break
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=func)
        x_new = optax.apply_updates(x, updates)
        if not bool(jnp.isfinite(x_new).all()):
            break
        if bool(jnp.allclose(x_new, x, atol=1e-10)):
            x = x_new
            break
        x = x_new
    return jax.hessian(func)(x)


def regression_gradient(theta, func, perturbations=200, delta=1e-6):
    """Estimate the Hessian by linear regression on random perturbations
    (methods.py:79-116)."""
    from sklearn.linear_model import LinearRegression
    return _regression(theta, func, perturbations, delta,
                       LinearRegression())


def regression_gradient_regularized(theta, func, perturbations=200,
                                    delta=1e-6, alpha=0.1):
    """methods.py:118-156 (Ridge regression)."""
    from sklearn.linear_model import Ridge
    return _regression(theta, func, perturbations, delta, Ridge(alpha=alpha))


def _regression(theta, func, perturbations, delta, model):
    theta = np.asarray(theta, dtype=np.float64)
    n = theta.size
    rng = np.random.default_rng(0)
    delta_theta = np.zeros((perturbations, n))
    delta_u = np.zeros(perturbations)
    f0 = float(np.sum(np.asarray(func(jnp.asarray(theta)))))
    for i in range(perturbations):
        delta_theta[i] = delta * rng.standard_normal(n)
        delta_u[i] = float(np.sum(np.asarray(
            func(jnp.asarray(theta + delta_theta[i]))))) - f0
    # quadratic feature design identical to methods.py:105
    quad = 0.5 * np.einsum("pi,pj->pij", delta_theta,
                           delta_theta).reshape(perturbations, -1)
    X = np.hstack([delta_theta, quad])
    model.fit(X, delta_u)
    hessian_elements = model.coef_[n:]
    hessian = np.zeros((n, n))
    # symmetric fill with the reference's triangular index map (methods.py:113)
    for i in range(n):
        for j in range(i, n):
            index = int(n * i - i * (i - 1) / 2 + j)
            if index < hessian_elements.size:
                hessian[i, j] = hessian[j, i] = hessian_elements[index]
    return jnp.asarray(hessian, dtype=jnp.float32)


def levenberg_marquardt(x0, func, lmbda=0.01, max_iter=200):
    """LM iteration returning the g g^T outer-product Hessian approximation
    at the last successful iterate (methods.py:158-188)."""
    x0 = jnp.asarray(x0)
    grad = jax.jit(jax.grad(func))
    f = jax.jit(func)
    x = x0
    n = x.size
    hessian = None
    f_x0 = float(f(x0))
    for _ in range(max_iter):
        g = grad(x)
        H = jnp.outer(g, g)
        try:
            dx = jnp.linalg.solve(H + lmbda * jnp.eye(n), -g)
        except Exception:
            lmbda *= 10
            continue
        if not bool(jnp.isfinite(dx).all()):
            lmbda *= 10
            continue
        hessian = H
        if bool(jnp.allclose(dx, jnp.zeros_like(dx))):
            break
        x = x + dx
        if float(f(x)) < f_x0:
            lmbda /= 10
        else:
            lmbda *= 10
    if hessian is None:
        g = grad(x0)
        hessian = jnp.outer(g, g)
    return hessian


class HessianApproximator:
    """Strategy dispatcher (HessianApproximator.py:4-40)."""

    def __init__(self, func, method="finite_difference", epsilon=1e-8,
                 delta=1e-6, alpha=0.1, lmbda=0.01):
        self.func = func
        self.method = method
        self.epsilon = epsilon
        self.delta = delta
        self.alpha = alpha
        self.lmbda = lmbda

    def compute(self, x):
        if self.method == "finite_difference":
            return finite_difference(x, self.func, self.epsilon)
        if self.method == "autodiff":
            return autodiff_hessian(x, self.func)
        if self.method in ("bfgs", "lbfgs"):
            return lbfgs(x, self.func)
        if self.method == "regression_gradient":
            return regression_gradient(x, self.func, delta=self.delta)
        if self.method == "regression_gradient_regularized":
            return regression_gradient_regularized(x, self.func,
                                                   delta=self.delta,
                                                   alpha=self.alpha)
        if self.method == "levenberg_marquardt":
            return levenberg_marquardt(x, self.func, lmbda=self.lmbda)
        raise ValueError(f"unknown Hessian method {self.method!r}")
