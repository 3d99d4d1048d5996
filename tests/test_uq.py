"""UQ layer tests (reference L5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.uq.gaussian_approximation import (
    GaussianApproximationDensityUncertainty)
from nerfsafetyvalidation_tpu.uq.bayesian_laplace import BayesianLaplace
from nerfsafetyvalidation_tpu.uq.hessian import HessianApproximator
from nerfsafetyvalidation_tpu.uq.orchestrator import uncertainty
from nerfsafetyvalidation_tpu.uq.evaluation import (
    calculate_accuracy, calculate_precision, calculate_recall,
    calculate_f1_score, masked_psnr, masked_ssim)


class TestHessianApproximators:
    """Mirrors the reference's HessianToyExample validation: compare each
    approximator against the exact autodiff Hessian on a known quadratic."""

    def quad(self, x):
        A = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
        return 0.5 * x @ A @ x

    def test_autodiff_exact(self):
        H = np.asarray(HessianApproximator(self.quad, "autodiff").compute(
            jnp.asarray([1.0, -1.0])))
        np.testing.assert_allclose(H, [[3, 1], [1, 2]], atol=1e-5)

    def test_finite_difference(self):
        H = np.asarray(HessianApproximator(
            self.quad, "finite_difference", epsilon=1e-3).compute(
            jnp.asarray([1.0, -1.0])))
        np.testing.assert_allclose(H, [[3, 1], [1, 2]], atol=1e-2)

    def test_regression_gradient(self):
        H = np.asarray(HessianApproximator(
            self.quad, "regression_gradient", delta=1e-2).compute(
            jnp.asarray([0.5, 0.5])))
        assert H.shape == (2, 2)
        assert np.allclose(H, H.T)

    def test_levenberg_marquardt_outer_product(self):
        x = jnp.asarray([1.0, -1.0])
        H = np.asarray(HessianApproximator(
            self.quad, "levenberg_marquardt").compute(x))
        assert H.shape == (2, 2)
        # outer product of a gradient: rank 1, PSD
        eigs = np.linalg.eigvalsh(H)
        assert (eigs >= -1e-6).all()


class TestGaussianApproximation:
    def test_optimize_returns_finite(self):
        rng = np.random.default_rng(0)
        c = jnp.asarray(rng.uniform(0, 1, (64, 16, 3)), dtype=jnp.float32)
        d = jnp.asarray(rng.uniform(0, 5, (64 * 16, 1)), dtype=jnp.float32)
        r = jnp.asarray(rng.uniform(0, 1, (64, 3)), dtype=jnp.float32)
        ga = GaussianApproximationDensityUncertainty(c, d, r)
        mu, sigma = ga.optimize()
        assert np.isfinite(mu) and np.isfinite(sigma)

    def test_objective_matches_reference_formula(self):
        rng = np.random.default_rng(1)
        c = rng.uniform(0, 1, (4, 8, 3)).astype(np.float32)
        d = rng.uniform(0, 2, (4, 8, 1)).astype(np.float32)
        r = rng.uniform(0, 1, (4, 3)).astype(np.float32)
        ga = GaussianApproximationDensityUncertainty(
            jnp.asarray(c), jnp.asarray(d), jnp.asarray(r))
        mu, sigma = 1.3, 0.7
        expected = np.log(np.sum(c ** 2 * d ** 2 * sigma ** 2)) + \
            (np.mean(r) - np.sum(c * mu * d)) ** 2 / \
            np.sum(c ** 2 * sigma ** 2 * d ** 2)
        np.testing.assert_allclose(ga.objective([mu, sigma]), expected,
                                   rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_net():
    cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


class TestBayesianLaplace:
    def test_fit_and_posterior(self, tiny_net):
        net, params = tiny_net
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1, 1, (32, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (32,)), dtype=jnp.float32)
        bl = BayesianLaplace(net, params, 0.0, 1.0, lr=1e-3,
                             fit_steps=10, num_perturbations=2)
        bl.fit(X, y)
        n = net.get_sigma_net_flat(params).shape[0]
        assert bl.get_posterior_mean().shape == (n,)
        assert bl.get_posterior_cov().shape == (n, n)
        assert np.isfinite(bl.get_posterior_cov()).all()

    def test_log_posterior_components(self, tiny_net):
        net, params = tiny_net
        theta = net.get_sigma_net_flat(params)
        X = jnp.zeros((4, 3))
        y = jnp.zeros(4)
        bl = BayesianLaplace(net, params, 0.0, 1.0, lr=1e-3)
        lp = float(bl.log_prior(theta))
        assert lp <= 0
        ll = float(bl.log_likelihood(theta, X, y))
        assert np.isfinite(ll)

    def test_online_uncertainty_laplace(self, tiny_net):
        net, params = tiny_net
        H = W = 4
        out = {"aggregated_density": jnp.zeros((1, H * W))}
        rays_o = jnp.zeros((1, H * W, 3))
        rays_d = jnp.asarray(np.random.default_rng(0).normal(size=(1, H * W, 3)),
                             dtype=jnp.float32)
        trace, rmv = uncertainty(
            "Bayesian Laplace Approximation",
            rendered_output=(out, rays_o, rays_d), net=net, params=params,
            lr=1e-3, H=H, W=W, laplace_fit_steps=5)
        assert np.isfinite(trace) and np.isfinite(rmv)
        assert trace >= 0 and rmv >= 0


class TestOnlineGaussianUncertainty:
    def test_online_gaussian(self):
        rng = np.random.default_rng(0)
        out = {"rgbs": jnp.asarray(rng.uniform(0, 1, (16, 8, 3)),
                                   dtype=jnp.float32),
               "sigmas": jnp.asarray(rng.uniform(0, 3, (16 * 8, 1)),
                                     dtype=jnp.float32),
               "image": jnp.asarray(rng.uniform(0, 1, (16, 3)),
                                    dtype=jnp.float32)}
        mu, sigma = uncertainty("Gaussian Approximation",
                                rendered_output=(out, None, None))
        assert np.isfinite(mu) and np.isfinite(sigma)

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            uncertainty("nope")


class TestEvaluation:
    def test_classification_metrics(self):
        y_true = np.asarray([1, 1, 0, 0, 1])
        y_pred = np.asarray([1, 0, 0, 1, 1])
        assert calculate_accuracy(y_true, y_pred) == 0.6
        np.testing.assert_allclose(calculate_precision(y_true, y_pred), 2 / 3)
        np.testing.assert_allclose(calculate_recall(y_true, y_pred), 2 / 3)
        np.testing.assert_allclose(calculate_f1_score(y_true, y_pred), 2 / 3)

    def test_masked_psnr(self):
        pred = jnp.zeros((1, 3, 8, 8)).at[:, :, :4].set(0.5)
        target = jnp.zeros((1, 3, 8, 8))
        full = float(masked_psnr(pred, target)[0])
        mask = jnp.zeros((1, 1, 8, 8)).at[:, :, 4:].set(1.0)
        masked = float(masked_psnr(pred, target, mask)[0])
        assert masked > full  # masked region is error-free

    def test_masked_ssim_identity(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 3, 16, 16)),
                          dtype=jnp.float32)
        s = float(masked_ssim(img, img)[0])
        np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_lbfgs_hessian_quadratic():
    """LBFGS strategy (reference methods.py:45-77): optax.lbfgs iterate then
    grad-of-grad; on a quadratic the Hessian is exact anywhere."""
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.uq.hessian import HessianApproximator

    A = jnp.asarray([[3.0, 1.0, 0.0], [1.0, 2.0, 0.5], [0.0, 0.5, 4.0]])

    def f(x):
        return 0.5 * x @ A @ x + jnp.sum(x)

    h = HessianApproximator(f, method="lbfgs").compute(
        jnp.asarray([1.0, -2.0, 0.5]))
    np.testing.assert_allclose(np.asarray(h), np.asarray(A), atol=1e-4)
