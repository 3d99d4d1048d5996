"""UQ orchestrator: offline (train-image sweep) and online (single rendered
output) uncertainty computation.

Parity target: reference uncertain.py `uncertainty()` (:20-247):
  * "Gaussian Approximation": per-image/per-render MLE of (mu_d, sigma_d)
    from the renderer's rgbs/sigmas/image extras; online mode returns
    (mu_d_opt, sigma_d_opt) (:77-91); offline mode filters absolute-
    certain (<=0) / absolute-uncertain (>=3) values and histograms the rest
  * "Bayesian Laplace Approximation": MAP + Laplace posterior over sigma-net
    params on X = rays_o + rays_d points vs aggregated_density; returns
    (trace/n, sqrt(mean(diag))/n) (:94-231); sigma-net params restored after
    the online fit (:216-224)
"""

import os

import numpy as np
import jax.numpy as jnp

from .gaussian_approximation import GaussianApproximationDensityUncertainty
from .bayesian_laplace import BayesianLaplace
from .nerf_utils import load_camera_params, create_heatmap


def uncertainty(method, path_to_images=None, rendered_output=None, net=None,
                params=None, lr=None, render_fn=None, get_rays_fn=None,
                dataset_path=None, H=800, W=800, laplace_max_points=None,
                laplace_fit_steps=1000):
    """Dual-mode UQ (uncertain.py:20-247).

    Online mode (path_to_images is None): `rendered_output` is either a
    render dict or the (output, rays_o, rays_d) tuple from
    Estimator.render_for_uncertainty. Returns:
      Gaussian  -> (mu_d_opt, sigma_d_opt)
      Laplace   -> (trace, root_mean_variance)
    """
    ac, au = 0, 0
    if method == "Gaussian Approximation":
        results = {"optimized_mu_d": [], "optimized_sigma_d": []}
        if path_to_images is not None:
            # OFFLINE: iterate over train images (uncertain.py:32-92)
            for i, image_name in enumerate(os.listdir(path_to_images)):
                rel = f"./train/{image_name}"
                cam = jnp.asarray([load_camera_params(rel, dataset_path)],
                                  dtype=jnp.float32)
                rays = get_rays_fn(cam)
                output = render_fn(rays["rays_o"].reshape((1, -1, 3)),
                                   rays["rays_d"].reshape((1, -1, 3)))
                ga = GaussianApproximationDensityUncertainty(
                    output["rgbs"], output["sigmas"], output["image"])
                mu_d_opt, sigma_d_opt = ga.optimize()
                if sigma_d_opt <= 0:
                    ac += 1
                elif sigma_d_opt >= 3:
                    au += 1
                else:
                    results["optimized_mu_d"].append(mu_d_opt)
                    results["optimized_sigma_d"].append(sigma_d_opt)
                print(f"Image #{i} ({image_name}): mu_d_opt = {mu_d_opt}, "
                      f"sigma_d_opt = {sigma_d_opt}")
        else:
            out = rendered_output[0] if isinstance(rendered_output, tuple) \
                else rendered_output
            ga = GaussianApproximationDensityUncertainty(
                out["rgbs"], out["sigmas"], out["image"])
            mu_d_opt, sigma_d_opt = ga.optimize()
            print(f"mu_d_opt = {mu_d_opt}, sigma_d_opt = {sigma_d_opt}")
            return mu_d_opt, sigma_d_opt
        if results["optimized_mu_d"]:
            create_heatmap(results["optimized_mu_d"],
                           results["optimized_sigma_d"])
        return results

    elif method == "Bayesian Laplace Approximation":
        results = {"trace": [], "rmv": []}
        if path_to_images is not None:
            # OFFLINE (uncertain.py:98-179)
            theta_copy = net.get_sigma_net_flat(params)
            for i, image_name in enumerate(os.listdir(path_to_images)):
                p = net.set_sigma_net_flat(params, theta_copy)
                rel = f"./train/{image_name}"
                cam = jnp.asarray([load_camera_params(rel, dataset_path)],
                                  dtype=jnp.float32)
                rays = get_rays_fn(cam)
                rays_o = rays["rays_o"].reshape((H, W, -1))
                rays_d = rays["rays_d"].reshape((H, W, -1))
                X = rays_o[..., None, :] + rays_d[..., None, :]
                output = render_fn(rays["rays_o"].reshape((1, -1, 3)),
                                   rays["rays_d"].reshape((1, -1, 3)))
                d = output["aggregated_density"]
                bl = BayesianLaplace(net, p, 0.0, 1.0, lr,
                                     max_points=laplace_max_points,
                                     fit_steps=laplace_fit_steps)
                bl.fit(X, d)
                trace, rmv = _posterior_stats(bl)
                results["trace"].append(trace)
                results["rmv"].append(rmv)
                print(f"Image #{i} ({image_name}): trace = {trace}, "
                      f"rmv = {rmv}")
        else:
            # ONLINE (uncertain.py:180-231)
            theta_init = net.get_sigma_net_flat(params)
            out, rays_o, rays_d = rendered_output
            d = out["aggregated_density"]
            rays_o = rays_o.reshape((H, W, -1))
            rays_d = rays_d.reshape((H, W, -1))
            X = rays_o[..., None, :] + rays_d[..., None, :]
            bl = BayesianLaplace(net, params, 0.0, 1.0, lr,
                                 max_points=laplace_max_points,
                                 fit_steps=laplace_fit_steps)
            bl.fit(X, d)
            trace, rmv = _posterior_stats(bl)
            print(f"trace = {trace}, rmv = {rmv}")
            # restore sigma-net params (uncertain.py:216-224); params pytree
            # is functional so the caller's copy was never mutated, but reset
            # the laplace object's copy for symmetry
            bl.set_sigma_net_params(theta_init)
            return trace, rmv
        if results["trace"]:
            create_heatmap(results["trace"], results["rmv"])
        return results

    raise ValueError(f"Unrecognized uncertainty quantification method {method}")


def _posterior_stats(bl):
    pos_cov = bl.get_posterior_cov()
    n = pos_cov.shape[0]
    di = np.diag_indices(n)
    pos_cov[di] = np.maximum(0, pos_cov[di])
    trace = np.trace(pos_cov) / n
    rmv = np.sqrt(np.mean(np.diag(pos_cov))) / n
    return float(trace), float(rmv)
