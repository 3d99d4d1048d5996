"""End-to-end hermetic integration: the full NerfSimulator validation loop
(plan -> act -> render -> UQ -> estimate -> replan -> SDF check) with a tiny
NeRF, a canned camera (no Blender), and a synthetic SDF — the whole
validate.py stack minus external processes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.data.rays import get_rays
from nerfsafetyvalidation_tpu.nav.math_utils import vec_to_rot_matrix
from nerfsafetyvalidation_tpu.nav.camera import CannedCamera
from nerfsafetyvalidation_tpu.validation.simulators import NerfSimulator
from nerfsafetyvalidation_tpu.validation.stresstests import MonteCarlo


RES = 24  # tiny observation images


@pytest.fixture(scope="module")
def stack():
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    intrinsics = (30.0, 30.0, RES / 2, RES / 2)

    def get_rays_fn(pose):
        return get_rays(pose, intrinsics, RES, RES)

    def render_fn(rays_o, rays_d):
        return R.render(net, params, rays_o, rays_d, staged=False,
                        bg_color=1.0, num_steps=8, upsample_steps=0)

    rot = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    def density_fn(x):
        # scale down: an untrained net outputs sigma ~ exp(0) ~ 1 everywhere,
        # which would mark the whole A* grid occupied (threshold 0.3)
        return 1e-3 * net.density(params, x.reshape((-1, 3)) @ rot)[
            "sigma"].reshape(x.shape[:-1])

    return net, params, get_rays_fn, render_fn, density_fn


def make_simulator(stack, tmp_path, steps=3):
    net, params, get_rays_fn, render_fn, density_fn = stack
    init_rates = jnp.zeros(3)
    sp = jnp.asarray([-0.5, -0.5, 0.1])
    ep = jnp.asarray([0.5, 0.5, 0.1])
    sR = vec_to_rot_matrix(jnp.zeros(3))
    start_state = jnp.concatenate([sp, init_rates, sR.reshape(-1), init_rates])
    end_state = jnp.concatenate([ep, init_rates, sR.reshape(-1), init_rates])

    agent_cfg = {"body_lims": [[-0.05, 0.05], [-0.05, 0.05], [-0.02, 0.02]],
                 "body_nbins": [4, 4, 2], "mass": 1.0, "g": 10.0,
                 "I": np.eye(3).tolist(),
                 "path": str(tmp_path / "sim_img_cache"),
                 "blend_file": None}
    planner_cfg = {"T_final": 2.0, "steps": steps, "lr": 1e-3,
                   "epochs_init": 4, "epochs_update": 2,
                   "fade_out_epoch": 0, "fade_out_sharpness": 10,
                   "start_state": start_state, "end_state": end_state,
                   "exp_name": "itest",
                   "I": jnp.eye(3), "g": 10.0, "mass": 1.0,
                   "body": np.asarray(agent_cfg["body_lims"]),
                   "nbins": agent_cfg["body_nbins"]}
    camera_cfg = {"res_x": RES, "res_y": RES, "trans": True, "mode": "RGBA",
                  "path": agent_cfg["path"], "half_res": False,
                  "white_bg": True}
    filter_cfg = {"dil_iter": 2, "kernel_size": 3, "batch_size": 32,
                  "lrate": 1e-3, "N_iter": 3, "render_viz": False,
                  "show_rate": [20, 100], "sig0": jnp.eye(12),
                  "Q": jnp.eye(12)}
    blender_cfg = {"blend_path": None, "script_path": None}
    camera = CannedCamera(
        image=np.random.default_rng(0).integers(
            0, 255, (RES, RES, 3)).astype(np.uint8))
    # free-space SDF over the validation grid constants
    sdf = np.full((96, 92, 24), 1.0, dtype=np.float32)

    sim = NerfSimulator(start_state, end_state, agent_cfg, planner_cfg,
                        camera_cfg, filter_cfg, get_rays_fn, render_fn,
                        blender_cfg, density_fn, "Gaussian Approximation",
                        net, params, seed=0, camera=camera, sdf=sdf)
    sim.res_x = RES
    sim.res_y = RES
    return sim


def test_nerf_simulator_full_loop(stack, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sim = make_simulator(stack, tmp_path)
    sim.reset()
    assert sim.traj is not None and sim.filter is not None
    result = sim.step(jnp.full(12, 0.001))
    collided, collisionVal, pos, sigma, trace = result
    assert isinstance(collided, (bool, np.bool_))
    assert np.isfinite(collisionVal)
    assert len(pos) == 3
    assert np.isfinite(sigma)
    # reward is computable from the UQ outputs
    r = sim.reward(likelihood=10.0, sigma_d_opt=sigma, trace=trace)
    assert np.isfinite(r)
    assert -72.0 <= r <= 36.0  # clip bounds (NerfSimulator.py:175)


def test_monte_carlo_one_sim(stack, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sim = make_simulator(stack, tmp_path, steps=2)
    mc = MonteCarlo(sim, n_simulations=1, steps=2,
                    noise_mean=jnp.zeros(12), noise_std=jnp.full(12, 0.01),
                    blend_file=None, workspace="itest", start_iter=0)
    mc.validate()
    csvs = [f for f in os.listdir("results") if f.endswith(".csv")]
    assert csvs, "MC must write its CSV log"
    import csv as csvmod
    with open(os.path.join("results", csvs[0])) as f:
        rows = list(csvmod.reader(f))
    assert len(rows) >= 1
    # schema: sim, step, 12 noise, sdf, 3 pos, loglik, cumloglik, reward,
    # sigma, isCollision, everCollided (MonteCarlo.py:95-110)
    assert len(rows[0]) == 2 + 12 + 1 + 3 + 2 + 2 + 2


def test_nerf_simulator_laplace_uq(stack, tmp_path, monkeypatch):
    """Config-5 core: the validation loop with Bayesian-Laplace online UQ."""
    monkeypatch.chdir(tmp_path)
    sim = make_simulator(stack, tmp_path, steps=2)
    sim.uq_method = "Bayesian Laplace Approximation"
    sim.uq_kwargs = {"laplace_fit_steps": 3, "laplace_max_points": 32}
    sim.reset()
    collided, collisionVal, pos, sigma, trace = sim.step(jnp.full(12, 0.001))
    assert np.isfinite(sigma) and np.isfinite(trace)
    r = sim.reward(likelihood=10.0, sigma_d_opt=sigma, trace=trace)
    assert np.isfinite(r)


def test_cem_one_population(stack, tmp_path, monkeypatch):
    """Sequential CEM over the NerfSimulator (validate.py CEM branch)."""
    monkeypatch.chdir(tmp_path)
    from nerfsafetyvalidation_tpu.validation.distributions import (
        SeedableMultivariateNormal)
    from nerfsafetyvalidation_tpu.validation.stresstests import (
        CrossEntropyMethod)
    sim = make_simulator(stack, tmp_path, steps=2)
    means = [jnp.zeros(12)] * 2
    covs = [jnp.eye(12) * 1e-4] * 2
    q = SeedableMultivariateNormal(means, covs, noise_seed=0)
    p = SeedableMultivariateNormal(means, covs, noise_seed=0)
    cem = CrossEntropyMethod(sim, q, p, m=2, m_elite=1, kmax=1,
                             noise_seed=0, blend_file=None, workspace="itest")
    means_out, covs_out, q_out, bm, bc, bv = cem.optimize()
    assert len(means_out) == 2
    assert np.isfinite(bv)
    import os as _os
    csvs = [f for f in _os.listdir("results") if "CEM" in f]
    assert csvs, "CEM must write its CSV log"
