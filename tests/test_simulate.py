"""End-to-end MPC simulation loop (reference simulate.py:17-100)."""

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

RES = 16


def test_simulate_mpc_loop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # import OUR simulate.py by path (the reference-parity tests put
    # /root/reference, which has its own simulate.py, on sys.path)
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "nsv_simulate",
        os.path.join(os.path.dirname(__file__), "..", "simulate.py"))
    sim_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sim_mod)

    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    intr = (20.0, 20.0, RES / 2, RES / 2)
    get_rays_fn = lambda pose: get_rays(pose, intr, RES, RES)
    render_fn = lambda o, d: R.render(net, params, o, d, staged=False,
                                      bg_color=1.0, num_steps=8,
                                      upsample_steps=0)
    rot = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    density_fn = lambda x: 1e-3 * net.density(params, x.reshape((-1, 3)) @ rot)[
        "sigma"].reshape(x.shape[:-1])

    init_rates = jnp.zeros(3)
    sR = vec_to_rot_matrix(jnp.zeros(3))
    start = jnp.concatenate([jnp.asarray([-0.4, -0.4, 0.1]), init_rates,
                             sR.reshape(-1), init_rates])
    end = jnp.concatenate([jnp.asarray([0.4, 0.4, 0.1]), init_rates,
                           sR.reshape(-1), init_rates])

    agent_cfg = {"mass": 1.0, "g": 10.0, "I": np.eye(3).tolist(),
                 "dt": 0.5, "path": str(tmp_path / "cache")}
    planner_cfg = {"T_final": 2.0, "steps": 8, "lr": 1e-3, "epochs_init": 3,
                   "epochs_update": 2, "fade_out_epoch": 0,
                   "fade_out_sharpness": 10, "start_state": start,
                   "end_state": end, "exp_name": "simtest",
                   "I": jnp.eye(3), "g": 10.0, "mass": 1.0,
                   "body": np.asarray([[-0.05, 0.05], [-0.05, 0.05],
                                       [-0.02, 0.02]]),
                   "nbins": [2, 2, 2]}
    camera_cfg = {"res_x": RES, "res_y": RES, "trans": True, "mode": "RGBA",
                  "path": str(tmp_path / "cache"), "half_res": False,
                  "white_bg": True}
    filter_cfg = {"dil_iter": 2, "kernel_size": 3, "batch_size": 16,
                  "lrate": 1e-3, "N_iter": 2, "render_viz": False,
                  "show_rate": [20, 100], "sig0": jnp.eye(12),
                  "Q": jnp.eye(12)}
    extra_cfg = {"mpc_noise_std": [0.01] * 12, "mpc_noise_mean": [0.0] * 12}
    cam = CannedCamera(res_x=RES, res_y=RES)

    states = sim_mod.simulate(planner_cfg, agent_cfg, camera_cfg,
                              {"blend_path": None, "script_path": None},
                              filter_cfg, extra_cfg, density_fn, render_fn,
                              get_rays_fn, camera=cam, seed=0,
                              interactive=False)
    # the agent stepped through the plan; states logged per step
    assert states.shape[0] >= 4
    assert np.isfinite(states).all()
    # estimator data persisted per step (simulate loop side effects)
    est_dir = tmp_path / "paths" / "simtest" / "estimator_data"
    assert any(est_dir.iterdir())
