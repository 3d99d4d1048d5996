"""Offline UQ orchestrator sweep (uncertain.py offline modes) with a stubbed
renderer + a synthetic dataset directory."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.uq.orchestrator import uncertainty
from nerfsafetyvalidation_tpu.uq.nerf_utils import load_camera_params
from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork

H = W = 8


@pytest.fixture()
def dataset_dir(tmp_path):
    root = tmp_path / "scene"
    (root / "train").mkdir(parents=True)
    frames = []
    for i in range(2):
        name = f"r_{i}"
        (root / "train" / f"{name}.png").write_bytes(b"")
        pose = np.eye(4)
        pose[2, 3] = 2.0 + i
        frames.append({"file_path": f"./train/{name}",
                       "transform_matrix": pose.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root)


def _stub_fns():
    from nerfsafetyvalidation_tpu.data.rays import get_rays
    intr = (10.0, 10.0, W / 2, H / 2)
    rng = np.random.default_rng(0)

    def get_rays_fn(pose):
        return get_rays(jnp.asarray(pose, dtype=jnp.float32), intr, H, W)

    def render_fn(rays_o, rays_d):
        n = rays_o.reshape(-1, 3).shape[0]
        return {
            "image": jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
            "rgbs": jnp.asarray(rng.uniform(0, 1, (n, 4, 3)), jnp.float32),
            "sigmas": jnp.asarray(rng.uniform(0, 2, (n * 4, 1)), jnp.float32),
            "aggregated_density": jnp.asarray(rng.uniform(0, 1, (1, n)),
                                              jnp.float32),
        }

    return get_rays_fn, render_fn


def test_load_camera_params(dataset_dir):
    m = load_camera_params("./train/r_1.png", dataset_dir)
    assert np.asarray(m)[2, 3] == 3.0
    with pytest.raises(ValueError):
        load_camera_params("./train/nope", dataset_dir)


def test_offline_gaussian_sweep(dataset_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("results", exist_ok=True)
    get_rays_fn, render_fn = _stub_fns()
    results = uncertainty("Gaussian Approximation",
                          path_to_images=os.path.join(dataset_dir, "train"),
                          render_fn=render_fn, get_rays_fn=get_rays_fn,
                          dataset_path=dataset_dir, H=H, W=W)
    total = (len(results["optimized_mu_d"]))
    assert total <= 2  # some may be filtered as absolute (un)certain
    if results["optimized_mu_d"]:
        assert os.path.exists("results/uncertainty_heatmap.png")


def test_offline_laplace_sweep(dataset_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("results", exist_ok=True)
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    get_rays_fn, render_fn = _stub_fns()
    results = uncertainty("Bayesian Laplace Approximation",
                          path_to_images=os.path.join(dataset_dir, "train"),
                          net=net, params=params, lr=1e-3,
                          render_fn=render_fn, get_rays_fn=get_rays_fn,
                          dataset_path=dataset_dir, H=H, W=W,
                          laplace_fit_steps=3)
    assert len(results["trace"]) == 2
    assert all(np.isfinite(t) for t in results["trace"])
    assert all(np.isfinite(r) for r in results["rmv"])
