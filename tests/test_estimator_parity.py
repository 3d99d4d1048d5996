"""Estimator measurement-function parity vs the reference.

Wires the reference's Estimator.measurement_fn (estimator_helpers.py:191-225)
and ours to identical fake differentiable renderers and requires matching
losses and state gradients — this pins the camera-frame correction
(rot_x(pi/2)), the NGP axis remap, the Mahalanobis prior and the masked-ray
MSE against the reference math.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

import jax
import jax.numpy as jnp

if REF not in sys.path:
    sys.path.insert(0, REF)

H = W = 8
INTR = (10.0, 10.0, 4.0, 4.0)


def _torch_get_rays(poses):
    """Reference get_rays (nerf/utils.py:52-116) torch CPU re-derivation for
    the fixture (full-image mode)."""
    B = poses.shape[0]
    fx, fy, cx, cy = INTR
    i, j = torch.meshgrid(torch.linspace(0, W - 1, W),
                          torch.linspace(0, H - 1, H), indexing="ij")
    i = i.t().reshape(1, H * W).expand(B, H * W) + 0.5
    j = j.t().reshape(1, H * W).expand(B, H * W) + 0.5
    zs = torch.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    dirs = torch.stack((xs, ys, zs), dim=-1)
    dirs = dirs / torch.norm(dirs, dim=-1, keepdim=True)
    rays_d = dirs @ poses[:, :3, :3].transpose(-1, -2)
    rays_o = poses[..., :3, 3][..., None, :].expand_as(rays_d)
    return {"rays_o": rays_o, "rays_d": rays_d}


def test_measurement_fn_parity():
    import importlib
    est_mod = importlib.import_module("nav.estimator_helpers")
    from nerfsafetyvalidation_tpu.nav.estimator import Estimator
    from nerfsafetyvalidation_tpu.data.rays import get_rays

    rng = np.random.default_rng(0)
    target_np = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    batch_np = rng.integers(0, H, (12, 2))
    state_np = (rng.normal(size=12) * 0.1).astype(np.float32)
    start_np = np.zeros(12, dtype=np.float32)
    sig_np = np.eye(12, dtype=np.float32)

    # identical fake renderer: shade by direction
    def render_torch(rays_o, rays_d):
        return {"image": 0.5 + 0.25 * rays_d.reshape(-1, 3)}

    def render_jax(rays_o, rays_d):
        return {"image": 0.5 + 0.25 * rays_d.reshape(-1, 3)}

    cfg = {"dil_iter": 1, "kernel_size": 3, "batch_size": 12, "lrate": 1e-3,
           "N_iter": 1, "render_viz": False, "show_rate": [20, 100],
           "sig0": torch.eye(12), "Q": torch.eye(12)}
    ref_est = est_mod.Estimator.__new__(est_mod.Estimator)
    ref_est.get_rays = _torch_get_rays
    ref_est.render_fn = render_torch

    jcfg = dict(cfg)
    jcfg["sig0"] = jnp.eye(12)
    jcfg["Q"] = jnp.eye(12)
    ours = Estimator(jcfg, agent=None, start_state=jnp.zeros(12),
                     get_rays_fn=lambda p: get_rays(p, INTR, H, W),
                     render_fn=render_jax)

    state_t = torch.from_numpy(state_np).requires_grad_(True)
    loss_ref = ref_est.measurement_fn(
        state_t, torch.from_numpy(start_np), torch.from_numpy(sig_np),
        torch.from_numpy(target_np), batch_np)
    loss_ref.backward()
    grad_ref = state_t.grad.numpy()

    loss_fn = lambda s: ours.measurement_fn(
        s, jnp.asarray(start_np), jnp.asarray(sig_np),
        jnp.asarray(target_np), jnp.asarray(batch_np, dtype=jnp.int32))
    loss_j, grad_j = jax.value_and_grad(loss_fn)(jnp.asarray(state_np))

    np.testing.assert_allclose(float(loss_j), float(loss_ref.detach()),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(grad_j), grad_ref, rtol=5e-3,
                               atol=1e-4)
