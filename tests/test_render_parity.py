"""Per-pixel render parity vs the reference's pure-PyTorch volume renderer.

Loads the reference's `NeRFRenderer.run()` (nerf/renderer.py:125-258 — the
exact path validate.py drives) on CPU with its CUDA-only deps stubbed, wires
both stacks to an identical analytic density/color field, and requires the
rendered images to match per-pixel. This validates sampling, delta
construction, exclusive-cumprod compositing, the weights>1e-4 color mask,
background blending, depth normalization and aggregated_density against the
reference implementation directly (SURVEY.md hard part #3).
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


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_renderer_cls():
    """Import reference nerf.renderer with CUDA/visual deps stubbed."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # raymarching: provide torch CPU implementations of the two functions
    # the pure-torch path uses (near_far_from_aabb, sph_from_ray)
    def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
        rd = 1.0 / rays_d
        t0 = (aabb[:3] - rays_o) * rd
        t1 = (aabb[3:] - rays_o) * rd
        tmin = torch.minimum(t0, t1).amax(-1)
        tmax = torch.maximum(t0, t1).amin(-1)
        miss = tmin > tmax
        near = torch.clamp(tmin, min=min_near)
        fmax = torch.finfo(torch.float32).max
        near = torch.where(miss, torch.full_like(near, fmax), near)
        far = torch.where(miss, torch.full_like(tmax, fmax), tmax)
        return near, far

    _stub("raymarching", near_far_from_aabb=near_far_from_aabb,
          sph_from_ray=None, morton3D=None, morton3D_invert=None,
          packbits=None, march_rays_train=None, composite_rays_train=None,
          march_rays=None, composite_rays=None)
    _stub("trimesh", PointCloud=object, creation=types.SimpleNamespace(),
          Scene=object, load_path=lambda *a, **k: None)
    _stub("mcubes", marching_cubes=lambda *a, **k: (None, None))
    _stub("lpips", LPIPS=object)
    _stub("torch_ema", ExponentialMovingAverage=object)
    _stub("tensorboardX", SummaryWriter=object)

    import importlib
    renderer_mod = importlib.import_module("nerf.renderer")
    return renderer_mod.NeRFRenderer


def _analytic_field_torch():
    """Simple smooth density+color field with a bump at the origin."""
    class Field(torch.nn.Module):
        def density(self, x):
            sigma = 20.0 * torch.exp(-torch.sum(x ** 2, -1) / 0.1)
            return {"sigma": sigma, "geo_feat": x}

        def color(self, x, d, mask=None, geo_feat=None, **kw):
            rgb = torch.sigmoid(geo_feat + 0.3 * d)
            if mask is not None:
                out = torch.zeros(mask.shape[0], 3, dtype=rgb.dtype)
                out[mask] = rgb[mask].float()
                return out
            return rgb

        def background(self, sph, d):
            raise AssertionError("bg model unused")

        def forward(self, x, d):
            out = self.density(x)
            return out["sigma"], self.color(x, d, geo_feat=out["geo_feat"])

    return Field()


class _JaxField:
    """The same analytic field for our renderer's `net` interface."""

    class _Cfg:
        bound = 1.0
        min_near = 0.2
        density_scale = 1.0
        bg_radius = -1.0

    cfg = _Cfg()

    def density(self, params, x):
        sigma = 20.0 * jnp.exp(-jnp.sum(x ** 2, -1) / 0.1)
        return {"sigma": sigma, "geo_feat": x}

    def color(self, params, x, d, geo_feat=None, mask=None, **kw):
        rgb = jax.nn.sigmoid(geo_feat + 0.3 * d)
        if mask is not None:
            rgb = jnp.where(mask[..., None], rgb, 0.0)
        return rgb


def test_run_per_pixel_parity(ref_renderer_cls):
    from nerfsafetyvalidation_tpu.models import renderer as R

    # reference renderer instance over the torch field
    class RefModel(ref_renderer_cls):
        def __init__(self):
            super().__init__(bound=1.0, cuda_ray=False, density_scale=1,
                             min_near=0.2, density_thresh=0.01, bg_radius=-1)
            self.field = _analytic_field_torch()

        def density(self, x):
            return self.field.density(x)

        def color(self, x, d, mask=None, **kw):
            return self.field.color(x, d, mask=mask, **kw)

        def forward(self, x, d):
            return self.field(x, d)

    ref_model = RefModel().eval()

    rng = np.random.default_rng(0)
    N = 64
    o = rng.uniform(-0.2, 0.2, (N, 3)).astype(np.float32)
    o[:, 2] -= 2.0
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_out = ref_model.run(torch.from_numpy(o)[None],
                                torch.from_numpy(d)[None],
                                num_steps=64, upsample_steps=0,
                                bg_color=1.0, perturb=False)

    ours = R.run(_JaxField(), None, jnp.asarray(o), jnp.asarray(d),
                 num_steps=64, upsample_steps=0, bg_color=1.0, perturb=False)

    np.testing.assert_allclose(np.asarray(ours["image"]),
                               ref_out["image"].numpy().reshape(N, 3),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["weights_sum"]),
                               ref_out["weights_sum"].numpy().reshape(N),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["aggregated_density"]),
                               ref_out["aggregated_density"].numpy().reshape(N),
                               rtol=2e-3, atol=1e-3)
    # depth: reference emits NaN for miss rays (0/0); compare hits only
    ref_depth = ref_out["depth"].numpy().reshape(N)
    hit = ~np.isnan(ref_depth)
    np.testing.assert_allclose(np.asarray(ours["depth"])[hit],
                               ref_depth[hit], rtol=1e-3, atol=1e-4)
    assert hit.any()


def test_run_upsample_parity(ref_renderer_cls):
    """Hierarchical upsampling path (deterministic PDF sampling)."""
    from nerfsafetyvalidation_tpu.models import renderer as R

    class RefModel(ref_renderer_cls):
        def __init__(self):
            super().__init__(bound=1.0, cuda_ray=False, density_scale=1,
                             min_near=0.2, density_thresh=0.01, bg_radius=-1)
            self.field = _analytic_field_torch()

        def density(self, x):
            return self.field.density(x)

        def color(self, x, d, mask=None, **kw):
            return self.field.color(x, d, mask=mask, **kw)

    ref_model = RefModel().eval()

    rng = np.random.default_rng(1)
    N = 16
    o = np.zeros((N, 3), dtype=np.float32)
    o[:, 2] = -2.0
    o[:, 0] = rng.uniform(-0.3, 0.3, N)
    d = np.tile(np.asarray([0.0, 0.0, 1.0], dtype=np.float32), (N, 1))

    with torch.no_grad():
        ref_out = ref_model.run(torch.from_numpy(o)[None],
                                torch.from_numpy(d)[None],
                                num_steps=32, upsample_steps=32,
                                bg_color=1.0, perturb=False)

    ours = R.run(_JaxField(), None, jnp.asarray(o), jnp.asarray(d),
                 num_steps=32, upsample_steps=32, bg_color=1.0,
                 perturb=False, training=False)

    np.testing.assert_allclose(np.asarray(ours["image"]),
                               ref_out["image"].numpy().reshape(N, 3),
                               rtol=2e-3, atol=2e-3)
