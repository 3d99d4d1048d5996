"""Tests for the NeRF network + renderer (reference L2 replacements)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.models import renderer
from nerfsafetyvalidation_tpu.data.rays import get_rays, rand_poses, nerf_matrix_to_ngp


def small_cfg(**kw):
    base = dict(num_levels=4, desired_resolution=64, bound=1.0)
    base.update(kw)
    return NetworkConfig(**base)


@pytest.fixture(scope="module")
def net_and_params():
    cfg = small_cfg()
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


class TestNetwork:
    def test_param_shapes(self, net_and_params):
        net, params = net_and_params
        # sigma net: in 4*2=8 -> 64 -> 16 (1 sigma + 15 geo)
        assert params["sigma_net"][0].shape == (8, 64)
        assert params["sigma_net"][1].shape == (64, 16)
        # color net: SH16 + geo15 = 31 -> 64 -> 64 -> 3
        assert params["color_net"][0].shape == (31, 64)
        assert params["color_net"][2].shape == (64, 3)

    def test_density_and_color(self, net_and_params):
        net, params = net_and_params
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                        dtype=jnp.float32)
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        out = net.density(params, x)
        assert out["sigma"].shape == (32,)
        assert out["geo_feat"].shape == (32, 15)
        assert (np.asarray(out["sigma"]) > 0).all()  # trunc_exp
        sigma, rgb = net.apply(params, x, d)
        assert rgb.shape == (32, 3)
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()

    def test_color_mask_zeroes(self, net_and_params):
        net, params = net_and_params
        x = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        geo = jnp.ones((4, 15))
        mask = jnp.asarray([True, False, True, False])
        rgb = np.asarray(net.color(params, x, d, geo_feat=geo, mask=mask))
        assert (rgb[1] == 0).all() and (rgb[3] == 0).all()
        assert (rgb[0] > 0).any()

    def test_sigma_net_flatpack_roundtrip(self, net_and_params):
        net, params = net_and_params
        flat = net.get_sigma_net_flat(params)
        assert flat.shape == (8 * 64 + 64 * 16,)
        p2 = net.set_sigma_net_flat(params, flat * 2.0)
        np.testing.assert_allclose(np.asarray(p2["sigma_net"][0]),
                                   2 * np.asarray(params["sigma_net"][0]),
                                   rtol=1e-6)
        p3 = net.set_sigma_net_flat(p2, flat)
        np.testing.assert_allclose(np.asarray(p3["sigma_net"][1]),
                                   np.asarray(params["sigma_net"][1]), rtol=1e-6)

    def test_frequency_backbone(self):
        cfg = small_cfg(encoding="frequency")
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(1))
        assert params["sigma_net"][0].shape == (3 + 3 * 2 * 6, 64)
        x = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        sigma, rgb = net.apply(params, x, d)
        assert sigma.shape == (4,) and rgb.shape == (4, 3)


class TestRenderer:
    def test_run_contract(self, net_and_params):
        net, params = net_and_params
        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 3)), dtype=jnp.float32)
        d = rng.normal(size=(8, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        res = renderer.run(net, params, o, d, num_steps=16, upsample_steps=0,
                           bg_color=1.0)
        assert res["image"].shape == (8, 3)
        assert res["depth"].shape == (8,)
        assert res["sigmas"].shape == (8 * 16, 1)
        assert res["rgbs"].shape == (8, 16, 3)
        assert res["aggregated_density"].shape == (8,)
        # random-init table has tiny features -> sigma ~ exp(small) -> weights
        # small but image must stay in [0, 1+eps] with bg=1
        img = np.asarray(res["image"])
        assert np.isfinite(img).all()
        assert (img <= 1.0 + 1e-4).all()

    def test_run_upsample(self, net_and_params):
        net, params = net_and_params
        o = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        res = renderer.run(net, params, o, d, num_steps=8, upsample_steps=8,
                           bg_color=0.0)
        assert res["rgbs"].shape == (4, 16, 3)
        assert res["sigmas"].shape == (4 * 16, 1)

    def test_staged_matches_unstaged(self, net_and_params):
        net, params = net_and_params
        rng = np.random.default_rng(2)
        o = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 10, 3)), dtype=jnp.float32)
        dn = rng.normal(size=(1, 10, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        d = jnp.asarray(dn)
        full = renderer.render(net, params, o, d, staged=False, num_steps=16)
        staged = renderer.render(net, params, o, d, staged=True,
                                 max_ray_batch=4, num_steps=16)
        np.testing.assert_allclose(np.asarray(full["image"]),
                                   np.asarray(staged["image"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(full["aggregated_density"]),
                                   np.asarray(staged["aggregated_density"]),
                                   rtol=1e-4, atol=1e-5)
        # staged quirk: rgbs/sigmas from the last chunk only (renderer.py:581)
        assert staged["rgbs"].shape == (4, 16, 3)

    def test_render_tiles_matches_run(self, net_and_params):
        net, params = net_and_params
        rng = np.random.default_rng(3)
        o = jnp.asarray(rng.uniform(-0.5, 0.5, (10, 3)), dtype=jnp.float32)
        dn = rng.normal(size=(10, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        d = jnp.asarray(dn)
        ref = renderer.run(net, params, o, d, num_steps=16, upsample_steps=0)
        fast = renderer.render_tiles(net, params, o, d, tile=4, num_steps=16)
        np.testing.assert_allclose(np.asarray(ref["image"]),
                                   np.asarray(fast["image"]), rtol=1e-4,
                                   atol=1e-5)

    def test_update_extra_state(self, net_and_params):
        net, params = net_and_params
        state = renderer.RendererState.create(cascade=1, grid_size=32)
        new = renderer.update_extra_state(net, params, state,
                                          jax.random.PRNGKey(0), grid_size=32)
        assert int(new.iter_density) == 1
        assert float(new.mean_density) >= 0
        assert new.density_bitfield.shape == (32 ** 3 // 8,)

    def test_update_extra_state_partial_covers_grid(self, net_and_params):
        """A 4-block partial-update cycle probes every cell once and lands
        within jitter noise of one full update (the reference's partial
        update path, renderer.py:472-500)."""
        net, params = net_and_params
        state = renderer.RendererState.create(cascade=1, grid_size=32)
        full = renderer.update_extra_state(net, params, state,
                                           jax.random.PRNGKey(0),
                                           grid_size=32)
        part = state
        for b in range(4):
            part = renderer.update_extra_state(net, params, part,
                                               jax.random.PRNGKey(b),
                                               grid_size=32, n_blocks=4,
                                               block=b)
        g_full = np.asarray(full.density_grid)
        g_part = np.asarray(part.density_grid)
        # every cell refreshed (fresh grid starts at 0; sigma probes >= 0
        # everywhere, so refreshed cells move off the decay trajectory of
        # an unprobed zero cell only if probed — compare against full)
        rel = np.abs(g_part - g_full) / (np.abs(g_full) + 1e-3)
        assert np.quantile(rel, 0.95) < 0.5     # jitter-level agreement
        # bitfields agree almost everywhere
        bits_f = np.unpackbits(np.asarray(full.density_bitfield))
        bits_p = np.unpackbits(np.asarray(part.density_bitfield))
        assert (bits_f == bits_p).mean() > 0.95

    def test_mark_untrained_grid(self, net_and_params):
        net, params = net_and_params
        state = renderer.RendererState.create(cascade=1, grid_size=32)
        # one camera at -z looking +z
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        new = renderer.mark_untrained_grid(net.cfg, state, pose[None],
                                           (100.0, 100.0, 16.0, 16.0),
                                           grid_size=32)
        grid = np.asarray(new.density_grid)
        assert (grid == -1).any()          # cells behind the camera untrained
        assert (grid == 0).any()           # visible cells untouched


class TestRays:
    def test_get_rays_full(self):
        pose = jnp.eye(4)[None]
        rays = get_rays(pose, (50.0, 50.0, 8.0, 8.0), 16, 16)
        assert rays["rays_o"].shape == (1, 256, 3)
        norms = np.linalg.norm(np.asarray(rays["rays_d"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        # center pixel ray ~ +z in camera frame = pose rotation row
        center = np.asarray(rays["rays_d"][0, 8 * 16 + 8])
        np.testing.assert_allclose(center, [0, 0, 1], atol=0.05)

    def test_get_rays_subsample(self):
        pose = jnp.eye(4)[None]
        rays = get_rays(pose, (50.0, 50.0, 8.0, 8.0), 16, 16, N=32,
                        key=jax.random.PRNGKey(0))
        assert rays["rays_o"].shape == (1, 32, 3)
        assert rays["inds"].shape == (1, 32)
        assert (np.asarray(rays["inds"]) < 256).all()

    def test_rand_poses_orthonormal(self):
        poses = np.asarray(rand_poses(jax.random.PRNGKey(0), 4, radius=2.0))
        for p in poses:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 2.0, rtol=1e-5)

    def test_nerf_matrix_to_ngp(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        ngp = nerf_matrix_to_ngp(pose, scale=0.5)
        np.testing.assert_allclose(ngp[:3, 3], [1.0, 1.5, 0.5])
        assert ngp[3, 3] == 1.0


class TestNetworkTCNN:
    """network_tcnn is a real distinct backbone (round-1 flagged the alias):
    biased MLPs (reference network_tcnn.py:12-24 nn.Linear default) vs the
    bias-free default backbone."""

    def test_biased_mlps_and_forward(self):
        import jax
        import jax.numpy as jnp
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network_tcnn import (
            NeRFNetworkTCNN)

        cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0)
        net = NeRFNetworkTCNN(cfg)
        params = net.init(jax.random.PRNGKey(0))
        assert "b" in params["sigma_net"][0] and "w" in params["sigma_net"][0]
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                        dtype=jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 32)
        sigma, rgb = net.apply(params, x, d)
        assert sigma.shape == (32,) and rgb.shape == (32, 3)
        assert bool(jnp.all(jnp.isfinite(sigma)))
        # biases actually matter: zeroing them changes the output
        import jax.tree_util as jtu
        p0 = dict(params)
        p0["sigma_net"] = [{"w": l["w"], "b": jnp.zeros_like(l["b"])}
                           for l in params["sigma_net"]]
        s0, _ = net.apply(p0, x, d)
        assert not np.allclose(np.asarray(sigma), np.asarray(s0))

    def test_sigma_flat_roundtrip_includes_biases(self):
        import jax
        import jax.numpy as jnp
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network_tcnn import (
            NeRFNetworkTCNN)

        cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0)
        net = NeRFNetworkTCNN(cfg)
        params = net.init(jax.random.PRNGKey(1))
        flat = net.get_sigma_net_flat(params)
        n_expected = sum(l["w"].size + l["b"].size
                         for l in params["sigma_net"])
        assert flat.size == n_expected
        back = net.set_sigma_net_flat(params, flat)
        for a, b in zip(params["sigma_net"], back["sigma_net"]):
            np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]))
            np.testing.assert_allclose(np.asarray(a["b"]), np.asarray(b["b"]))

    def test_make_network_dispatch(self):
        from types import SimpleNamespace
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models import make_network
        from nerfsafetyvalidation_tpu.models.network_tcnn import (
            NeRFNetworkTCNN)

        cfg = NetworkConfig(num_levels=4, desired_resolution=64)
        net = make_network(cfg, SimpleNamespace(tcnn=True, ff=False))
        assert isinstance(net, NeRFNetworkTCNN)
