"""Fused Pallas MLP tests (reference ffmlp N5 analog) — interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfsafetyvalidation_tpu.ops.pallas.fused_mlp import (
    fused_mlp, _xla_mlp, _fused_mlp_vjp)


def _weights(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    return [jax.random.normal(k, (dims[i], dims[i + 1])) * 0.1
            for i, k in enumerate(ks)]


def test_fused_matches_xla():
    ws = _weights(jax.random.PRNGKey(0), [32, 64, 16])
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 32))
    out = _fused_mlp_vjp(x, tuple(ws), "float32", True)  # interpret mode
    ref = _xla_mlp(x, ws, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_3layer_color_shape():
    ws = _weights(jax.random.PRNGKey(2), [31, 64, 64, 3])
    x = jax.random.normal(jax.random.PRNGKey(3), (17, 31))
    out = _fused_mlp_vjp(x, tuple(ws), "float32", True)
    assert out.shape == (17, 3)
    ref = _xla_mlp(x, ws, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match():
    ws = _weights(jax.random.PRNGKey(4), [8, 16, 4])
    x = jax.random.normal(jax.random.PRNGKey(5), (12, 8))

    def loss_fused(ws):
        return jnp.sum(_fused_mlp_vjp(x, tuple(ws), "float32", True) ** 2)

    def loss_ref(ws):
        return jnp.sum(_xla_mlp(x, ws, jnp.float32) ** 2)

    g_fused = jax.grad(lambda w: loss_fused(w))(ws)
    g_ref = jax.grad(loss_ref)(ws)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_network_fused_flag_matches_plain():
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    import dataclasses
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    cfg_f = dataclasses.replace(cfg, fused=True)
    net_f = NeRFNetwork(cfg_f)
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (8, 3)),
                    dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
    s0, c0 = net.apply(params, x, d)
    s1, c1 = net_f.apply(params, x, d)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=2e-2)


def test_network_ff_topology():
    """FF variant matches the reference topology: extra hidden matmul per
    net + 32-wide padded color input (network_ff.py:30-48, :67-68)."""
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network_ff import NeRFNetworkFF
    cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0)
    net = NeRFNetworkFF(cfg)
    params = net.init(jax.random.PRNGKey(0))
    assert [w.shape for w in params["sigma_net"]] == \
        [(8, 64), (64, 64), (64, 16)]
    assert [w.shape for w in params["color_net"]] == \
        [(32, 64), (64, 64), (64, 64), (64, 3)]
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (8, 3)),
                    dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
    sigma, rgb = net.apply(params, x, d)
    assert sigma.shape == (8,) and rgb.shape == (8, 3)
    assert np.isfinite(np.asarray(sigma)).all()


def test_network_ff_rejects_bg():
    import pytest as _pytest
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network_ff import NeRFNetworkFF
    with _pytest.raises(AssertionError):
        NeRFNetworkFF(NetworkConfig(bg_radius=1.0))


class TestFusedSigmaColor:
    """One-kernel sigma+color render MLP (reference kernel_mlp_fused role,
    ffmlp.cu:332-409)."""

    def _nets(self):
        import jax
        rng = np.random.default_rng(0)
        sigma_net = [jnp.asarray(rng.normal(0, 0.2, (32, 64)), jnp.float32),
                     jnp.asarray(rng.normal(0, 0.2, (64, 16)), jnp.float32)]
        color_net = [jnp.asarray(rng.normal(0, 0.2, (31, 64)), jnp.float32),
                     jnp.asarray(rng.normal(0, 0.2, (64, 64)), jnp.float32),
                     jnp.asarray(rng.normal(0, 0.2, (64, 3)), jnp.float32)]
        enc = jnp.asarray(rng.normal(0, 0.5, (300, 32)), jnp.float32)
        sh = jnp.asarray(rng.normal(0, 0.5, (300, 16)), jnp.float32)
        return enc, sh, sigma_net, color_net

    def test_matches_xla_reference(self):
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_sigma_color, _xla_ref)
        enc, sh, sn, cn = self._nets()
        s, rgb = fused_sigma_color(enc, sh, sn, cn,
                                   compute_dtype=jnp.float32)
        s_ref, rgb_ref = _xla_ref(enc, sh, tuple(sn), tuple(cn), jnp.float32)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_flow(self):
        import jax
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_sigma_color)
        enc, sh, sn, cn = self._nets()

        def loss(sn, cn, enc):
            s, rgb = fused_sigma_color(enc, sh, sn, cn,
                                       compute_dtype=jnp.float32)
            return jnp.sum(s) + jnp.sum(rgb)

        g_sn, g_cn, g_enc = jax.grad(loss, argnums=(0, 1, 2))(sn, cn, enc)
        for g in g_sn + g_cn + [g_enc]:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_mip_backbone_fused_matches_unfused(self):
        import jax
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models import make_network
        from dataclasses import replace

        cfg = NetworkConfig(encoding="mipfold", bound=1.0, num_levels=5,
                            level_dim=2, base_resolution=4,
                            fold_max_scale=16, log2_hashmap_size=10)
        net = make_network(cfg)
        params = net.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (200, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(200, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s0, r0 = net.apply(params, x, d)
        net_f = make_network(replace(cfg, fused=True))
        s1, r1 = net_f.apply(params, x, d)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                                   rtol=2e-4, atol=1e-5)


class TestFusedSigmaColorDeep:
    """Arbitrary-depth megakernel (the distilled-student chain:
    75-lane freq encode -> 6x256 sigma net -> SH+geo color net)."""

    def _nets(self):
        rng = np.random.default_rng(1)

        def mat(i, o):
            return jnp.asarray(rng.normal(0, 0.15, (i, o)), jnp.float32)

        sigma_net = [mat(75, 256)] + [mat(256, 256)] * 4 + [mat(256, 16)]
        color_net = [mat(31, 64), mat(64, 64), mat(64, 3)]
        enc = jnp.asarray(rng.normal(0, 0.5, (300, 75)), jnp.float32)
        sh = jnp.asarray(rng.normal(0, 0.5, (300, 16)), jnp.float32)
        return enc, sh, sigma_net, color_net

    def test_matches_xla_reference(self):
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_sigma_color_deep, _xla_ref_deep)
        enc, sh, sn, cn = self._nets()
        s, rgb = fused_sigma_color_deep(enc, sh, sn, cn,
                                        compute_dtype=jnp.float32)
        s_ref, rgb_ref = _xla_ref_deep(enc, sh, tuple(sn), tuple(cn),
                                       jnp.float32)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_network_level_fused_matches_unfused(self):
        """NeRFNetwork(frequency, fused=True).apply routes the whole chain
        through the deep kernel and matches the unfused apply."""
        import jax
        from dataclasses import replace
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
        cfg = NetworkConfig(encoding="frequency", multires=6, num_layers=3,
                            hidden_dim=64, hidden_dim_color=32, bound=1.0,
                            compute_dtype="float32")
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(3))
        netf = NeRFNetwork(replace(cfg, fused=True))
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (257, 3)), jnp.float32)
        d0 = rng.normal(size=(257, 3))
        d = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True),
                        jnp.float32)
        s0, c0 = net.apply(params, x, d)
        s1, c1 = netf.apply(params, x, d)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        import jax
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_sigma_color_deep)
        enc, sh, sn, cn = self._nets()

        def loss(sn, cn, enc):
            s, rgb = fused_sigma_color_deep(enc, sh, sn, cn,
                                            compute_dtype=jnp.float32)
            return jnp.sum(s) + jnp.sum(rgb)

        g_sn, g_cn, g_enc = jax.grad(loss, argnums=(0, 1, 2))(sn, cn, enc)
        for g in list(g_sn) + list(g_cn) + [g_enc]:
            assert np.isfinite(np.asarray(g)).all()


class TestFusedPointsKernel:
    """Points-in megakernel: in-kernel frequency encoding + full chain
    (ops/pallas/render_mlp.py fused_points_sigma_color)."""

    def _nets(self, multires=12):
        rng = np.random.default_rng(9)

        def mat(i, o):
            return jnp.asarray(rng.normal(0, 0.15, (i, o)), jnp.float32)

        d_in = 3 + 6 * multires
        sigma_net = [mat(d_in, 256)] + [mat(256, 256)] * 4 + [mat(256, 16)]
        color_net = [mat(31, 64), mat(64, 64), mat(64, 3)]
        x = jnp.asarray(rng.uniform(-1, 1, (300, 3)), jnp.float32)
        sh = jnp.asarray(rng.normal(0, 0.5, (300, 16)), jnp.float32)
        return x, sh, sigma_net, color_net

    def test_matches_xla_reference(self):
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_points_sigma_color, _xla_ref_deep)
        from nerfsafetyvalidation_tpu.ops.freq_encoding import freq_encode
        x, sh, sn, cn = self._nets()
        s, rgb = fused_points_sigma_color(x, sh, sn, cn, 12,
                                          compute_dtype=jnp.float32)
        s_ref, rgb_ref = _xla_ref_deep(freq_encode(x, 12), sh,
                                       tuple(sn), tuple(cn), jnp.float32)
        # cos(t) is computed as sin(t + pi/2): the f32 rounding of pi/2
        # shifts the argument by ~1e-7 rad, which trunc_exp amplifies to
        # ~1e-4 relative on large sigmas
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=5e-4, atol=1e-5)

    def test_gradients_match_unfused(self):
        import jax
        from nerfsafetyvalidation_tpu.ops.pallas.render_mlp import (
            fused_points_sigma_color, _xla_ref_deep)
        from nerfsafetyvalidation_tpu.ops.freq_encoding import freq_encode
        x, sh, sn, cn = self._nets()

        def loss_f(sn, cn, x):
            s, rgb = fused_points_sigma_color(x, sh, sn, cn, 12,
                                              compute_dtype=jnp.float32)
            return jnp.sum(jnp.log1p(s)) + jnp.sum(rgb ** 2)

        def loss_r(sn, cn, x):
            s, rgb = _xla_ref_deep(freq_encode(x, 12), sh, tuple(sn),
                                   tuple(cn), jnp.float32)
            return jnp.sum(jnp.log1p(s)) + jnp.sum(rgb ** 2)

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(sn, cn, x)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(sn, cn, x)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-3)
