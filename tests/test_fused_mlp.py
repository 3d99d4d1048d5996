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
