"""tiny-cuda-nn backbone variant.

Parity target: reference nerf/network_tcnn.py — the same Instant-NGP NeRF
wired through tiny-cuda-nn. The observable architecture differences from
nerf/network.py (and therefore from our NeRFNetwork) that this module
reproduces:

  * the sigma and color MLPs are plain torch MLPs WITH biases
    (network_tcnn.py:12-24 uses nn.Linear(bias=True), unlike network.py's
    bias=False FFMLP-compatible nets);
  * directions go through tcnn's SphericalHarmonics after the (d+1)/2
    remap (network_tcnn.py:100-101); tcnn internally maps [0,1] back to
    [-1,1], so the composition equals sh_encode(d) — kept explicit here for
    documentation;
  * no background network (bg_radius unsupported, network_tcnn.py has no
    bg branch).

The hash-grid itself is identical semantics (gridencoder is torch-ngp's
port of tcnn's grid; per_level_scale = exp2(log2(2048*bound/16)/15),
network_tcnn.py:52), so the standard encoder + fast paths apply.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import NetworkConfig
from .network import NeRFNetwork, _linear_init


def _mlp_bias(layers, h, dtype):
    """MLP with biases and ReLU between layers (network_tcnn.py:12-30)."""
    n = len(layers)
    for i, layer in enumerate(layers):
        h = jnp.dot(h.astype(dtype), layer["w"].astype(dtype),
                    preferred_element_type=jnp.float32) \
            + layer["b"].astype(jnp.float32)
        if i != n - 1:
            h = jax.nn.relu(h)
    return h


class NeRFNetworkTCNN(NeRFNetwork):
    def __init__(self, cfg: NetworkConfig):
        if cfg.bg_radius > 0:
            raise ValueError("network_tcnn has no background branch "
                             "(reference network_tcnn.py)")
        super().__init__(cfg)

    def init(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 16)
        params = {}
        ki = 0
        if self.grid_spec is not None:
            from ..ops.hash_encoding import hash_grid_init
            params["encoder"] = {
                "embeddings": hash_grid_init(keys[ki], self.grid_spec)}
            ki += 1

        def linear(key, in_dim, out_dim):
            kw, kb = jax.random.split(key)
            bound = 1.0 / np.sqrt(in_dim)
            return {
                "w": _linear_init(kw, in_dim, out_dim),
                # torch nn.Linear bias init: U(-1/sqrt(in), 1/sqrt(in))
                "b": jax.random.uniform(kb, (out_dim,), minval=-bound,
                                        maxval=bound),
            }

        sigma_net = []
        for layer in range(cfg.num_layers):
            in_dim = self.in_dim if layer == 0 else cfg.hidden_dim
            out_dim = (1 + cfg.geo_feat_dim) if layer == cfg.num_layers - 1 \
                else cfg.hidden_dim
            sigma_net.append(linear(keys[ki], in_dim, out_dim))
            ki += 1
        params["sigma_net"] = sigma_net

        color_net = []
        for layer in range(cfg.num_layers_color):
            in_dim = (self.in_dim_dir + cfg.geo_feat_dim) if layer == 0 \
                else cfg.hidden_dim_color
            out_dim = 3 if layer == cfg.num_layers_color - 1 \
                else cfg.hidden_dim_color
            color_net.append(linear(keys[ki], in_dim, out_dim))
            ki += 1
        params["color_net"] = color_net
        return params

    # ------------------------------------------------------------- queries
    def density(self, params, x):
        from ..ops.activation import trunc_exp
        h = self.encode_pos(params, x)
        h = _mlp_bias(params["sigma_net"], h, self.compute_dtype)
        sigma = trunc_exp(h[..., 0].astype(jnp.float32))
        return {"sigma": sigma, "geo_feat": h[..., 1:]}

    def color(self, params, x, d, geo_feat=None, mask=None, **kwargs):
        # (d+1)/2 then tcnn's internal 2x-1 remap == sh_encode(d); spelled
        # out to mirror network_tcnn.py:100-101
        d01 = (d + 1.0) / 2.0
        d_enc = self.encode_dir(d01 * 2.0 - 1.0)
        h = jnp.concatenate([d_enc, geo_feat.astype(d_enc.dtype)], axis=-1)
        h = _mlp_bias(params["color_net"], h, self.compute_dtype)
        rgb = jax.nn.sigmoid(h.astype(jnp.float32))
        if mask is not None:
            rgb = jnp.where(mask[..., None], rgb, 0.0)
        return rgb

    # UQ flat-pack includes biases in torch's state-dict order (w then b)
    def get_sigma_net_flat(self, params):
        parts = []
        for layer in params["sigma_net"]:
            parts.append(layer["w"].T.reshape(-1))
            parts.append(layer["b"].reshape(-1))
        return jnp.concatenate(parts)

    def set_sigma_net_flat(self, params, flat):
        new, start = [], 0
        for layer in params["sigma_net"]:
            n = layer["w"].size
            w = flat[start:start + n].reshape(layer["w"].shape[::-1]).T
            start += n
            b = flat[start:start + layer["b"].size]
            start += layer["b"].size
            new.append({"w": w, "b": b})
        out = dict(params)
        out["sigma_net"] = new
        return out


NeRFNetwork = NeRFNetworkTCNN
