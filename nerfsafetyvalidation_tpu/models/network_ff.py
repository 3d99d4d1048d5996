"""Fully-fused-MLP backbone variant.

Parity target: reference nerf/network_ff.py — the same NeRF as
nerf/network.py but with FFMLP fused kernels, which changes the topology:
FFMLP's `num_layers` counts HIDDEN layers, so each net gains one extra
hidden matmul vs network.py (ffmlp.py:119-121: matmuls = in->h,
(num_layers-1) x h->h, h->out_padded), and the color input is manually
padded to 32 = SH16 + geo15 + 1 (network_ff.py:42, :67-68).

On TPU the fused execution is the pallas kernel in ops/pallas/fused_mlp.py
(activations VMEM-resident, one kernel per batch tile); bf16 replaces the
reference's fp16 (validate.py:120-122 forces fp16 off for --ff; bf16 is the
TPU-correct equivalent). The FFMLP flat-packed .pth weight layout is not
convertible without a CUDA build to verify against; --ff checkpoints train
natively here instead.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..config import NetworkConfig
from .network import NeRFNetwork, _linear_init, _mlp
from ..ops.activation import trunc_exp


class NeRFNetworkFF(NeRFNetwork):
    def __init__(self, cfg: NetworkConfig):
        if cfg.bg_radius > 0:
            raise AssertionError(
                "background model is not implemented for --ff")
        cfg = dataclasses.replace(cfg, fused=True, compute_dtype="bfloat16")
        super().__init__(cfg)
        # color input manually padded to 32 (network_ff.py:42)
        self.in_dim_color = self.in_dim_dir + cfg.geo_feat_dim + 1

    def init(self, key):
        cfg = self.cfg
        params = super().init(key)
        keys = jax.random.split(key, 8)
        # FFMLP topology: one extra hidden matmul per net (ffmlp.py:119-121)
        params["sigma_net"] = [
            _linear_init(keys[0], self.in_dim, cfg.hidden_dim),
            _linear_init(keys[1], cfg.hidden_dim, cfg.hidden_dim),
            _linear_init(keys[2], cfg.hidden_dim, 1 + cfg.geo_feat_dim),
        ]
        params["color_net"] = [
            _linear_init(keys[3], self.in_dim_color, cfg.hidden_dim_color),
            _linear_init(keys[4], cfg.hidden_dim_color, cfg.hidden_dim_color),
            _linear_init(keys[5], cfg.hidden_dim_color, cfg.hidden_dim_color),
            _linear_init(keys[6], cfg.hidden_dim_color, 3),
        ]
        return params

    def color(self, params, x, d, geo_feat=None, mask=None, **kwargs):
        d_enc = self.encode_dir(d)
        h = jnp.concatenate([
            d_enc, geo_feat.astype(d_enc.dtype),
            jnp.zeros(geo_feat.shape[:-1] + (1,), dtype=d_enc.dtype),
        ], axis=-1)  # zero pad to 32 (network_ff.py:67-68)
        h = _mlp(params["color_net"], h, self.compute_dtype,
                 fused=self.cfg.fused)
        rgb = jax.nn.sigmoid(h.astype(jnp.float32))
        if mask is not None:
            rgb = jnp.where(mask[..., None], rgb, 0.0)
        return rgb
