"""Flagship TPU backbone: mip-fold NGP.

Same renderer-facing API as NeRFNetwork (density/color/apply/background —
the reference nerf/network.py:95-191 contract) with the position encoder
replaced by ops/mip_encoding.MipFoldSpec: a pyramid-parameterized dense
volume + one hash-fold row, costing 2 HBM gather rows per sample at
inference and 9 at training instead of the reference layout's 128
(gridencoder.cu kernel_grid). This is the backbone bench.py measures; the
reference-semantics NeRFNetwork remains the checkpoint-conversion-compatible
backbone.

Select with NetworkConfig(encoding="mipfold").
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import NetworkConfig
from ..ops.mip_encoding import (MipFoldSpec, mip_fold_init, mip_fold_encode,
                                build_mip_fold_table, materialize_dense)
from .network import NeRFNetwork, _linear_init


class NeRFNetworkMip(NeRFNetwork):
    def __init__(self, cfg: NetworkConfig):
        # build the shared MLP/color/background scaffolding with a plain
        # spec, then swap in the mip-fold encoder
        scales = tuple(cfg.base_resolution * (2 ** i)
                       for i in range(cfg.num_levels))
        dense = tuple(s for s in scales if s <= cfg.fold_max_scale)
        mip = tuple(s for s in scales if s > cfg.fold_max_scale)
        if not dense or not mip:
            raise ValueError("mipfold needs scales on both sides of "
                             f"fold_max_scale (got {scales})")
        self.mip_spec = MipFoldSpec(
            pyramid_scales=dense, pyramid_channels=cfg.level_dim,
            mip_scales=mip, mip_channels=cfg.level_dim,
            log2_hashmap_size=cfg.log2_hashmap_size,
            fold_scale=getattr(cfg, "fold_scale", 0))
        self.mip_spec.validate()

        base_cfg = cfg if cfg.encoding != "mipfold" else \
            _replace_encoding(cfg)
        super().__init__(base_cfg)
        self.cfg = cfg
        self.grid_spec = None           # the hash-grid spec does not apply
        self.in_dim = self.mip_spec.output_dim

    # ---------------------------------------------------------------- init
    def init(self, key):
        cfg = self.cfg
        k_enc, k_rest = jax.random.split(key)
        params = {"encoder": mip_fold_init(k_enc, self.mip_spec)}

        keys = jax.random.split(k_rest, 16)
        ki = 0
        sigma_net = []
        for layer in range(cfg.num_layers):
            in_dim = self.in_dim if layer == 0 else cfg.hidden_dim
            out_dim = (1 + cfg.geo_feat_dim) if layer == cfg.num_layers - 1 \
                else cfg.hidden_dim
            sigma_net.append(_linear_init(keys[ki], in_dim, out_dim))
            ki += 1
        params["sigma_net"] = sigma_net

        color_net = []
        for layer in range(cfg.num_layers_color):
            in_dim = (self.in_dim_dir + cfg.geo_feat_dim) if layer == 0 \
                else cfg.hidden_dim_color
            out_dim = 3 if layer == cfg.num_layers_color - 1 \
                else cfg.hidden_dim_color
            color_net.append(_linear_init(keys[ki], in_dim, out_dim))
            ki += 1
        params["color_net"] = color_net
        return params

    # ------------------------------------------------------------- encoder
    def to_folded(self, params):
        """Augment params with the folded dense table (1-row inference)."""
        out = dict(params)
        enc = dict(params["encoder"])
        enc["fold_table"] = build_mip_fold_table(
            params["encoder"], self.mip_spec, dtype=self.compute_dtype)
        out["encoder"] = enc
        return out

    # cell layout does not apply to this backbone; folding is the fast path
    def to_cell(self, params):
        return self.to_folded(params)

    def encode_pos(self, params, x):
        enc = params["encoder"]
        return mip_fold_encode(
            enc, x, self.mip_spec, bound=self.cfg.bound,
            fold_table=enc.get("fold_table"),
            compute_dtype=self.compute_dtype,
            train_gather=getattr(self.cfg, "train_gather", "corner8"))

    def apply(self, params, x, d):
        """Full forward; with cfg.fused the two MLPs + activations run as
        ONE pallas kernel (ops/pallas/render_mlp.py — the reference's
        kernel_mlp_fused role, ffmlp.cu:332-409)."""
        if not self.cfg.fused:
            return super().apply(params, x, d)
        from ..ops.pallas.render_mlp import fused_sigma_color
        enc = self.encode_pos(params, x)
        sh = self.encode_dir(d)
        return fused_sigma_color(enc, sh, params["sigma_net"],
                                 params["color_net"],
                                 compute_dtype=self.compute_dtype)


def _replace_encoding(cfg):
    from dataclasses import replace
    return replace(cfg, encoding="hashgrid", aligned_levels=True)
