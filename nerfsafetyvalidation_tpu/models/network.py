"""Instant-NGP-style NeRF network, functional JAX implementation.

Parity target: reference nerf/network.py (`NeRFNetwork`) — the default
backbone used by every entry point:

  sigma path: hash-grid encode (32-d) -> 2-layer bias-free 64-wide MLP ->
              (trunc_exp(sigma), 15-d geo_feat)        (network.py:95-124)
  color path: SH(dir, deg 4) 16-d ++ geo_feat 15-d -> 3-layer bias-free
              64-wide MLP -> sigmoid rgb               (network.py:113-122)
  background: 2-D hash grid at sphere(bg_radius) ++ SH -> 2-layer MLP
              (network.py:71-92, :145-160)

The fused 'network_ff' variant in the reference (ffmlp WMMA kernels) is the
SAME architecture jitted in bfloat16 here — XLA fuses encode+MLP+activation
into MXU matmuls; a dedicated Pallas megakernel is layered on separately
(ops/pallas). `network_tcnn` (external tiny-cuda-nn) maps onto the same
module as well.

Params are plain pytrees (lists of [in, out] matrices) so UQ code can
flat-pack/unpack the sigma-net (bayesian_laplace.py:113-123 equivalent) with
jax.flatten_util.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import NetworkConfig
from ..ops.activation import trunc_exp
from ..ops.hash_encoding import (HashGridSpec, hash_grid_init,
                                 hash_grid_encode, hash_grid_encode_cell,
                                 build_cell_table)
from ..ops.sh_encoding import sh_encode, sh_output_dim
from ..ops.freq_encoding import freq_encode, freq_output_dim


def _linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default weight init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / np.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype=dtype,
                              minval=-bound, maxval=bound)


def _mlp(params, h, dtype, fused=False):
    """Bias-free MLP with ReLU between layers (network.py:101-106).
    fused=True routes through the pallas fully-fused kernel (ffmlp analog,
    ops/pallas/fused_mlp.py) — one kernel per batch tile, activations in
    VMEM."""
    if fused:
        from ..ops.pallas.fused_mlp import fused_mlp
        prefix = h.shape[:-1]
        out = fused_mlp(h.reshape(-1, h.shape[-1]), params,
                        compute_dtype=dtype)
        return out.reshape(prefix + (out.shape[-1],))
    n = len(params)
    for i, W in enumerate(params):
        h = jnp.dot(h.astype(dtype), W.astype(dtype),
                    preferred_element_type=jnp.float32)
        if i != n - 1:
            h = jax.nn.relu(h)
    return h


class NeRFNetwork:
    """Functional module: hyper-params are static, params are a pytree.

    Usage:
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        sigma, color = net.apply(params, x, d)
        out = net.density(params, x)   # {'sigma': [N], 'geo_feat': [N, 15]}
    """

    def __init__(self, cfg: NetworkConfig):
        self.cfg = cfg

        # position encoder (get_encoder dispatch, encoding.py:45-77)
        if cfg.encoding in ("hashgrid", "tiledgrid"):
            self.grid_spec = HashGridSpec.make(
                input_dim=3, num_levels=cfg.num_levels, level_dim=cfg.level_dim,
                base_resolution=cfg.base_resolution,
                log2_hashmap_size=cfg.log2_hashmap_size,
                desired_resolution=cfg.grid_resolution,
                gridtype="hash" if cfg.encoding == "hashgrid" else "tiled",
                align_corners=cfg.align_corners,
                aligned=getattr(cfg, "aligned_levels", False))
            self.in_dim = self.grid_spec.output_dim
        elif cfg.encoding == "frequency":
            self.grid_spec = None
            self.in_dim = freq_output_dim(3, cfg.multires)
        elif cfg.encoding == "None":
            self.grid_spec = None
            self.in_dim = 3
        else:
            raise NotImplementedError(f"encoding {cfg.encoding!r}")

        # direction encoder
        if cfg.encoding_dir == "sphere_harmonics":
            self.in_dim_dir = sh_output_dim(cfg.sh_degree)
        elif cfg.encoding_dir == "frequency":
            self.in_dim_dir = freq_output_dim(3, cfg.multires)
        elif cfg.encoding_dir == "None":
            self.in_dim_dir = 3
        else:
            raise NotImplementedError(f"encoding_dir {cfg.encoding_dir!r}")

        # background encoder (network.py:74: 2-D grid, 4 levels, res 2048)
        if cfg.bg_radius > 0:
            self.bg_spec = HashGridSpec.make(
                input_dim=2, num_levels=4, level_dim=cfg.level_dim,
                base_resolution=cfg.base_resolution,
                log2_hashmap_size=19, desired_resolution=2048,
                gridtype="hash", align_corners=cfg.align_corners)
            self.in_dim_bg = self.bg_spec.output_dim
        else:
            self.bg_spec = None
            self.in_dim_bg = 0

        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32

    # ---------------------------------------------------------------- init
    def init(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 16)
        params = {}
        ki = 0
        if self.grid_spec is not None:
            params["encoder"] = {"embeddings": hash_grid_init(keys[ki], self.grid_spec)}
            ki += 1

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
            out_dim = 3 if layer == cfg.num_layers_color - 1 else cfg.hidden_dim_color
            color_net.append(_linear_init(keys[ki], in_dim, out_dim))
            ki += 1
        params["color_net"] = color_net

        if cfg.bg_radius > 0:
            params["encoder_bg"] = {"embeddings": hash_grid_init(keys[ki], self.bg_spec)}
            ki += 1
            bg_net = []
            for layer in range(cfg.num_layers_bg):
                in_dim = (self.in_dim_bg + self.in_dim_dir) if layer == 0 \
                    else cfg.hidden_dim_bg
                out_dim = 3 if layer == cfg.num_layers_bg - 1 else cfg.hidden_dim_bg
                bg_net.append(_linear_init(keys[ki], in_dim, out_dim))
                ki += 1
            params["bg_net"] = bg_net
        return params

    # ------------------------------------------------------------ encoders
    def to_cell(self, params):
        """Return params augmented with the cell-layout table for the fast
        inference path (one row-gather per point per level; see
        ops/hash_encoding.build_cell_table)."""
        if self.grid_spec is None:
            return params
        out = dict(params)
        enc = dict(params["encoder"])
        enc["cell_table"] = build_cell_table(
            params["encoder"]["embeddings"].astype(self.compute_dtype),
            self.grid_spec)
        out["encoder"] = enc
        return out

    def to_folded(self, params):
        """Return params augmented with the folded-table fast-inference
        layout (aligned specs only): ONE row gather covers every level with
        scale <= cfg.fold_max_scale, one cell row per finer level. Exact —
        see ops/hash_encoding.build_folded_table."""
        from ..ops.hash_encoding import (build_folded_table,
                                         build_hashed_cell_table,
                                         default_fold_levels)
        if self.grid_spec is None or not self.grid_spec.aligned:
            raise ValueError("to_folded needs cfg.aligned_levels=True")
        n_fold = default_fold_levels(self.grid_spec, self.cfg.fold_max_scale)
        emb = params["encoder"]["embeddings"].astype(self.compute_dtype)
        out = dict(params)
        enc = dict(params["encoder"])
        enc["fold_table"] = build_folded_table(emb, self.grid_spec, n_fold)
        enc["hash_cell_table"] = build_hashed_cell_table(
            emb, self.grid_spec, n_fold)
        out["encoder"] = enc
        return out

    def encode_pos(self, params, x):
        cfg = self.cfg
        if self.grid_spec is not None:
            enc = params.get("encoder", {})
            if "fold_table" in enc:
                from ..ops.hash_encoding import (hash_grid_encode_folded,
                                                 default_fold_levels)
                n_fold = default_fold_levels(self.grid_spec,
                                             cfg.fold_max_scale)
                return hash_grid_encode_folded(
                    enc["fold_table"].astype(self.compute_dtype),
                    enc["hash_cell_table"].astype(self.compute_dtype),
                    x, self.grid_spec, n_fold, bound=cfg.bound,
                    max_level=cfg.max_level)
            if "cell_table" in params.get("encoder", {}):
                tbl = params["encoder"]["cell_table"].astype(self.compute_dtype)
                return hash_grid_encode_cell(tbl, x, self.grid_spec,
                                             bound=cfg.bound,
                                             max_level=cfg.max_level)
            # cast the table to the compute dtype before the gather: halves the
            # HBM bytes of the random-access corner fetches (the hot memory
            # pattern), mirroring the reference's fp16-table autocast
            # (grid.py:36-39)
            emb = params["encoder"]["embeddings"].astype(self.compute_dtype)
            return hash_grid_encode(emb, x, self.grid_spec, bound=cfg.bound,
                                    max_level=cfg.max_level)
        if cfg.encoding == "frequency":
            return freq_encode(x, cfg.multires)
        return x

    def encode_dir(self, d):
        cfg = self.cfg
        if cfg.encoding_dir == "sphere_harmonics":
            return sh_encode(d, cfg.sh_degree)
        if cfg.encoding_dir == "frequency":
            return freq_encode(d, cfg.multires)
        return d

    # ------------------------------------------------------------- queries
    def density(self, params, x):
        """x: [..., 3] in [-bound, bound] -> {'sigma': [...], 'geo_feat': [..., G]}
        (network.py:126-143)."""
        h = self.encode_pos(params, x)
        # the per-net fused kernel requires FFMLP-style %16 input lanes
        # (ffmlp.py:112-121); frequency encodes (e.g. 75 lanes) use the
        # XLA chain here and the deep megakernel in apply()
        h = _mlp(params["sigma_net"], h, self.compute_dtype,
                 fused=self.cfg.fused and self.grid_spec is not None)
        sigma = trunc_exp(h[..., 0].astype(jnp.float32))
        geo_feat = h[..., 1:]
        return {"sigma": sigma, "geo_feat": geo_feat}

    def color(self, params, x, d, geo_feat=None, mask=None, **kwargs):
        """Masked color query (network.py:163-191). On TPU the mask zeroes
        outputs instead of compacting — shapes stay static; the masked
        entries were never used by the composite anyway (weights <= 1e-4)."""
        d_enc = self.encode_dir(d)
        h = jnp.concatenate([d_enc, geo_feat.astype(d_enc.dtype)], axis=-1)
        h = _mlp(params["color_net"], h, self.compute_dtype,
                 fused=self.cfg.fused and self.grid_spec is not None)
        rgb = jax.nn.sigmoid(h.astype(jnp.float32))
        if mask is not None:
            rgb = jnp.where(mask[..., None], rgb, 0.0)
        return rgb

    def apply(self, params, x, d):
        """Full forward (network.py:95-124): returns (sigma [N], color [N, 3]).

        With cfg.fused on a frequency-encoded net (the distilled student,
        models/bake.py) the whole sigma+color chain runs as ONE pallas
        kernel (ops/pallas/render_mlp.py fused_sigma_color_deep) — for a
        256-wide 6-layer student the unfused chain's inter-layer HBM
        activation traffic is ~30x the fused kernel's I/O."""
        cfg = self.cfg
        if cfg.fused and cfg.encoding == "frequency":
            # points-in megakernel: the frequency encoding itself is
            # computed inside the kernel (ops/pallas/render_mlp.py
            # fused_points_sigma_color), so HBM sees x/sh/out only
            from ..ops.pallas.render_mlp import fused_points_sigma_color
            prefix = x.shape[:-1]
            xf = x.reshape((int(np.prod(prefix)) if prefix else 1, -1))
            sh = self.encode_dir(d).reshape(xf.shape[0], -1)
            sigma, rgb = fused_points_sigma_color(
                xf, sh, params["sigma_net"], params["color_net"],
                cfg.multires, compute_dtype=self.compute_dtype)
            return sigma.reshape(prefix), rgb.reshape(prefix + (3,))
        out = self.density(params, x)
        rgb = self.color(params, x, d, geo_feat=out["geo_feat"])
        return out["sigma"], rgb

    __call__ = apply

    def background(self, params, sph, d):
        """sph: [N, 2] in [-1, 1]; d: [N, 3] (network.py:145-160)."""
        h = hash_grid_encode(params["encoder_bg"]["embeddings"], sph,
                             self.bg_spec, bound=1.0)
        d_enc = self.encode_dir(d)
        h = jnp.concatenate([d_enc, h.astype(d_enc.dtype)], axis=-1)
        h = _mlp(params["bg_net"], h, self.compute_dtype)
        return jax.nn.sigmoid(h.astype(jnp.float32))

    # --------------------------------------------------- sigma-net flatpack
    # (UQ's Bayesian-Laplace needs flat get/set of sigma-net params,
    #  bayesian_laplace.py:113-123)
    def get_sigma_net_flat(self, params):
        # torch stores Linear weights [out, in]; the reference flattens in
        # that layout, so transpose for layout-compatible vectors.
        return jnp.concatenate([w.T.reshape(-1) for w in params["sigma_net"]])

    def set_sigma_net_flat(self, params, flat):
        new, start = [], 0
        for w in params["sigma_net"]:
            n = w.size
            new.append(flat[start:start + n].reshape(w.shape[::-1]).T)
            start += n
        out = dict(params)
        out["sigma_net"] = new
        return out
