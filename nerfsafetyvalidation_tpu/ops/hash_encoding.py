"""Multiresolution hash-grid encoding (Instant-NGP style).

Parity target: reference gridencoder/ (gridencoder/src/gridencoder.cu +
gridencoder/grid.py). Semantics reproduced exactly:

  * per-level resolution: scale = 2^(level*S) * H - 1, res = ceil(scale)+1
    (gridencoder.cu:126-127, with S = log2(per_level_scale), H = base res)
  * per-level table size: min(2^log2_hashmap_size, (res [+1])^D) rounded up
    to a multiple of 8 (grid.py:116-121)
  * dense index accumulates dim strides only while stride <= hashmap_size;
    'hash' levels whose dense stride overflows use the prime-XOR fast_hash
    (gridencoder.cu:54-72, fast_hash :36-51); 'tiled' levels never hash
  * coords outside [0, 1] produce zero features (gridencoder.cu:98-123)
  * output is level-major per point: [N, L*C] (grid.py:52)

TPU design: everything is dense and fixed-shape. The level loop is unrolled
at trace time (all per-level constants are static Python ints), each level
is 2^D gathers + an FMA blend on the VPU. The backward pass is jax autodiff:
the VJP of the gather is a deterministic scatter-add into the table, which
replaces the reference's non-deterministic __half2 atomicAdd scatter
(gridencoder.cu:227-314) — a fidelity improvement, not a loss.
"""

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# fast_hash primes (gridencoder.cu:42); index 0 is 1 for memory coherence.
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a multires hash grid (hashable for jit closure)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    gridtype: str = "hash"  # 'hash' | 'tiled'
    align_corners: bool = False
    # derived, filled by make()
    scales: Tuple[float, ...] = field(default=())
    resolutions: Tuple[int, ...] = field(default=())
    offsets: Tuple[int, ...] = field(default=())
    sizes: Tuple[int, ...] = field(default=())
    use_hash: Tuple[bool, ...] = field(default=())
    strides: Tuple[Tuple[int, ...], ...] = field(default=())

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def n_params(self) -> int:
        return self.offsets[-1] * self.level_dim

    @staticmethod
    def make(input_dim=3, num_levels=16, level_dim=2, per_level_scale=2.0,
             base_resolution=16, log2_hashmap_size=19, desired_resolution=None,
             gridtype="hash", align_corners=False) -> "HashGridSpec":
        if desired_resolution is not None:
            per_level_scale = float(np.exp2(
                np.log2(desired_resolution / base_resolution) / (num_levels - 1)))
        S = np.log2(per_level_scale)
        max_params = 2 ** log2_hashmap_size
        scales, resolutions, offsets, sizes, use_hash, strides = [], [], [], [], [], []
        offset = 0
        for lvl in range(num_levels):
            # exact float32 semantics of exp2f(level*S)*H - 1 (gridencoder.cu:126)
            scale = float(np.float32(np.exp2(np.float32(lvl * S))) * np.float32(base_resolution)
                          - np.float32(1.0))
            res = int(np.ceil(scale)) + 1
            params_in_level = min(max_params,
                                  (res if align_corners else res + 1) ** input_dim)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)
            # dense strides, truncated like get_grid_index (gridencoder.cu:59-63)
            stride = 1
            lvl_strides = []
            for _ in range(input_dim):
                lvl_strides.append(stride if stride <= params_in_level else 0)
                stride *= res if align_corners else (res + 1)
            scales.append(scale)
            resolutions.append(res)
            offsets.append(offset)
            sizes.append(params_in_level)
            use_hash.append(gridtype == "hash" and stride > params_in_level)
            strides.append(tuple(lvl_strides))
            offset += params_in_level
        offsets.append(offset)
        return HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            per_level_scale=per_level_scale, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size, gridtype=gridtype,
            align_corners=align_corners, scales=tuple(scales),
            resolutions=tuple(resolutions), offsets=tuple(offsets),
            sizes=tuple(sizes), use_hash=tuple(use_hash), strides=tuple(strides))


def hash_grid_init(key, spec: HashGridSpec, std: float = 1e-4, dtype=jnp.float32):
    """Uniform(-std, std) table init (grid.py:133-135)."""
    total = spec.offsets[-1]
    return jax.random.uniform(key, (total, spec.level_dim), dtype=dtype,
                              minval=-std, maxval=std)


def _corner_bits(input_dim: int) -> np.ndarray:
    idx = np.arange(2 ** input_dim, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(input_dim, dtype=np.uint32)[None, :]) & 1)


def _level_rows(spec: HashGridSpec, lvl: int, corner_grid):
    """Table row (incl. level offset) for each corner. corner_grid: [N, 2^D, D] uint32."""
    size = np.uint32(spec.sizes[lvl])
    if spec.use_hash[lvl]:
        index = jnp.zeros(corner_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            index = index ^ (corner_grid[..., d] * np.uint32(_PRIMES[d]))
    else:
        index = jnp.zeros(corner_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            s = spec.strides[lvl][d]
            if s:
                index = index + corner_grid[..., d] * np.uint32(s)
    return (index % size).astype(jnp.int32) + np.int32(spec.offsets[lvl])


def hash_grid_encode(embeddings, x, spec: HashGridSpec, bound: float = 1.0):
    """Encode positions.

    embeddings: [total_params, C] table; x: [..., D] in [-bound, bound].
    Returns [..., L*C] with level-major features.
    """
    prefix = x.shape[:-1]
    x = x.reshape(-1, spec.input_dim)
    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)  # [N]
    bits = _corner_bits(spec.input_dim)  # [2^D, D] uint32 (static)
    bits_f = bits.astype(np.float32)

    outs = []
    for lvl in range(spec.num_levels):
        scale = np.float32(spec.scales[lvl])
        pos = u * scale + (0.0 if spec.align_corners else np.float32(0.5))
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor  # [N, D]
        pos_grid = pos_floor.astype(jnp.uint32)  # [N, D]
        corner_grid = pos_grid[:, None, :] + jnp.asarray(bits)[None, :, :]  # [N, 2^D, D]
        # trilinear weights: prod_d (bit ? frac : 1-frac)
        w = jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                               frac[:, None, :], 1.0 - frac[:, None, :]), axis=-1)  # [N, 2^D]
        rows = _level_rows(spec, lvl, corner_grid)  # [N, 2^D]
        feats = jnp.take(embeddings, rows, axis=0)  # [N, 2^D, C]
        out = jnp.sum(w[..., None].astype(feats.dtype) * feats, axis=1)  # [N, C]
        outs.append(out)
    out = jnp.concatenate(outs, axis=-1)  # [N, L*C]
    out = jnp.where(oob[:, None], jnp.zeros_like(out), out)
    return out.reshape(prefix + (spec.output_dim,))
