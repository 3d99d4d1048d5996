"""Mip-fold position encoding — the flagship TPU-native field representation.

Role in the framework: the reference's multires hash grid (gridencoder/src/
gridencoder.cu) costs L*2^D random HBM rows per sample (L=16, 2^D=8 -> 128
rows); on TPU the HBM gather unit is a serial ~40M rows/s resource
(BENCH_NOTES.md "the gather wall"), so rows-per-sample — not FLOPs — set the
render ceiling. This encoder is a redesign of the same idea (multiresolution
features, dense-until-budget then hashed) around that constraint:

  * DENSE part: a Laplacian-pyramid-parameterized feature volume. The
    trainable parameters are coarse grids G_s [(s+1)^3, c] for s in
    pyramid_scales (16/32/64/128 by default — the same scales the reference
    stores as separate hash-grid levels); the field is their trilinear
    UPSAMPLE to the finest dense scale F, concatenated channel-wise. Because
    upsampling is dense compute (no gathers) the multiresolution prior of
    NGP (coarse levels receive gradients from wide regions) is kept for
    free, corners stay tied (C0 continuity), and the materialized volume
    P [(F+1)^3, Cd] folds EXACTLY into one [F^3, 8*Cd] cell row for
    inference — 1 row per sample for every scale <= F.

  * HASH part: the levels finer than F (256..2048) collapse into ONE
    hash-fold table [2^log2, n_mip * 8 * c]: the row keyed by the FINEST
    level's cell stores, for each mip level, the 8 corner features of that
    level's enclosing cell (well-defined because power-of-two scales nest).
    Each level is still interpolated with its OWN fractional coordinate, so
    intermediate scales keep their smoothness within the key cell; hash
    collisions alias whole multi-level corner tuples (coarser-grained
    collision structure than the reference's independent per-level
    collisions — the train->PSNR gate in bench.py validates the tradeoff).
    1 row per sample, trained DIRECTLY in this layout (1-row backward
    scatter), identical train/inference semantics.

Cost per sample: 2 gather rows at inference (vs 128 reference-layout / 16
cell-layout), 9 at training (8 tied dense corners + 1 hash row).
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .hash_encoding import _PRIMES, _corner_bits


@dataclass(frozen=True)
class MipFoldSpec:
    """Static description (hashable for jit closures)."""

    pyramid_scales: Tuple[int, ...] = (16, 32, 64, 128)
    pyramid_channels: int = 4          # channels per pyramid scale
    mip_scales: Tuple[int, ...] = (256, 512, 1024, 2048)
    mip_channels: int = 4              # channels per mip level
    log2_hashmap_size: int = 19
    # fold_scale > 0 materializes/folds/encodes the dense part at this
    # REDUCED resolution (exact strided grid-point sampling of the finer
    # pyramid grids): the O(F^3) fold-build term shrinks cubically. A
    # training-warmup approximation knob (progressive fold resolution,
    # trainer opt.fold_warmup_scale) — the parameter pytree is identical,
    # so the same params serve both scales.
    fold_scale: int = 0

    @property
    def F(self) -> int:
        return self.fold_scale or self.pyramid_scales[-1]

    @property
    def F_native(self) -> int:
        return self.pyramid_scales[-1]

    @property
    def dense_channels(self) -> int:
        return len(self.pyramid_scales) * self.pyramid_channels

    @property
    def hash_rows(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def hash_width(self) -> int:
        return len(self.mip_scales) * 8 * self.mip_channels

    @property
    def output_dim(self) -> int:
        return self.dense_channels + len(self.mip_scales) * self.mip_channels

    @property
    def n_params(self) -> int:
        n = sum((s + 1) ** 3 for s in self.pyramid_scales) * self.pyramid_channels
        return n + self.hash_rows * self.hash_width

    def validate(self):
        for a, b in zip(self.pyramid_scales, self.pyramid_scales[1:]):
            if b % a:
                raise ValueError("pyramid scales must nest (each divides the next)")
        for s in self.mip_scales:
            if s % self.mip_scales[-1] and self.mip_scales[-1] % s:
                raise ValueError("mip scales must nest")
            if s <= self.F_native:
                raise ValueError("mip scales must exceed the dense scale")
        if self.fold_scale:
            for s in self.pyramid_scales:
                if s % self.fold_scale and self.fold_scale % s:
                    raise ValueError("fold_scale must nest with every "
                                     "pyramid scale")
            if self.fold_scale > self.F_native:
                raise ValueError("fold_scale cannot exceed the native "
                                 "dense scale")


def mip_fold_init(key, spec: MipFoldSpec, std: float = 1e-4):
    """Uniform(-std, std) init (matches the reference table init,
    grid.py:133-135) for the pyramid grids and the hash-fold table."""
    spec.validate()
    keys = jax.random.split(key, len(spec.pyramid_scales) + 1)
    pyramid = [
        jax.random.uniform(k, ((s + 1) ** 3, spec.pyramid_channels),
                           minval=-std, maxval=std)
        for k, s in zip(keys[:-1], spec.pyramid_scales)
    ]
    hash_table = jax.random.uniform(
        keys[-1], (spec.hash_rows, spec.hash_width), minval=-std, maxval=std)
    return {"pyramid": pyramid, "hash": hash_table}


def _upsample_axis(v, factor: int, axis: int):
    """Linear interpolation upsample of grid-POINT samples along one axis:
    (n+1) points -> (n*factor + 1) points."""
    if factor == 1:
        return v
    n = v.shape[axis] - 1
    lo = jnp.take(v, jnp.arange(n), axis=axis)
    hi = jnp.take(v, jnp.arange(1, n + 1), axis=axis)
    # [n, factor] interleave: lo*(1-w) + hi*w, then append the last point
    lo_e = jnp.expand_dims(lo, axis + 1)
    hi_e = jnp.expand_dims(hi, axis + 1)
    w_e = (jnp.arange(factor, dtype=v.dtype) / factor).reshape(
        [1] * (axis + 1) + [factor] + [1] * (v.ndim - 1 - axis))
    seg = lo_e * (1 - w_e) + hi_e * w_e                  # [..., n, factor, ...]
    new_shape = list(v.shape)
    new_shape[axis] = n * factor
    seg = seg.reshape(new_shape)
    last = jnp.take(v, jnp.asarray([n]), axis=axis)
    return jnp.concatenate([seg, last], axis=axis)


def materialize_dense(params, spec: MipFoldSpec, dtype=None):
    """Upsample + concat the pyramid into P [(F+1)^3, Cd]. Dense compute —
    autodiff through this is the (cheap) backward path that gives coarse
    grids their wide-support gradients."""
    F = spec.F
    outs = []
    for g, s in zip(params["pyramid"], spec.pyramid_scales):
        v = g.reshape(s + 1, s + 1, s + 1, spec.pyramid_channels)
        if s <= F:
            f = F // s
            v = _upsample_axis(v, f, 0)
            v = _upsample_axis(v, f, 1)
            v = _upsample_axis(v, f, 2)
        else:
            # reduced fold_scale: EXACT strided grid-point sampling of the
            # finer grid ((s+1) points -> every (s//F)th -> F+1 points)
            k = s // F
            v = v[::k, ::k, ::k]
        outs.append(v)
    P = jnp.concatenate(outs, axis=-1)
    if dtype is not None:
        P = P.astype(dtype)
    return P.reshape((F + 1) ** 3, spec.dense_channels)


def _hash_rows_for(cell, spec: MipFoldSpec):
    """fast_hash (gridencoder.cu:36-51) of the finest-level cell coord."""
    idx = jnp.zeros(cell.shape[:-1], dtype=jnp.uint32)
    for d in range(3):
        idx = idx ^ (cell[..., d].astype(jnp.uint32) * np.uint32(_PRIMES[d]))
    return (idx % np.uint32(spec.hash_rows)).astype(jnp.int32)


def _blend_weights(frac):
    """[N, 3] frac -> [N, 8] trilinear corner weights."""
    bits_f = _corner_bits(3).astype(np.float32)
    return jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                              frac[:, None, :], 1.0 - frac[:, None, :]),
                    axis=-1)


def _dense_corner_fetch(dense_table, ci, F, Cd, mode):
    """Fetch the 8 trilinear corner feature rows for cells ci [N, 3] from
    the grid-point table [(F+1)^3, Cd] -> [N, 8, Cd] in _corner_bits order
    (x fastest). All modes are numerically identical; they differ in how
    many gather rows the HBM gather engine is issued per sample:

      corner8  8 single-row takes (one per corner)
      pair     4 lax.gather rows of slice (1,1,2): z-adjacent corner pairs
               are CONTIGUOUS in the table
      quad     2 rows of slice (1,2,2): the (y,z) face per x corner
      cube     1 row of slice (2,2,2): the whole trilinear cube

    The winner on the real chip is recorded by scripts/bench_gather.py
    section H; NetworkConfig.train_gather selects it."""
    if mode == "corner8":
        bits = _corner_bits(3).astype(np.int32)
        corner = ci[:, None, :] + jnp.asarray(bits)[None]  # [N, 8, 3]
        rows = (corner[..., 0] * (F + 1) + corner[..., 1]) * (F + 1) \
            + corner[..., 2]
        return jnp.take(dense_table, rows, axis=0)         # [N, 8, Cd]

    from jax import lax
    N = ci.shape[0]
    t4 = dense_table.reshape(F + 1, F + 1, F + 1, Cd)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))

    def g(starts, sizes):
        return lax.gather(t4, starts, dnums, tuple(sizes) + (Cd,),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    if mode == "pair":
        # starts: the 4 (x, y) corners at z0; each fetch spans (z0, z0+1)
        off = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                       np.int32)                            # x fastest
        starts = (ci[:, None, :] + jnp.asarray(off)[None]).reshape(N * 4, 3)
        out = g(starts, (1, 1, 2))                          # [4N,1,1,2,Cd]
        out = out.reshape(N, 4, 2, Cd)                      # [N, xy, z, Cd]
        # -> bits order idx = x + 2y + 4z: transpose to (z, xy)
        return out.transpose(0, 2, 1, 3).reshape(N, 8, Cd)
    if mode == "quad":
        off = np.array([[0, 0, 0], [1, 0, 0]], np.int32)
        starts = (ci[:, None, :] + jnp.asarray(off)[None]).reshape(N * 2, 3)
        out = g(starts, (1, 2, 2))                          # [2N,1,2,2,Cd]
        out = out.reshape(N, 2, 2, 2, Cd)                   # [N, x, y, z, Cd]
        return out.transpose(0, 3, 2, 1, 4).reshape(N, 8, Cd)
    if mode == "cube":
        out = g(ci, (2, 2, 2))                              # [N,2,2,2,Cd]
        return out.transpose(0, 3, 2, 1, 4).reshape(N, 8, Cd)
    raise ValueError(f"unknown dense gather mode {mode!r}")


def mip_fold_encode(params, x, spec: MipFoldSpec, bound: float = 1.0,
                    dense_table=None, fold_table=None, compute_dtype=None,
                    train_gather: str = "corner8"):
    """Encode positions x [..., 3] in [-bound, bound] -> [..., output_dim].

    Training path: pass nothing extra — the dense volume is materialized
    from the pyramid (8 corner rows + 1 hash row per sample; train_gather
    picks the corner-fetch strategy, see _dense_corner_fetch; "foldrow"
    instead folds the volume in-graph and fetches ONE wide row).
    Inference path: pass fold_table (from build_mip_fold_table) — 1 dense
    row + 1 hash row per sample.
    """
    prefix = x.shape[:-1]
    x = x.reshape(-1, 3)
    F = spec.F
    S = spec.mip_scales[-1]
    Cd = spec.dense_channels
    Cm = spec.mip_channels

    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)

    # ----- dense part
    pos = u * np.float32(F)
    cell = jnp.clip(jnp.floor(pos), 0.0, F - 1.0)
    frac = pos - cell
    ci = cell.astype(jnp.int32)
    w8 = _blend_weights(frac)
    if fold_table is None and train_gather in ("foldrow", "foldrow_pallas"):
        # differentiable in-graph fold: build_mip_fold_table is pure
        # slicing/stacking of the materialized volume (zero gathers), and
        # the per-sample fetch becomes ONE wide row instead of 8 corners.
        # "foldrow_pallas" builds the same table with the copy-shaped
        # Pallas kernel (ops/pallas/fold_build.py) whose fwd+bwd run as
        # explicit block copies instead of XLA's slice-stack emission.
        dt = (compute_dtype if compute_dtype is not None
              else params["pyramid"][0].dtype)
        if train_gather == "foldrow_pallas":
            from .pallas.fold_build import fold_build_pallas
            P = materialize_dense(params, spec, dtype=dt)
            fold_table = fold_build_pallas(P, F, Cd)
        else:
            fold_table = build_mip_fold_table(params, spec, dtype=dt)
    if fold_table is not None:
        row = (ci[:, 0] * F + ci[:, 1]) * F + ci[:, 2]
        feats = jnp.take(fold_table, row, axis=0)          # [N, 8*Cd]
        feats = feats.reshape(-1, 8, Cd)
        dense_out = jnp.sum(w8[..., None].astype(feats.dtype) * feats, axis=1)
    else:
        if dense_table is None:
            dense_table = materialize_dense(params, spec, dtype=compute_dtype)
        feats = _dense_corner_fetch(dense_table, ci, F, Cd,
                                    train_gather)          # [N, 8, Cd]
        dense_out = jnp.sum(w8[..., None].astype(feats.dtype) * feats, axis=1)

    # ----- hash-fold part: one row keyed by the finest-level cell
    pos_s = u * np.float32(S)
    cell_s = jnp.clip(jnp.floor(pos_s), 0.0, S - 1.0).astype(jnp.int32)
    hrow = _hash_rows_for(cell_s, spec)
    htab = params["hash"]
    if compute_dtype is not None:
        htab = htab.astype(compute_dtype)
    hfeat = jnp.take(htab, hrow, axis=0)                   # [N, nm*8*Cm]
    hfeat = hfeat.reshape(-1, len(spec.mip_scales), 8, Cm)
    mip_outs = []
    for li, s in enumerate(spec.mip_scales):
        # level cell = key cell >> delta (power-of-two nesting); frac from
        # the level's own coordinate keeps each scale's smoothness
        delta = int(np.log2(S // s))
        pos_l = u * np.float32(s)
        cell_l = (cell_s >> delta).astype(jnp.float32)
        frac_l = jnp.clip(pos_l - cell_l, 0.0, 1.0)
        w = _blend_weights(frac_l)                          # [N, 8]
        lvl = jnp.sum(w[..., None].astype(hfeat.dtype) * hfeat[:, li], axis=1)
        mip_outs.append(lvl)

    out = jnp.concatenate([dense_out] + mip_outs, axis=-1)
    out = jnp.where(oob[:, None], jnp.zeros_like(out), out)
    return out.reshape(prefix + (spec.output_dim,))


def build_mip_fold_table(params, spec: MipFoldSpec, dtype=jnp.bfloat16):
    """Fold the materialized dense volume into cell rows [F^3, 8*Cd]
    (exact: P is piecewise trilinear on the F grid). One-time, at
    checkpoint load / grid refresh."""
    F = spec.F
    Cd = spec.dense_channels
    P = materialize_dense(params, spec, dtype=dtype)
    V = P.reshape(F + 1, F + 1, F + 1, Cd)
    bits = _corner_bits(3).astype(int)
    corners = [V[bx:bx + F, by:by + F, bz:bz + F] for bx, by, bz in bits]
    fold = jnp.stack(corners, axis=3)                      # [F,F,F,8,Cd]
    return fold.reshape(F ** 3, 8 * Cd)
