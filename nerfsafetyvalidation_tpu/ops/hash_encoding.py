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
    # TPU-aligned mode: per-level scales are EXACT powers of two of the base
    # (scale_l = base * 2^l, pos = u * scale), so every level's cell
    # boundaries nest inside the finer levels' — the property that makes the
    # folded-table encode (build_folded_table) exact. Reference specs keep
    # the exp2f(l*S)*H - 1 semantics (gridencoder.cu:126) and cannot fold.
    aligned: bool = False
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
             gridtype="hash", align_corners=False,
             aligned=False) -> "HashGridSpec":
        if aligned:
            return HashGridSpec._make_aligned(
                input_dim, num_levels, level_dim, base_resolution,
                log2_hashmap_size, gridtype)
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

    @staticmethod
    def _make_aligned(input_dim, num_levels, level_dim, base_resolution,
                      log2_hashmap_size, gridtype) -> "HashGridSpec":
        """TPU-aligned spec: scale_l = base * 2^l (exact), grid POINTS per
        axis = scale + 1 (align-corners layout, pos = u * scale). Level cell
        boundaries nest exactly across levels — see build_folded_table."""
        max_params = 2 ** log2_hashmap_size
        scales, resolutions, offsets, sizes, use_hash, strides = \
            [], [], [], [], [], []
        offset = 0
        for lvl in range(num_levels):
            scale = base_resolution * (2 ** lvl)
            res = scale + 1
            params_in_level = min(max_params, res ** input_dim)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)
            stride = 1
            lvl_strides = []
            for _ in range(input_dim):
                lvl_strides.append(stride if stride <= params_in_level else 0)
                stride *= res
            scales.append(float(scale))
            resolutions.append(res)
            offsets.append(offset)
            sizes.append(params_in_level)
            use_hash.append(gridtype == "hash" and stride > params_in_level)
            strides.append(tuple(lvl_strides))
            offset += params_in_level
        offsets.append(offset)
        return HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            per_level_scale=2.0, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size, gridtype=gridtype,
            align_corners=True, aligned=True, scales=tuple(scales),
            resolutions=tuple(resolutions), offsets=tuple(offsets),
            sizes=tuple(sizes), use_hash=tuple(use_hash),
            strides=tuple(strides))


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


def cell_sizes(spec: HashGridSpec):
    """Per-level CELL-table sizes for the cell layout: dense levels hold
    res^D cells, hashed levels keep the same 2^log2_hashmap_size budget."""
    sizes, offsets, strides = [], [], []
    off = 0
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        if spec.use_hash[lvl]:
            size = 2 ** spec.log2_hashmap_size
            lvl_strides = (0,) * spec.input_dim
        else:
            size = res ** spec.input_dim
            s, lvl_strides = 1, []
            for _ in range(spec.input_dim):
                lvl_strides.append(s)
                s *= res
            lvl_strides = tuple(lvl_strides)
        sizes.append(size)
        offsets.append(off)
        strides.append(lvl_strides)
        off += size
    offsets.append(off)
    return sizes, offsets, strides


def _cell_rows(spec, lvl, sizes, offsets, strides, cell_grid):
    """Cell-table row for each point. cell_grid: [N, D] uint32."""
    size = np.uint32(sizes[lvl])
    if spec.use_hash[lvl]:
        index = jnp.zeros(cell_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            index = index ^ (cell_grid[..., d] * np.uint32(_PRIMES[d]))
    else:
        index = jnp.zeros(cell_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            index = index + cell_grid[..., d] * np.uint32(strides[lvl][d])
    return (index % size).astype(jnp.int32) + np.int32(offsets[lvl])


def build_cell_table(embeddings, spec: HashGridSpec):
    """Convert a corner-layout table into the TPU cell layout.

    The cell layout stores all 2^D corner features of a cell contiguously in
    one row ([total_cells, 2^D * C]) so encoding costs ONE row-gather per
    point per level instead of 2^D — on TPU the HBM gather cost is per ROW,
    not per byte, so this is a direct 8x cut in the dominant cost. Dense
    levels convert exactly; hashed levels hash the CELL coordinate, so
    colliding fine-level cells alias whole corner tuples instead of single
    corners (a different — equally valid — collision structure; conversion
    populates each row from one preimage cell).
    """
    sizes, offsets, strides = cell_sizes(spec)
    bits = _corner_bits(spec.input_dim)  # [2^D, D]
    rows = []
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        size = sizes[lvl]
        if spec.use_hash[lvl]:
            # populate each row from one preimage cell; fine levels have far
            # more cells than rows, so sample size*4 random cells (fills
            # ~98% of rows) instead of enumerating res^3
            if res ** 3 > size * 4:
                rng = np.random.default_rng(lvl)
                cells = rng.integers(0, res, (size * 4, 3), dtype=np.uint32)
            else:
                g = np.arange(res, dtype=np.uint32)
                cx, cy, cz = np.meshgrid(g, g, g, indexing="ij")
                cells = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1)
            cells_j = jnp.asarray(cells, dtype=jnp.uint32)
        else:
            g = np.arange(res, dtype=np.uint32)
            cx, cy, cz = np.meshgrid(g, g, g, indexing="ij")
            cells_j = jnp.asarray(
                np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1),
                dtype=jnp.uint32)
        # corner features for each enumerated cell, via the CORNER layout
        corner_grid = cells_j[:, None, :] + jnp.asarray(bits)[None]
        corner_rows = _level_rows(spec, lvl, corner_grid)       # [M, 2^D]
        feats = jnp.take(embeddings, corner_rows, axis=0)       # [M, 2^D, C]
        feats = feats.reshape(feats.shape[0], -1)               # [M, 2^D*C]
        row_ids = _cell_rows(spec, lvl, sizes, offsets, strides, cells_j) \
            - offsets[lvl]
        lvl_table = jnp.zeros((size, feats.shape[-1]), dtype=embeddings.dtype)
        lvl_table = lvl_table.at[row_ids].set(feats)
        rows.append(lvl_table)
    return jnp.concatenate(rows, axis=0)


# Fused multi-level gathers materialize [chunk, L, 2^D, C] intermediates, so
# large point batches are processed in lax.map chunks of this many points
# (keeps peak HBM ~100 MB while keeping each gather op large enough to hit
# full gather throughput).
ENCODE_CHUNK = 131072


def _chunked_encode(encode_one, x, out_dim):
    """Apply encode_one([chunk, D]) over x [N, D] in fixed-size chunks."""
    N = x.shape[0]
    if N <= ENCODE_CHUNK:
        return encode_one(x)
    n_chunks = -(-N // ENCODE_CHUNK)
    pad = n_chunks * ENCODE_CHUNK - N
    xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0) \
        if pad else x
    out = jax.lax.map(encode_one,
                      xp.reshape(n_chunks, ENCODE_CHUNK, x.shape[1]))
    return out.reshape(n_chunks * ENCODE_CHUNK, out_dim)[:N]


def _pad_masked_levels(out_lc, n_active, spec):
    """Zero-fill the level-major output for levels >= n_active (the static
    level mask): [N, n_active, C] -> [N, L*C]. Masked levels contribute
    exactly-zero features — the mip-style footprint semantics (levels finer
    than the sample footprint carry aliased detail) — and, because the mask
    is STATIC, their gather rows are never issued, which is the entire
    saving (row count, not FLOPs, bounds these encoders on TPU)."""
    N = out_lc.shape[0]
    if n_active == spec.num_levels:
        return out_lc.reshape(N, spec.output_dim)
    pad = jnp.zeros((N, spec.num_levels - n_active, spec.level_dim),
                    out_lc.dtype)
    return jnp.concatenate([out_lc, pad], axis=1).reshape(N, spec.output_dim)


def _n_active(spec, max_level):
    if max_level is None:
        return spec.num_levels
    return max(1, min(int(max_level), spec.num_levels))


def hash_grid_encode_cell(cell_table, x, spec: HashGridSpec,
                          bound: float = 1.0, max_level=None):
    """Cell-layout encode: one row gather per (point, level); trilinear blend
    of the row's 2^D corner features. Semantics match hash_grid_encode for
    dense levels exactly and differ only in collision structure for hashed
    levels. max_level (static) drops levels >= it: zero features, no gather
    rows issued (see _pad_masked_levels)."""
    prefix = x.shape[:-1]
    x = x.reshape(-1, spec.input_dim)
    out = _chunked_encode(
        lambda xc: _encode_cell_chunk(cell_table, xc, spec, bound,
                                      _n_active(spec, max_level)),
        x, spec.output_dim)
    return out.reshape(prefix + (spec.output_dim,))


def _encode_cell_chunk(cell_table, x, spec, bound, n_active=None):
    if n_active is None:
        n_active = spec.num_levels
    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)
    bits_f = _corner_bits(spec.input_dim).astype(np.float32)
    sizes, offsets, strides = cell_sizes(spec)

    # index math for every level (cheap VPU integer ops), then ONE fused
    # gather op across all levels: TPU gather throughput grows with rows/op
    # (per-op issue cost dominates small gathers), so one [N*L]-row take
    # beats L separate [N]-row takes by ~4-5x.
    all_rows, all_w = [], []
    for lvl in range(n_active):
        scale = np.float32(spec.scales[lvl])
        pos = u * scale + (0.0 if spec.align_corners else np.float32(0.5))
        pos_floor = jnp.floor(pos)
        if spec.aligned:
            # u == 1 lands exactly on the last grid point; clamp to the last
            # CELL so frac = 1 interpolates to it instead of reading past it
            pos_floor = jnp.minimum(pos_floor, scale - 1.0)
        frac = pos - pos_floor
        cell_grid = pos_floor.astype(jnp.uint32)
        all_rows.append(_cell_rows(spec, lvl, sizes, offsets, strides,
                                   cell_grid))
        all_w.append(jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                                        frac[:, None, :],
                                        1.0 - frac[:, None, :]), axis=-1))
    rows = jnp.stack(all_rows, axis=1)                  # [N, La]
    w = jnp.stack(all_w, axis=1)                        # [N, La, 2^D]
    feats = jnp.take(cell_table, rows, axis=0)          # [N, La, 2^D*C]
    feats = feats.reshape(feats.shape[0], n_active,
                          2 ** spec.input_dim, spec.level_dim)
    out = jnp.sum(w[..., None].astype(feats.dtype) * feats, axis=2)
    out = _pad_masked_levels(out, n_active, spec)
    return jnp.where(oob[:, None], jnp.zeros_like(out), out)


def hash_grid_encode(embeddings, x, spec: HashGridSpec, bound: float = 1.0,
                     max_level=None):
    """Encode positions.

    embeddings: [total_params, C] table; x: [..., D] in [-bound, bound].
    Returns [..., L*C] with level-major features. max_level (static) drops
    levels >= it: zero features, no gather rows issued."""
    prefix = x.shape[:-1]
    x = x.reshape(-1, spec.input_dim)
    out = _chunked_encode(
        lambda xc: _encode_corner_chunk(embeddings, xc, spec, bound,
                                        _n_active(spec, max_level)),
        x, spec.output_dim)
    return out.reshape(prefix + (spec.output_dim,))


def _encode_corner_chunk(embeddings, x, spec, bound, n_active=None):
    if n_active is None:
        n_active = spec.num_levels
    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)  # [N]
    bits = _corner_bits(spec.input_dim)  # [2^D, D] uint32 (static)
    bits_f = bits.astype(np.float32)

    # per-level index math, then ONE fused gather across all levels/corners
    # (gather throughput grows with rows per op; see hash_grid_encode_cell)
    all_rows, all_w = [], []
    for lvl in range(n_active):
        scale = np.float32(spec.scales[lvl])
        pos = u * scale + (0.0 if spec.align_corners else np.float32(0.5))
        pos_floor = jnp.floor(pos)
        if spec.aligned:
            pos_floor = jnp.minimum(pos_floor, scale - 1.0)
        frac = pos - pos_floor  # [N, D]
        pos_grid = pos_floor.astype(jnp.uint32)  # [N, D]
        corner_grid = pos_grid[:, None, :] + jnp.asarray(bits)[None, :, :]  # [N, 2^D, D]
        # trilinear weights: prod_d (bit ? frac : 1-frac)
        w = jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                               frac[:, None, :], 1.0 - frac[:, None, :]), axis=-1)  # [N, 2^D]
        all_rows.append(_level_rows(spec, lvl, corner_grid))  # [N, 2^D]
        all_w.append(w)
    rows = jnp.stack(all_rows, axis=1)                 # [N, La, 2^D]
    w = jnp.stack(all_w, axis=1)                       # [N, La, 2^D]
    feats = jnp.take(embeddings, rows, axis=0)         # [N, La, 2^D, C]
    out = jnp.sum(w[..., None].astype(feats.dtype) * feats, axis=2)
    out = _pad_masked_levels(out, n_active, spec)      # level-major [N, L*C]
    return jnp.where(oob[:, None], jnp.zeros_like(out), out)


# --------------------------------------------------------------------------
# Folded-table encode (the round-2 gather-wall breaker)
#
# HBM random-access cost on TPU is per ROW, not per byte (BENCH_NOTES.md
# "the gather wall"): the reference layout needs L*2^D rows/sample
# (gridencoder.cu kernel_grid, :75-224) and the cell layout L rows. In an
# ALIGNED spec every level's cells nest inside the finer levels', so the
# trilinear interpolant of every level with scale <= F restricted to one
# cell of the res-F grid is itself trilinear — storing each such level's
# field values at the fine cell's 8 corners reproduces it EXACTLY. All
# folded levels therefore collapse into ONE [F^3, n_fold*2^D*C] row gather
# with ONE shared weight computation; only levels finer than F still cost a
# row each. Flagship spec (L=8, C=4, 16..2048, fold at F=128): 5 rows/sample
# instead of the reference's 128.
# --------------------------------------------------------------------------

def default_fold_levels(spec: HashGridSpec, max_fold_scale: int = 128) -> int:
    """Number of leading levels folded: every level with scale <= F where F
    is the largest scale <= max_fold_scale (F^3 fold-table rows; 128 ->
    2.1M rows, ~0.5 GB at C=4 bf16)."""
    n = 0
    for lvl in range(spec.num_levels):
        if spec.scales[lvl] <= max_fold_scale:
            n = lvl + 1
    return max(n, 1)


def _level_values(embeddings, spec: HashGridSpec, lvl: int, u):
    """Level-`lvl` interpolated features at u [N, D] in [0, 1] -> [N, C]."""
    scale = np.float32(spec.scales[lvl])
    bits = _corner_bits(spec.input_dim)
    bits_f = bits.astype(np.float32)
    pos = u * scale + (0.0 if spec.align_corners else np.float32(0.5))
    pos_floor = jnp.floor(pos)
    if spec.aligned:
        pos_floor = jnp.minimum(pos_floor, scale - 1.0)
    frac = pos - pos_floor
    corner_grid = pos_floor.astype(jnp.uint32)[:, None, :] \
        + jnp.asarray(bits)[None]
    rows = _level_rows(spec, lvl, corner_grid)                # [N, 2^D]
    w = jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                           frac[:, None, :], 1.0 - frac[:, None, :]),
                 axis=-1)                                     # [N, 2^D]
    feats = jnp.take(embeddings, rows, axis=0)                # [N, 2^D, C]
    return jnp.sum(w[..., None].astype(feats.dtype) * feats, axis=1)


def build_folded_table(embeddings, spec: HashGridSpec, fold_levels: int):
    """Fold the first `fold_levels` levels into one dense voxel table.

    Requires spec.aligned (exactness needs nesting cell boundaries). Returns
    [F^3, fold_levels * 2^D * C] where F = scales[fold_levels-1]; row layout
    is level-major then corner-major; rows indexed lexicographically
    ((x*F + y)*F + z).
    """
    if not spec.aligned:
        raise ValueError("build_folded_table needs an aligned spec "
                         "(HashGridSpec.make(aligned=True))")
    if spec.input_dim != 3:
        raise NotImplementedError("folded tables are 3-D only")
    F = int(spec.scales[fold_levels - 1])
    C = spec.level_dim

    # field values of each folded level at ALL fine grid points [(F+1)^3, C]
    g = np.arange(F + 1, dtype=np.float32) / np.float32(F)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    u_pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1))

    level_vals = []
    for lvl in range(fold_levels):
        v = _chunked_encode(
            lambda uc, _l=lvl: _level_values(embeddings, spec, _l, uc),
            u_pts, C)
        level_vals.append(v.reshape(F + 1, F + 1, F + 1, C))

    # folded[cell, lvl, corner] = V_lvl[cell + corner_offset]: 8 shifted
    # views per level — dense slicing, no gathers
    bits = _corner_bits(3)
    per_level = []
    for v in level_vals:
        corners = [v[bx:bx + F, by:by + F, bz:bz + F]
                   for bx, by, bz in bits.astype(int)]
        per_level.append(jnp.stack(corners, axis=3))   # [F,F,F,8,C]
    folded = jnp.stack(per_level, axis=3)              # [F,F,F,n_fold,8,C]
    return folded.reshape(F ** 3, fold_levels * 8 * C)


def build_hashed_cell_table(embeddings, spec: HashGridSpec, fold_levels: int):
    """Cell-layout table for the non-folded (finer) levels only, rebased so
    row 0 is the first cell of level `fold_levels`."""
    full = build_cell_table(embeddings, spec)
    _, offsets, _ = cell_sizes(spec)
    return full[offsets[fold_levels]:]


def hash_grid_encode_folded(fold_table, hashed_cell_table, x,
                            spec: HashGridSpec, fold_levels: int,
                            bound: float = 1.0, max_level=None):
    """Folded encode: 1 row gather for all folded levels + 1 cell row per
    finer level. Exact-equal to hash_grid_encode_cell for aligned specs.
    max_level (static) drops levels >= it: zero features; rows are saved
    for the per-level fine gathers (the fold row is one gather however
    many folded levels it carries, so masking inside the fold zeroes
    features without a row saving)."""
    prefix = x.shape[:-1]
    x = x.reshape(-1, spec.input_dim)
    out = _chunked_encode(
        lambda xc: _encode_folded_chunk(fold_table, hashed_cell_table, xc,
                                        spec, fold_levels, bound,
                                        _n_active(spec, max_level)),
        x, spec.output_dim)
    return out.reshape(prefix + (spec.output_dim,))


def _encode_folded_chunk(fold_table, hashed_cell_table, x, spec,
                         fold_levels, bound, n_active=None):
    if n_active is None:
        n_active = spec.num_levels
    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)
    F = int(spec.scales[fold_levels - 1])
    C = spec.level_dim
    bits_f = _corner_bits(3).astype(np.float32)

    # folded levels: one row, one shared trilinear weight set
    pos = u * np.float32(F)
    cell = jnp.clip(jnp.floor(pos), 0.0, F - 1.0)
    frac = pos - cell
    w8 = jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                            frac[:, None, :], 1.0 - frac[:, None, :]),
                  axis=-1)                                    # [N, 8]
    ci = cell.astype(jnp.int32)
    row = (ci[:, 0] * F + ci[:, 1]) * F + ci[:, 2]
    feats = jnp.take(fold_table, row, axis=0)                 # [N, nf*8*C]
    feats = feats.reshape(feats.shape[0], fold_levels, 8, C)
    dense_out = jnp.sum(w8[:, None, :, None].astype(feats.dtype) * feats,
                        axis=2)                               # [N, nf, C]
    if n_active < fold_levels:
        # masked levels inside the fold: zero the features (the fold row
        # is fetched whole regardless)
        lvl_mask = (jnp.arange(fold_levels) < n_active).astype(
            dense_out.dtype)
        dense_out = dense_out * lvl_mask[None, :, None]
    outs = [dense_out.reshape(dense_out.shape[0], fold_levels * C)]

    # finer levels: standard cell-layout encode, offsets rebased; the
    # static mask drops rows here (one per masked fine level per sample)
    n_hash = max(n_active, fold_levels) - fold_levels
    if n_hash > 0:
        sizes, offsets, strides = cell_sizes(spec)
        base = offsets[fold_levels]
        all_rows, all_w = [], []
        for lvl in range(fold_levels, fold_levels + n_hash):
            scale = np.float32(spec.scales[lvl])
            p = u * scale
            pf = jnp.minimum(jnp.floor(p), scale - 1.0)
            fr = p - pf
            cg = pf.astype(jnp.uint32)
            all_rows.append(_cell_rows(spec, lvl, sizes, offsets, strides,
                                       cg) - base)
            all_w.append(jnp.prod(jnp.where(jnp.asarray(bits_f)[None] > 0,
                                            fr[:, None, :],
                                            1.0 - fr[:, None, :]), axis=-1))
        rows = jnp.stack(all_rows, axis=1)                    # [N, nh]
        w = jnp.stack(all_w, axis=1)                          # [N, nh, 8]
        hf = jnp.take(hashed_cell_table, rows, axis=0)        # [N, nh, 8*C]
        hf = hf.reshape(hf.shape[0], n_hash, 8, C)
        hout = jnp.sum(w[..., None].astype(hf.dtype) * hf, axis=2)
        outs.append(hout.reshape(hout.shape[0], n_hash * C))

    n_masked_fine = spec.num_levels - max(n_active, fold_levels)
    if n_masked_fine > 0:
        outs.append(jnp.zeros((x.shape[0], n_masked_fine * C),
                              outs[0].dtype))
    out = jnp.concatenate(outs, axis=-1)
    return jnp.where(oob[:, None], jnp.zeros_like(out), out)
