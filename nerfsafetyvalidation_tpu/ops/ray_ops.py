"""Ray/grid utility ops: aabb slab test, bg-sphere intersection, morton codes,
occupancy bitfield packing.

Parity targets in reference raymarching/src/raymarching.cu:
  near_far_from_aabb  <- kernel_near_far_from_aabb (:93-147)
  sph_from_ray        <- kernel_sph_from_ray (:164-200)
  morton3d / invert   <- __morton3D / __morton3D_invert (:58-83)
  packbits            <- kernel_packbits (:269-301)

All dense, fixed-shape, vectorized jnp — these are bandwidth-trivial ops that
XLA fuses with their consumers.
"""

import numpy as np
import jax
import jax.numpy as jnp

_F32_MAX = np.float32(np.finfo(np.float32).max)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Slab test. rays_o/d: [..., 3]; aabb: [6] (xmin,ymin,zmin,xmax,ymax,zmax).

    Returns (nears, fars) with both = float32 max where the ray misses the box
    (matching raymarching.cu:125-147); near is clamped to min_near on hits.
    """
    rd = 1.0 / rays_d
    t0 = (aabb[:3] - rays_o) * rd  # [..., 3]
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _F32_MAX, near)
    far = jnp.where(miss, _F32_MAX, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Intersect rays with the background sphere of given radius; return
    (theta, phi) normalized to [-1, 1] (raymarching.cu:164-200; y is up)."""
    A = jnp.sum(rays_d * rays_d, axis=-1)
    B = jnp.sum(rays_o * rays_d, axis=-1)
    C = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-B + jnp.sqrt(B * B - A * C)) / A
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2.0 * theta / np.pi - 1.0, phi / np.pi], axis=-1)


def _u32(x):
    return np.uint32(x)


def _expand_bits(v):
    """Spread the low 10 bits of v over every 3rd bit (raymarching.cu:58-66)."""
    v = (v * _u32(0x00010001)) & _u32(0xFF0000FF)
    v = (v * _u32(0x00000101)) & _u32(0x0F00F00F)
    v = (v * _u32(0x00000011)) & _u32(0xC30C30C3)
    v = (v * _u32(0x00000005)) & _u32(0x49249249)
    return v


def morton3d(coords):
    """coords: [..., 3] int in [0, 1024) -> interleaved morton codes [...]."""
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(v):
    v = v & _u32(0x49249249)
    v = (v | (v >> 2)) & _u32(0xC30C30C3)
    v = (v | (v >> 4)) & _u32(0x0F00F00F)
    v = (v | (v >> 8)) & _u32(0xFF0000FF)
    v = (v | (v >> 16)) & _u32(0x000003FF)
    return v


def morton3d_invert(codes):
    """codes: [...] -> [..., 3] int coords (raymarching.cu:70-83)."""
    m = codes.astype(jnp.uint32)
    x = _compact_bits(m)
    y = _compact_bits(m >> 1)
    z = _compact_bits(m >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(grid, thresh):
    """Pack density grid into an occupancy bitfield, 8 cells/byte.

    grid: [CAS, H^3] float; returns [CAS * H^3 // 8] uint8 where bit i of
    byte n corresponds to cell n*8+i (raymarching.cu:269-301).
    """
    flat = grid.reshape(-1)
    occ = (flat > thresh).astype(jnp.uint8).reshape(-1, 8)
    shifts = jnp.asarray(np.arange(8, dtype=np.uint8))
    return jnp.sum(occ << shifts, axis=-1, dtype=jnp.uint8)


def occupancy_to_skip_grid(occ, grid_size: int, max_skip: int = 15):
    """Chebyshev distance-to-occupied per cell, capped at max_skip.

    occ: [CAS, H^3] bool in MORTON order (same layout as the density grid).
    Returns uint8 [CAS, H^3] morton-ordered where 0 = occupied and d > 0
    means the nearest occupied cell is at least d cells away (L-inf), so a
    ray may safely jump (d-1) cell-widths — the hierarchical empty-space
    skip that replaces per-cell DDA stepping (cf. the VDB/hierarchical
    traversal literature; the reference marches cell by cell,
    raymarching.cu:392-403).

    Computed by iterated 3x3x3 min-pooling (morton -> xyz via a static
    permutation, max_skip reduce_window rounds, xyz -> morton back).
    """
    H = grid_size
    cas = occ.shape[0]
    g = jnp.arange(H, dtype=jnp.int32)
    xx, yy, zz = jnp.meshgrid(g, g, g, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], -1)
    morton = morton3d(coords)                      # xyz-row -> morton index

    # distance field in xyz layout: 0 where occupied, +inf elsewhere
    occ_xyz = jnp.zeros((cas, H * H * H), dtype=jnp.float32)
    occ_xyz = occ_xyz.at[:, :].set(
        jnp.take(occ.astype(jnp.float32), morton, axis=1))
    d = jnp.where(occ_xyz > 0, 0.0, float(max_skip)).reshape(cas, H, H, H)

    def round_fn(_, d):
        m = jax.lax.reduce_window(
            d, jnp.inf, jax.lax.min, (1, 3, 3, 3), (1, 1, 1, 1),
            "SAME")
        return jnp.minimum(d, m + 1.0)

    d = jax.lax.fori_loop(0, max_skip, round_fn, d)
    d = d.reshape(cas, H * H * H)
    # back to morton order: skip[morton[i]] = d_xyz[i]
    skip = jnp.zeros_like(d)
    skip = skip.at[:, morton].set(d)
    return jnp.clip(skip, 0, max_skip).astype(jnp.uint8)


def bitfield_lookup(bitfield, idx):
    """Read occupancy bit `idx` (int array) from a packed bitfield."""
    byte = jnp.take(bitfield, idx >> 3, axis=0)
    return ((byte >> (idx & 7).astype(jnp.uint8)) & 1).astype(jnp.bool_)
