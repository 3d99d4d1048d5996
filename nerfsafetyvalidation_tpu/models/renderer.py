"""Volume renderer.

Parity target: reference nerf/renderer.py (`NeRFRenderer`). This module keeps
the same outputs contract — the result dict carries the repo-specific extras
`rgbs`, `sigmas` (per-sample values) and `aggregated_density` (sum_i w_i
sigma_i per ray, renderer.py:244) that the UQ layer consumes — including the
staged-mode quirk that `rgbs`/`sigmas` come from the LAST ray chunk only
while image/depth/aggregated_density are full (renderer.py:578-583,
documented in SURVEY.md §3.3).

TPU design: the uniform-sampling path (`run`, renderer.py:125-258) is a dense
fixed-shape [N_rays, T_samples] program — one jit compiles the whole
slab-test -> sample -> hash-encode -> MLP -> composite pipeline and XLA fuses
it around the MXU matmuls. Staged rendering is a host loop over a single
compiled chunk program (exactly like the reference's max_ray_batch loop,
renderer.py:562-577) plus a faster `render_tiles` variant that lax.maps over
tiles and carries only per-ray outputs.

The occupancy-grid state machinery (`RendererState`, update_extra_state,
mark_untrained_grid — renderer.py:87-101, :388-546) replaces CUDA
morton/packbits kernels with the integer ops in ops/ray_ops. The
grid-accelerated marching path lives in marching.py.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ray_ops import (near_far_from_aabb, sph_from_ray, morton3d,
                           morton3d_invert, packbits)
from ..ops.compositing import composite_weights
from ..ops.sample_pdf import sample_pdf


# --------------------------------------------------------------------------
# occupancy grid state (renderer.py:87-101)
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class RendererState:
    density_grid: jnp.ndarray       # [CAS, H^3], morton-indexed; -1 = untrained
    density_bitfield: jnp.ndarray   # [CAS * H^3 // 8] uint8
    mean_density: jnp.ndarray       # scalar f32
    iter_density: jnp.ndarray       # scalar i32
    # chebyshev distance-to-occupied per cell (uint8, morton order) for
    # long-range empty-space jumps; zeros = "unknown, treat every cell as
    # occupied" only when all-zero AND the bitfield is also empty, so the
    # marcher falls back to the bitfield when skip_grid is unset
    skip_grid: jnp.ndarray = None   # [CAS, H^3] uint8 or None

    def tree_flatten(self):
        return ((self.density_grid, self.density_bitfield,
                 self.mean_density, self.iter_density, self.skip_grid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(cascade: int, grid_size: int = 128) -> "RendererState":
        n = grid_size ** 3
        return RendererState(
            density_grid=jnp.zeros((cascade, n), dtype=jnp.float32),
            density_bitfield=jnp.zeros((cascade * n // 8,), dtype=jnp.uint8),
            mean_density=jnp.zeros((), dtype=jnp.float32),
            iter_density=jnp.zeros((), dtype=jnp.int32),
            skip_grid=None,
        )


def aabb_of(cfg):
    b = cfg.bound
    return jnp.asarray([-b, -b, -b, b, b, b], dtype=jnp.float32)


# --------------------------------------------------------------------------
# uniform-sampling render path (renderer.py:125-258)
# --------------------------------------------------------------------------

def run(net, params, rays_o, rays_d, num_steps: int = 128,
        upsample_steps: int = 128, bg_color=None, perturb: bool = False,
        key=None, training: bool = False, aabb=None):
    """rays_o/d: [N, 3]. Returns the reference result dict. `aabb` overrides
    the config box (the GUI's aabb_infer sliders, reference gui.py:304)."""
    cfg = net.cfg
    if aabb is None:
        aabb = aabb_of(cfg)
    else:
        aabb = jnp.asarray(aabb, dtype=jnp.float32)
    N = rays_o.shape[0]

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    nears = nears[..., None]
    fars = fars[..., None]

    z = jnp.linspace(0.0, 1.0, num_steps)
    z_vals = nears + (fars - nears) * z[None, :]            # [N, T]
    sample_dist = (fars - nears) / num_steps                # [N, 1]
    if perturb:
        if key is None:
            raise ValueError("perturb=True requires a PRNG key")
        key, sub = jax.random.split(key)
        z_vals = z_vals + (jax.random.uniform(sub, z_vals.shape) - 0.5) * sample_dist

    def make_xyzs(zv):
        x = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(x, aabb[:3], aabb[3:])

    xyzs = make_xyzs(z_vals)                                # [N, T, 3]
    dout = net.density(params, xyzs.reshape(-1, 3))
    sigmas = dout["sigma"].reshape(N, num_steps)
    geo_feat = dout["geo_feat"].reshape(N, num_steps, -1)

    total = num_steps
    if upsample_steps > 0:
        # hierarchical upsampling (renderer.py:171-204), no grad through pdf
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], axis=-1)
        weights, _ = composite_weights(
            jax.lax.stop_gradient(sigmas), deltas, cfg.density_scale)
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        if training:
            if key is None:
                raise ValueError("training upsample requires a PRNG key")
            key, sub = jax.random.split(key)
        else:
            sub = None
        new_z = sample_pdf(z_mid, weights[:, 1:-1], upsample_steps,
                           det=not training, key=sub)
        new_z = jax.lax.stop_gradient(new_z)
        new_xyzs = make_xyzs(new_z)
        ndout = net.density(params, new_xyzs.reshape(-1, 3))
        new_sigmas = ndout["sigma"].reshape(N, upsample_steps)
        new_geo = ndout["geo_feat"].reshape(N, upsample_steps, -1)

        z_vals = jnp.concatenate([z_vals, new_z], axis=1)
        order = jnp.argsort(z_vals, axis=1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=1)
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyzs], axis=1), order[..., None], axis=1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sigmas], axis=1), order, axis=1)
        geo_feat = jnp.take_along_axis(
            jnp.concatenate([geo_feat, new_geo], axis=1), order[..., None], axis=1)
        total = num_steps + upsample_steps

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], axis=-1)
    weights, _ = composite_weights(sigmas, deltas, cfg.density_scale)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    mask = weights > 1e-4  # hard-coded threshold (renderer.py:216)
    rgbs = net.color(params, xyzs.reshape(-1, 3), dirs.reshape(-1, 3),
                     geo_feat=geo_feat.reshape(-1, geo_feat.shape[-1]),
                     mask=mask.reshape(-1))
    rgbs = rgbs.reshape(N, total, 3)

    weights_sum = jnp.sum(weights, axis=-1)
    # guard miss rays (nears == fars == f32 max): the reference propagates
    # 0/0 NaN into depth there (renderer.py:226); emit 0 instead
    span = jnp.where(fars > nears, fars - nears, 1.0)
    ori_z = jnp.clip((z_vals - nears) / span, 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)

    if cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = net.background(params, sph, rays_d)
    elif bg_color is None:
        bg = 1.0
    else:
        bg = bg_color
    image = image + (1.0 - weights_sum)[..., None] * bg

    aggregated_density = jnp.sum(weights * sigmas, axis=-1)

    return {
        "depth": depth,                       # [N]
        "image": image,                       # [N, 3]
        "weights_sum": weights_sum,           # [N]
        "rgbs": rgbs,                         # [N, T, 3]
        "sigmas": sigmas.reshape(-1, 1),      # [N*T, 1] (renderer.py:213-214)
        "aggregated_density": aggregated_density,  # [N]
    }


# --------------------------------------------------------------------------
# staged rendering (renderer.py:549-588)
# --------------------------------------------------------------------------

def _run_jitted(net):
    """One compiled chunk program, cached per (net config, static args)."""
    @partial(jax.jit, static_argnames=("num_steps", "upsample_steps",
                                       "perturb", "training"))
    def f(params, rays_o, rays_d, bg_color, key, num_steps, upsample_steps,
          perturb, training):
        return run(net, params, rays_o, rays_d, num_steps=num_steps,
                   upsample_steps=upsample_steps, bg_color=bg_color,
                   perturb=perturb, key=key, training=training)
    return f


_RUN_CACHE = {}


def _get_run(net):
    cache_key = id(net)
    hit = _RUN_CACHE.get(cache_key)
    # keep a strong ref to net in the entry so a GC'd net can't hand its
    # id to a different instance and serve a stale closure
    if hit is None or hit[0] is not net:
        _RUN_CACHE[cache_key] = (net, _run_jitted(net))
    return _RUN_CACHE[cache_key][1]


def render(net, params, rays_o, rays_d, staged: bool = False,
           max_ray_batch: int = 4096, num_steps: int = 512,
           upsample_steps: int = 0, bg_color=None, perturb: bool = False,
           key=None, training: bool = False, **kwargs):
    """rays_o/d: [B, N, 3]. Mirrors NeRFRenderer.render (renderer.py:549-588):
    staged mode loops over max_ray_batch chunks, keeping full image/depth/
    aggregated_density but only the last chunk's rgbs/sigmas."""
    B, N = rays_o.shape[:2]
    runf = _get_run(net)
    bg = jnp.asarray(1.0 if bg_color is None else bg_color, dtype=jnp.float32)

    if staged:
        depth = np.empty((B, N), dtype=np.float32)
        image = np.empty((B, N, 3), dtype=np.float32)
        aggregated = np.empty((B, N), dtype=np.float32)
        last = None
        for b in range(B):
            head = 0
            while head < N:
                tail = min(head + max_ray_batch, N)
                ro = rays_o[b, head:tail]
                rd = rays_d[b, head:tail]
                pad = max_ray_batch - (tail - head)
                if pad:  # keep one static shape -> one compilation
                    ro = jnp.concatenate([ro, jnp.zeros((pad, 3))], axis=0)
                    rd = jnp.concatenate(
                        [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))],
                        axis=0)
                res = runf(params, ro, rd, bg, key, num_steps, upsample_steps,
                           perturb, training)
                n = tail - head
                depth[b, head:tail] = np.asarray(res["depth"])[:n]
                image[b, head:tail] = np.asarray(res["image"])[:n]
                aggregated[b, head:tail] = np.asarray(res["aggregated_density"])[:n]
                last = res
                head += max_ray_batch
        return {
            "depth": jnp.asarray(depth),
            "image": jnp.asarray(image),
            "rgbs": last["rgbs"],
            "sigmas": last["sigmas"],
            "aggregated_density": jnp.asarray(aggregated),
        }

    res = runf(params, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), bg, key,
               num_steps, upsample_steps, perturb, training)
    return {
        "depth": res["depth"].reshape(B, N),
        "image": res["image"].reshape(B, N, 3),
        "weights_sum": res["weights_sum"].reshape(B, N),
        "rgbs": res["rgbs"],
        "sigmas": res["sigmas"],
        "aggregated_density": res["aggregated_density"].reshape(B, N),
    }


def render_tiles(net, params, rays_o, rays_d, tile: int = 8192,
                 num_steps: int = 512, upsample_steps: int = 0,
                 bg_color=None):
    """High-throughput full-frame render: one jit, lax.map over fixed tiles,
    carrying only per-ray outputs (image/depth/aggregated_density). Device-
    resident end to end — this is the bench path. rays_o/d: [N, 3]."""
    N = rays_o.shape[0]
    n_tiles = (N + tile - 1) // tile
    pad = n_tiles * tile - N
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))], axis=0)
    ro = rays_o.reshape(n_tiles, tile, 3)
    rd = rays_d.reshape(n_tiles, tile, 3)

    def one_tile(args):
        o, d = args
        res = run(net, params, o, d, num_steps=num_steps,
                  upsample_steps=upsample_steps, bg_color=bg_color)
        return res["image"], res["depth"], res["aggregated_density"]

    image, depth, agg = jax.lax.map(one_tile, (ro, rd))
    return {
        "image": image.reshape(-1, 3)[:N],
        "depth": depth.reshape(-1)[:N],
        "aggregated_density": agg.reshape(-1)[:N],
    }


# --------------------------------------------------------------------------
# occupancy-grid-accelerated render path (renderer.py:261-386 run_cuda analog)
# --------------------------------------------------------------------------

def run_grid(net, params, state: "RendererState", rays_o, rays_d,
             max_samples: int = 64, max_steps: int = 1024,
             dt_gamma: float = 0.0, bg_color=None, perturb_key=None,
             density_scale: float = None, sample_budget: int = None,
             samples_per_hit: int = 1):
    """Occupancy-marched render (the reference's run_cuda, renderer.py:261-386):
    march the bitfield for up to `max_samples` occupied samples per ray, one
    dense network query, masked composite. Static shapes throughout; the
    empty-space skipping makes this the fast path once the grid is trained.
    rays_o/d: [N, 3]."""
    from ..ops.marching import march_rays, composite_marched

    cfg = net.cfg
    if density_scale is None:
        density_scale = cfg.density_scale
    aabb = aabb_of(cfg)
    N = rays_o.shape[0]

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    m = march_rays(rays_o, rays_d, nears, fars, state.density_bitfield,
                   cfg.bound, cfg.cascade, cfg.grid_size,
                   max_samples=max_samples, max_steps=max_steps,
                   dt_gamma=dt_gamma, perturb=perturb_key,
                   skip_grid=state.skip_grid,
                   samples_per_hit=samples_per_hit)

    K = max_samples
    if sample_budget is not None:
        # query only the real samples: compact [N, K] -> [budget] (the
        # deterministic replacement for the reference's atomic compaction).
        # HBM scatter/gather costs are per ROW, so compact ONE packed
        # (t, ray_id) row per sample and rebuild xyz/dir from the ray — one
        # scatter in, one combined (sigma, rgb) gather back.
        from ..ops.marching import compact_samples, gather_compacted, \
            scatter_back
        dest, kept, _ = compact_samples(m["mask"], sample_budget)
        ray_ids = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.float32)[:, None], (N, K))
        packed = jnp.stack([m["ts"], ray_ids], axis=-1)          # [N, K, 2]
        pc = gather_compacted(packed, dest, sample_budget)       # [B, 2]
        rid = pc[:, 1].astype(jnp.int32)
        o_c = jnp.take(rays_o, rid, axis=0)
        d_c = jnp.take(rays_d, rid, axis=0)
        xs = jnp.clip(o_c + pc[:, :1] * d_c, -cfg.bound, cfg.bound)
        sig_c, rgb_c = net.apply(params, xs, d_c)
        both = jnp.concatenate([sig_c[:, None], rgb_c], axis=-1)  # [B, 4]
        back = scatter_back(both, dest, (N, K))                   # [N, K, 4]
        sigmas = back[..., 0]
        rgbs = back[..., 1:]
        m = dict(m, mask=m["mask"] & kept)
    else:
        xyzs = m["xyzs"].reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (N, K, 3)).reshape(-1, 3)
        sigmas, rgbs = net.apply(params, xyzs, dirs)
        sigmas = sigmas.reshape(N, K)
        rgbs = rgbs.reshape(N, K, 3)

    res = composite_marched(sigmas, rgbs, m["deltas"], m["rs"], m["ts"],
                            m["mask"], nears, fars,
                            density_scale=density_scale)
    bg = 1.0 if bg_color is None else bg_color
    image = res["image"] + (1.0 - res["weights_sum"])[..., None] * bg
    # depth normalized like run_cuda (renderer.py:323)
    safe_span = jnp.where(fars > nears, fars - nears, 1.0)
    depth = jnp.clip(res["depth"] - nears, 0.0, None) / safe_span
    return {
        "depth": depth,
        "image": image,
        "weights_sum": res["weights_sum"],
        "rgbs": rgbs,
        "sigmas": sigmas.reshape(-1, 1),
        "aggregated_density": res["aggregated_density"],
        # absolute opacity-weighted sample t (drives depth-guided windows)
        "depth_abs": res["depth_abs"],
    }


_RUN_GRID_CACHE = {}


def render_grid_staged(net, params, state: "RendererState", rays_o, rays_d,
                       max_ray_batch: int = 4096, max_samples: int = 32,
                       max_steps: int = 512, dt_gamma: float = 0.0,
                       bg_color=None, **kwargs):
    """Staged occupancy-marched rendering with the reference result-dict
    contract (image/depth/aggregated_density full; rgbs/sigmas from the last
    chunk — renderer.py:578-583). This is the fast-render path for the
    validation loop's 800^2 observation renders. rays_o/d: [B, N, 3]."""
    B, N = rays_o.shape[:2]
    key = (id(net), max_ray_batch, max_samples, max_steps, float(dt_gamma))
    hit = _RUN_GRID_CACHE.get(key)
    if hit is None or hit[0] is not net:
        _RUN_GRID_CACHE[key] = (net, jax.jit(
            lambda p, s, o, d, bg: run_grid(
                net, p, s, o, d, max_samples=max_samples,
                max_steps=max_steps, dt_gamma=dt_gamma, bg_color=bg,
                sample_budget=max_ray_batch * 12)))
    runf = _RUN_GRID_CACHE[key][1]
    bg = jnp.asarray(1.0 if bg_color is None else bg_color, dtype=jnp.float32)

    depth = np.empty((B, N), dtype=np.float32)
    image = np.empty((B, N, 3), dtype=np.float32)
    aggregated = np.empty((B, N), dtype=np.float32)
    last = None
    for b in range(B):
        head = 0
        while head < N:
            tail = min(head + max_ray_batch, N)
            ro = rays_o[b, head:tail]
            rd = rays_d[b, head:tail]
            pad = max_ray_batch - (tail - head)
            if pad:
                ro = jnp.concatenate([ro, jnp.zeros((pad, 3))], axis=0)
                rd = jnp.concatenate(
                    [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                          (pad, 3))], axis=0)
            res = runf(params, state, ro, rd, bg)
            n = tail - head
            depth[b, head:tail] = np.asarray(res["depth"])[:n]
            image[b, head:tail] = np.asarray(res["image"])[:n]
            aggregated[b, head:tail] = np.asarray(
                res["aggregated_density"])[:n]
            last = res
            head += max_ray_batch
    return {
        "depth": jnp.asarray(depth),
        "image": jnp.asarray(image),
        "rgbs": last["rgbs"],
        "sigmas": last["sigmas"],
        "aggregated_density": jnp.asarray(aggregated),
    }


# --------------------------------------------------------------------------
# occupancy grid maintenance (renderer.py:388-546)
# --------------------------------------------------------------------------

def mark_untrained_grid(cfg, state: RendererState, poses, intrinsic,
                        grid_size: int = 128) -> RendererState:
    """Mark grid cells seen by no training camera as -1 (renderer.py:388-451).
    poses: [B, 4, 4] cam2world; intrinsic: (fx, fy, cx, cy)."""
    poses = jnp.asarray(poses, dtype=jnp.float32)
    fx, fy, cx, cy = [float(v) for v in intrinsic]
    g = jnp.arange(grid_size, dtype=jnp.int32)
    xx, yy, zz = jnp.meshgrid(g, g, g, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1)
    indices = morton3d(coords)
    world = (2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0)

    cascade = state.density_grid.shape[0]
    new_grid = state.density_grid
    for cas in range(cascade):
        bound = min(2 ** cas, cfg.bound)
        half = bound / grid_size
        pts = world * (bound - half)                                 # [M, 3]
        cam = pts[None, :, :] - poses[:, None, :3, 3]                # [B, M, 3]
        cam = jnp.einsum("bmi,bij->bmj", cam, poses[:, :3, :3])
        mz = cam[..., 2] > 0
        mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
        my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
        count = jnp.sum(mz & mx & my, axis=0)                        # [M]
        cas_vals = new_grid[cas].at[indices].set(
            jnp.where(count == 0, -1.0, new_grid[cas][indices]))
        new_grid = new_grid.at[cas].set(cas_vals)
    return RendererState(new_grid, state.density_bitfield,
                         state.mean_density, state.iter_density)


def update_extra_state(net, params, state: RendererState, key,
                       decay: float = 0.95, grid_size: int = 128,
                       n_blocks: int = 1, block: int = 0) -> RendererState:
    """Refresh the density grid + bitfield (renderer.py:453-546).

    n_blocks=1 is the full-update branch (one dense batched density
    query). n_blocks>1 is the TPU form of the reference's partial update
    (renderer.py:472-500 probes 1/4 of the cells once trained): probe the
    morton-STRIDED subset `block::n_blocks` (static shape, spatially
    interleaved — unlike contiguous morton blocks, which would be
    octants), refresh those cells with the same decay/max rule, leave the
    rest untouched. Rotating `block` covers the grid every n_blocks
    updates at 1/n_blocks the probe cost."""
    cfg = net.cfg
    cascade = state.density_grid.shape[0]
    total = grid_size ** 3
    if n_blocks > 1:
        assert total % n_blocks == 0 and 0 <= block < n_blocks
        indices = jnp.asarray(block, dtype=jnp.int32) \
            + jnp.arange(total // n_blocks, dtype=jnp.int32) * n_blocks
        coords = morton3d_invert(indices)
    else:
        g = jnp.arange(grid_size, dtype=jnp.int32)
        xx, yy, zz = jnp.meshgrid(g, g, g, indexing="ij")
        coords = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)],
                           axis=-1)
        indices = morton3d(coords)
    xyzs = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0

    tmp = -jnp.ones_like(state.density_grid)
    for cas in range(cascade):
        bound = min(2 ** cas, cfg.bound)
        half = bound / grid_size
        key, sub = jax.random.split(key)
        pts = xyzs * (bound - half)
        pts = pts + (jax.random.uniform(sub, pts.shape) * 2.0 - 1.0) * half
        sig = net.density(params, pts)["sigma"] * cfg.density_scale
        tmp = tmp.at[cas, indices].set(sig)

    valid = (state.density_grid >= 0) & (tmp >= 0)
    new_grid = jnp.where(valid, jnp.maximum(state.density_grid * decay, tmp),
                         state.density_grid)
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    bitfield = packbits(new_grid, thresh)
    from ..ops.ray_ops import occupancy_to_skip_grid
    skip = occupancy_to_skip_grid(new_grid > thresh, grid_size)
    return RendererState(new_grid, bitfield, mean_density,
                         state.iter_density + 1, skip)


_FRAME_FAST_CACHE = {}


def render_frame_fast(net, params, state: "RendererState", rays_o, rays_d,
                      tile: int = 131072, max_samples: int = 16,
                      max_steps: int = 512, dt_gamma: float = 0.0,
                      bg_color: float = 1.0, samples_per_hit: int = 2,
                      march_tile: int = 32768, return_moments: bool = False):
    """Whole-frame fast path: march everything, then shade rays SORTED by
    their sample count so empty-sky tiles skip the encode+MLP entirely.

    The reference's inference marcher compacts alive rays every n_step
    (raymarching.cu:706-825) — this is the static-shape analog: one march
    pass produces per-ray sample counts; rays are permuted so occupied rays
    cluster at the front, each shade tile runs under a lax.cond that
    short-circuits tiles with zero samples (backgrounds are a third of a
    typical frame), and the image unpermutes at the end. Everything runs in
    ONE jit; rays_o/d: [N, 3] with N padded to a tile multiple by the
    caller or here.
    """
    from ..ops.marching import march_rays, composite_marched

    cfg = net.cfg
    N0 = rays_o.shape[0]
    n_tiles = (N0 + tile - 1) // tile
    pad = n_tiles * tile - N0
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                      (pad, 3))], axis=0)
    N = rays_o.shape[0]
    K = max_samples

    # one compiled program per (net, geometry, knobs) — rebuilding the jit
    # closure per call would re-trace every frame
    cache_key = (id(net), N, n_tiles, tile, K, max_steps, float(dt_gamma),
                 float(bg_color), samples_per_hit, march_tile, return_moments)
    hit = _FRAME_FAST_CACHE.get(cache_key)
    if hit is not None and hit[0] is net:
        img, depth, agg, ws, dabs, mom = hit[1](params, state, rays_o, rays_d)
        out = {"image": img[:N0], "depth": depth[:N0],
               "aggregated_density": agg[:N0], "weights_sum": ws[:N0],
               "depth_abs": dabs[:N0]}
        if return_moments:
            out["uq_moments"] = mom
        return out

    @jax.jit
    def render(params, state, rays_o, rays_d):
        # built INSIDE the jit: an array created outside would be a tracer
        # when this function is first called inside an outer trace (e.g.
        # the batched engine's scan), and the cached closure would leak it
        # into later traces that hit the same cache key
        aabb = aabb_of(cfg)
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)

        # march tiles span the WHOLE padded ray set; round down to a
        # divisor of `tile` so n_mtiles * mt == N exactly
        k = -(-tile // min(march_tile, tile))
        while tile % k:
            k += 1
        mt = tile // k
        n_mtiles = N // mt

        # ---- phase-1 march: a FIXED iteration budget for every ray (the
        # per-ray p50 finish point). A lockstep while_loop would pay each
        # tile's max; the scan just runs the body, which is a no-op for
        # finished rays.
        p1 = min(24, max_steps)

        def march_one(args):
            o, d, nr, fr = args
            _, carry = march_rays(o, d, nr, fr, state.density_bitfield,
                                  cfg.bound, cfg.cascade, cfg.grid_size,
                                  max_samples=K, max_steps=max_steps,
                                  dt_gamma=dt_gamma,
                                  skip_grid=state.skip_grid,
                                  samples_per_hit=samples_per_hit,
                                  fixed_iters=p1, return_carry=True)
            return carry

        t_c, count_c, ts_c = jax.lax.map(
            march_one, (rays_o.reshape(n_mtiles, mt, 3),
                        rays_d.reshape(n_mtiles, mt, 3),
                        nears.reshape(n_mtiles, mt),
                        fars.reshape(n_mtiles, mt)))
        t_c = t_c.reshape(N)
        count_c = count_c.reshape(N)
        ts_c = ts_c.reshape(N, K)

        # ---- sort: unfinished rays first (they need phase 2), then by
        # sample count so shading buckets stay tight; ONE permutation
        # serves both the phase-2 early exit and the shade skip.
        # The key alphabet is tiny (2K+2 values), so a stable COUNTING
        # sort — one-hot cumsums + a narrow int32 scatter — replaces the
        # O(N log^2 N) bitonic argsort (~50 ms/frame at 640k rays).
        active = (t_c < fars) & (count_c < K)
        key_desc = (2 * K + 1) - (active.astype(jnp.int32) * (K + 1)
                                  + count_c)                  # ascending key
        onehot = jax.nn.one_hot(key_desc, 2 * K + 2, dtype=jnp.int32)
        csum = jnp.cumsum(onehot, axis=0)                     # [N, 2K+2]
        rank = jnp.sum(csum * onehot, axis=-1) - 1            # rank in key
        counts = csum[-1]
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(counts)[:-1]])
        pos = jnp.take(starts, key_desc) + rank               # target slot
        order = jnp.zeros_like(pos).at[pos].set(
            jnp.arange(N, dtype=pos.dtype))
        t_s = jnp.take(t_c, order, axis=0)
        ts_s = jnp.take(ts_c, order, axis=0)
        count_s = jnp.take(count_c, order, axis=0)
        o_s = jnp.take(rays_o, order, axis=0)
        d_s = jnp.take(rays_d, order, axis=0)
        nears_s = jnp.take(nears, order, axis=0)
        fars_s = jnp.take(fars, order, axis=0)

        # ---- phase-2 march: resume the carry per tile; tiles whose rays
        # all finished exit their while_loop after the first cond check
        def march_two(args):
            o, d, nr, fr, tc, cc, tsc = args
            m = march_rays(o, d, nr, fr, state.density_bitfield, cfg.bound,
                           cfg.cascade, cfg.grid_size, max_samples=K,
                           max_steps=max_steps, dt_gamma=dt_gamma,
                           skip_grid=state.skip_grid,
                           samples_per_hit=samples_per_hit,
                           resume_carry=(tc, cc, tsc))
            return m["ts"], m["count"]

        ts2, count2 = jax.lax.map(
            march_two, (o_s.reshape(n_mtiles, mt, 3),
                        d_s.reshape(n_mtiles, mt, 3),
                        nears_s.reshape(n_mtiles, mt),
                        fars_s.reshape(n_mtiles, mt),
                        t_s.reshape(n_mtiles, mt),
                        count_s.reshape(n_mtiles, mt),
                        ts_s.reshape(n_mtiles, mt, K)))
        ts_s = ts2.reshape(N, K)
        count_s = count2.reshape(N)

        dt_min = 2.0 * np.sqrt(3.0) / max_steps
        dt_max = 2.0 * np.sqrt(3.0) * (2 ** (cfg.cascade - 1)) / cfg.grid_size

        # count-bucketed shading: after the sort, a tile's max sample count
        # bounds every ray in it; shade at the smallest sufficient slot
        # count (encode+MLP points scale with the branch's K)
        buckets = [k for k in (4, 8) if k < K] + [K]

        def shade_tile(args):
            o, d, ts_t, count_t, nr, fr = args

            def empty(_):
                img = jnp.full((tile, 3), bg_color, dtype=jnp.float32)
                return (img, jnp.zeros((tile,)), jnp.zeros((tile,)),
                        jnp.zeros((tile,)), jnp.zeros((tile,)),
                        jnp.zeros((4,)))

            def make_shade(Kb):
                def shade(_):
                    ts_b = ts_t[:, :Kb]
                    mask = jnp.arange(Kb)[None, :] < count_t[:, None]
                    dts = jnp.clip(ts_b * dt_gamma, dt_min, dt_max) * mask
                    ends = ts_b + dts
                    rs = (ends - jnp.concatenate(
                        [nr[:, None], ends[:, :-1]], axis=1)) * mask
                    xyzs = jnp.clip(
                        o[:, None, :] + ts_b[..., None] * d[:, None, :],
                        -cfg.bound, cfg.bound).reshape(-1, 3)
                    dirs = jnp.broadcast_to(d[:, None, :],
                                            (tile, Kb, 3)).reshape(-1, 3)
                    sigmas, rgbs = net.apply(params, xyzs, dirs)
                    sig_m = jnp.where(mask, sigmas.reshape(tile, Kb), 0.0)
                    rgb_m = rgbs.reshape(tile, Kb, 3)
                    res = composite_marched(
                        sigmas.reshape(tile, Kb), rgb_m,
                        dts, rs, ts_b, mask, nr, fr,
                        density_scale=cfg.density_scale)
                    img = res["image"] \
                        + (1.0 - res["weights_sum"])[..., None] * bg_color
                    safe = jnp.where(fr > nr, fr - nr, 1.0)
                    depth = jnp.clip(res["depth"] - nr, 0.0, None) / safe
                    # Gaussian-UQ sample moments (masked slots read as
                    # empty-space sigma=0, matching the uniform path's
                    # near-zero sky sigmas): [S_c2d2, S_cd, S_d, S_d2]
                    cd = rgb_m * sig_m[..., None]
                    mom = jnp.stack([jnp.sum(cd * cd), jnp.sum(cd),
                                     jnp.sum(sig_m), jnp.sum(sig_m ** 2)])
                    return (img, depth, res["aggregated_density"],
                            res["weights_sum"], res["depth_abs"], mom)
                return shade

            mx = jnp.max(count_t)
            idx = (mx > 0).astype(jnp.int32)
            for b in buckets[:-1]:
                idx = idx + (mx > b).astype(jnp.int32)
            return jax.lax.switch(idx, [empty] + [make_shade(b)
                                                  for b in buckets], None)

        img, depth, agg, ws, dabs, mom = jax.lax.map(
            shade_tile, (o_s.reshape(n_tiles, tile, 3),
                         d_s.reshape(n_tiles, tile, 3),
                         ts_s.reshape(n_tiles, tile, K),
                         count_s.reshape(n_tiles, tile),
                         nears_s.reshape(n_tiles, tile),
                         fars_s.reshape(n_tiles, tile)))

        inv = pos                         # pos IS the inverse permutation
        return (jnp.take(img.reshape(N, 3), inv, axis=0),
                jnp.take(depth.reshape(N), inv, axis=0),
                jnp.take(agg.reshape(N), inv, axis=0),
                jnp.take(ws.reshape(N), inv, axis=0),
                jnp.take(dabs.reshape(N), inv, axis=0),
                jnp.sum(mom, axis=0))

    _FRAME_FAST_CACHE[cache_key] = (net, render)
    img, depth, agg, ws, dabs, mom = render(params, state, rays_o, rays_d)
    out = {"image": img[:N0], "depth": depth[:N0],
           "aggregated_density": agg[:N0], "weights_sum": ws[:N0],
           "depth_abs": dabs[:N0]}
    if return_moments:
        out["uq_moments"] = mom
    return out


# --------------------------------------------------------------------------
# depth-guided frame render: the gather-minimal fast path (round 3)
# --------------------------------------------------------------------------

_FRAME_GUIDED_CACHE = {}


def _scout_field(p_net, p_params, pre_o, pre_d, S, cfg, aabb,
                 bitfield=None, grid_size: int = 128):
    """Uniform-sampling density scout along [near, far] — the cheap
    prepass: S samples/ray through the prepass net's density head, one
    transmittance composite. Returns (pre_dabs, pre_ws): the
    opacity-weighted absolute sample t and the opacity, the same contract
    render_frame_fast's marched prepass provides.

    `bitfield` (the occupancy bitfield the marcher walks) masks each
    sample's density by its cell's occupancy. This is REQUIRED for
    fidelity on a really-trained field: marched training never samples
    never-carved space, so the field there is unconstrained junk that the
    grid normally hides — an unmasked scout reads it and drags the
    windows (measured: 28.15 -> 18.4 dB at 800^2). The mask costs one
    1-byte gather per scout sample ((N/f^2)*S = 640k rows at 800^2/f=8,
    ~10-15 ms at the measured gather floor) — the fine pass stays
    grid-free."""
    P = pre_o.shape[0]
    nrp, frp = near_far_from_aabb(pre_o, pre_d, aabb, cfg.min_near)
    dtp = (frp - nrp) / S
    jjp = jnp.arange(S, dtype=jnp.float32) + 0.5
    z = nrp[:, None] + dtp[:, None] * jjp[None, :]               # [P, S]
    xyz = jnp.clip(pre_o[:, None, :] + z[..., None] * pre_d[:, None, :],
                   -cfg.bound, cfg.bound).reshape(-1, 3)
    if hasattr(p_net, "density"):
        sig = p_net.density(p_params, xyz)["sigma"]
    else:
        dirs_p = jnp.broadcast_to(pre_d[:, None, :],
                                  (P, S, 3)).reshape(-1, 3)
        sig, _ = p_net.apply(p_params, xyz, dirs_p)
    sig = sig.reshape(P, S)
    if bitfield is not None:
        # same cell addressing as the marcher (ops/marching.py body):
        # cascade level from position + the scout's own step size
        from ..ops.marching import _mip_from_dt, _mip_from_pos
        H = grid_size
        pos = xyz.reshape(P, S, 3)
        level = jnp.maximum(
            _mip_from_pos(pos, cfg.cascade),
            _mip_from_dt(dtp[:, None], H, cfg.cascade))          # [P, S]
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)),
                                cfg.bound)
        nxyz = jnp.clip(0.5 * (pos / mip_bound[..., None] + 1.0) * H,
                        0.0, H - 1).astype(jnp.int32)
        index = (level * (H ** 3) + morton3d(nxyz.reshape(-1, 3))
                 .reshape(P, S))
        byte = jnp.take(bitfield, index >> 3, axis=0)
        occ = ((byte >> (index & 7).astype(jnp.uint8)) & 1) > 0
        sig = jnp.where(occ, sig, 0.0)
    alphas = 1.0 - jnp.exp(-dtp[:, None] * cfg.density_scale * sig)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-15], axis=-1)
    trans = jnp.cumprod(shifted, axis=-1)[:, :-1]
    wgt = alphas * trans
    return jnp.sum(wgt * z, axis=-1), jnp.sum(wgt, axis=-1)


def _window_grids(pre_dabs, pre_ws, h, w):
    """Per prepass pixel: hit depth where opacity > 0.1, then a 3x3
    conservative [min, max] neighborhood pool. Returns ([h, w] each)
    tmin, tmax, anyhit."""
    t_hit = (pre_dabs / jnp.clip(pre_ws, 0.1, None)).reshape(h, w)
    hit_p = (pre_ws > 0.1).reshape(h, w)
    big = jnp.float32(1e9)
    tmin = jnp.where(hit_p, t_hit, big)
    tmax = jnp.where(hit_p, t_hit, -big)
    pad_min = jnp.pad(tmin, 1, constant_values=big)
    pad_max = jnp.pad(tmax, 1, constant_values=-big)
    mins, maxs = [], []
    for dy in range(3):
        for dx in range(3):
            mins.append(pad_min[dy:dy + h, dx:dx + w])
            maxs.append(pad_max[dy:dy + h, dx:dx + w])
    tmin = jnp.min(jnp.stack(mins), axis=0)
    tmax = jnp.max(jnp.stack(maxs), axis=0)
    return tmin, tmax, tmin < big


def _window_shade_tile(net, cfg, params, tile, K, bg_color, args,
                       adaptive_k: int = 0, adaptive_span: float = 0.0):
    """Shade one tile of rays with K uniform samples inside the per-ray
    [ta, tb] window; tiles with no hit ray short-circuit to background.
    Returns (img, depth, agg, ws, uq-moments).

    adaptive_k > 0 enables per-tile sample-count bucketing: a tile whose
    widest window is <= adaptive_span shades with `adaptive_k` samples
    instead of K — the sampling DENSITY (samples per unit depth) stays
    at or above the K-sample density on the full-span window, and the
    student's robust pixel fine-tune trains under randomized window
    width/center (models/bake.py finetune_render), so the narrower dtw
    discretization is in-distribution. The lax.switch pays only the
    chosen branch per tile, the TPU-native analog of the reference's
    per-ray early termination (raymarching.cu:871-912) at tile
    granularity."""
    o, d, ta, tb, nr, fr, ht = args

    def empty(_):
        img = jnp.full((tile, 3), bg_color, dtype=jnp.float32)
        return (img, jnp.zeros((tile,)), jnp.zeros((tile,)),
                jnp.zeros((tile,)), jnp.zeros((4,)))

    def make_shade(Kb):
        def shade(_):
            dtw = (tb - ta) / Kb                             # [tile]
            jj = (jnp.arange(Kb, dtype=jnp.float32) + 0.5)
            z = ta[:, None] + dtw[:, None] * jj[None, :]     # [tile, Kb]
            mask = ht[:, None] & (z < fr[:, None])
            xyz = jnp.clip(o[:, None, :] + z[..., None] * d[:, None, :],
                           -cfg.bound, cfg.bound).reshape(-1, 3)
            dirs = jnp.broadcast_to(d[:, None, :],
                                    (tile, Kb, 3)).reshape(-1, 3)
            sigmas, rgbs = net.apply(params, xyz, dirs)
            sigmas = jnp.where(mask, sigmas.reshape(tile, Kb), 0.0)
            rgbs = rgbs.reshape(tile, Kb, 3)
            alphas = 1.0 - jnp.exp(
                -dtw[:, None] * cfg.density_scale * sigmas)
            shifted = jnp.concatenate(
                [jnp.ones_like(alphas[:, :1]),
                 1.0 - alphas + 1e-15], axis=-1)
            trans = jnp.cumprod(shifted, axis=-1)[:, :-1]
            wgt = alphas * trans
            ws = jnp.sum(wgt, axis=-1)
            img = jnp.sum(wgt[..., None] * rgbs, axis=-2) \
                + (1.0 - ws)[..., None] * bg_color
            safe = jnp.where(fr > nr, fr - nr, 1.0)
            depth = jnp.sum(wgt * jnp.clip(z - nr[:, None], 0.0,
                                           None), axis=-1) / safe
            agg = jnp.sum(wgt * sigmas, axis=-1)
            cd = rgbs * sigmas[..., None]
            mom = jnp.stack([jnp.sum(cd * cd), jnp.sum(cd),
                             jnp.sum(sigmas), jnp.sum(sigmas ** 2)])
            return img, depth, agg, ws, mom
        return shade

    if not adaptive_k:
        return jax.lax.cond(jnp.any(ht), make_shade(K), empty, None)
    any_hit = jnp.any(ht)
    span = jnp.max(jnp.where(ht, tb - ta, 0.0))
    idx = jnp.where(any_hit,
                    jnp.where(span <= adaptive_span, 1, 2), 0)
    return jax.lax.switch(idx, [empty, make_shade(adaptive_k),
                                make_shade(K)], None)


def render_frame_guided(net, params, state: "RendererState", rays_o, rays_d,
                        H: int, W: int, prepass_factor: int = 8,
                        max_samples: int = 16, tile: int = 131072,
                        max_steps: int = 512, dt_gamma: float = 1.0 / 64,
                        bg_color: float = 1.0, margin_cells: float = 6.0,
                        prepass_tile: int = 16384, prepass_march_tile: int = 8192,
                        samples_per_hit: int = 2, return_moments: bool = False,
                        prepass_net=None, prepass_params=None,
                        fine_order: str = "natural",
                        prepass_mode: str = "march",
                        scout_samples: int = 64,
                        natural_tile_cap: int = 8192,
                        adaptive_k: int = 0,
                        adaptive_span_cells: float = 12.5):
    """Two-pass frame render built around the measured gather wall
    (BENCH_NOTES "ceiling proof"): the per-cell DDA march — whose serial
    occupancy gathers dominate render time — runs only for a low-res
    PREPASS (1/prepass_factor^2 of the rays); the full-res pass places a
    fixed window of `max_samples` uniform samples around the prepass
    depth and never touches the occupancy grid at all. Shading becomes
    pure dense compute (encode + MLP + composite) — the TPU-native analog
    of the reference's alive-ray compaction marcher
    (raymarching.cu:706-825), trading its per-step occupancy reads for
    one cheap depth scout.

    Window construction: per prepass pixel, hit depth t_hit where
    weights_sum > 0.1; per 3x3 prepass neighborhood the conservative
    [min, max] hit range +/- margin_cells grid cells; blocks with no hit
    in the neighborhood render as background without shading. Silhouette
    edges are covered by the 3x3 dilation (one prepass block = 
    prepass_factor pixels).

    fine_order: "natural" (default) shades fixed raster-order tiles —
    pure-sky row-bands skip via a per-tile cond at zero permutation cost;
    "partition" compacts hit rays first (cumsum partition + 6 wide-row
    gathers + unpermute), which skips more tiles but the permutation
    itself costs ~100 ms at 640k rays — more than the shading it saves.

    prepass_mode: "march" scouts depth with the occupancy-marched fast
    path (its own jit; ~60 ms at f=8 — the DDA's serial bitfield gathers).
    "scout" replaces the march with `scout_samples` UNIFORM samples per
    prepass ray evaluated through the prepass net's density head and
    MASKED by the occupancy bitfield (1 byte/sample — required on a
    really-trained field, see _scout_field), fused into the same jit as
    the fine pass; the fine pass itself stays grid-free, so for a
    gather-free student it is pure dense compute. The coarse-dt depth
    bias (span/scout_samples/2 ~ 1.7 cells at S=64) sits well inside the
    margin_cells=6 window.

    rays_o/d: [H*W, 3] row-major. Returns the render_frame_fast dict.
    """
    cfg = net.cfg
    f = prepass_factor
    K = max_samples
    N = H * W
    assert rays_o.shape[0] == N, "guided render needs full-frame rays"
    h = (H + f - 1) // f
    w = (W + f - 1) // f
    cell = 2.0 * cfg.bound / cfg.grid_size
    margin = margin_cells * cell

    # ---- prepass ray subsampling (one center ray per f x f block)
    yy = np.clip(np.arange(h) * f + f // 2, 0, H - 1)
    xx = np.clip(np.arange(w) * f + f // 2, 0, W - 1)
    pre_idx = (yy[:, None] * W + xx[None, :]).reshape(-1)
    # the depth scout may use a DIFFERENT field than the fine shade — e.g.
    # a distilled student shades while the teacher places the windows
    # (models/bake.py: student sigma bias otherwise shifts the windows)
    p_net = prepass_net if prepass_net is not None else net
    p_params = prepass_params if prepass_params is not None else params

    if fine_order == "natural":
        # small raster-order tiles: sky skipping comes from image locality
        # (whole sky row-bands skip via the per-tile cond) instead of a
        # hit/miss partition — measured, the partition's 6 wide-row
        # permutation gathers + unpermute cost MORE than the shading they
        # save (~100 ms at 640k rays; BENCH_NOTES "ceiling proof").
        # natural_tile_cap trades sky-skip granularity against lax.map
        # loop overhead (scripts/bench_tile_sweep.py measures the knee)
        tile = min(tile, natural_tile_cap)
    n_tiles = (N + tile - 1) // tile
    Np = n_tiles * tile

    cache_key = (id(net), id(p_net), H, W, f, K, tile, float(bg_color),
                 float(margin), return_moments, fine_order, prepass_mode,
                 scout_samples, adaptive_k, float(adaptive_span_cells))
    hit_fn = _FRAME_GUIDED_CACHE.get(cache_key)
    # staleness guard checks BOTH closed-over nets (the cache key encodes
    # id(net)/id(p_net); the identity check keeps a recycled id from
    # silently serving a stale closure)
    if hit_fn is None or hit_fn[0] is not net or hit_fn[1] is not p_net:

        def _body(params, rays_o, rays_d, pre_dabs, pre_ws):
            # constants built inside the traced body (a closure-captured
            # array from an outer trace would leak — see render_frame_fast)
            aabb = aabb_of(cfg)
            nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                             cfg.min_near)
            # absolute expected surface t (composite_marched depth_abs is
            # the opacity-weighted sample t) -> 3x3-dilated window grids
            tmin, tmax, anyhit = _window_grids(pre_dabs, pre_ws, h, w)

            def up(m):  # nearest-neighbor upsample [h, w] -> [H*W]
                m = jnp.broadcast_to(m[:, None, :, None], (h, f, w, f))
                return m.reshape(h * f, w * f)[:H, :W].reshape(N)

            t0 = jnp.clip(up(tmin) - margin, nears, fars)
            t1 = jnp.clip(up(tmax) + margin, nears, fars)
            hit = up(anyhit.astype(jnp.float32)) > 0.5
            hit = hit & (fars > nears) & (t1 > t0)

            if fine_order == "natural":
                # raster order: zero permutation cost; sky row-bands skip
                # via the per-tile cond below
                pos = None
                o_s, d_s = rays_o, rays_d
                t0_s, t1_s, nr_s, fr_s, hit_s = t0, t1, nears, fars, hit
            else:
                # hits first; all-sky tiles skip shading entirely. The key
                # is BOOLEAN, so a stable partition via two cumsums + one
                # narrow int32 scatter replaces the O(N log^2 N) bitonic
                # argsort (measured ~50 ms/frame back at 640k rays;
                # BENCH_NOTES "ceiling proof": 4B scatters are ~18 ns/row,
                # wide-row sorts are the expensive path). pos is ALSO the
                # inverse permutation.
                n_hit = jnp.sum(hit)
                pos = jnp.where(hit, jnp.cumsum(hit) - 1,
                                n_hit + jnp.cumsum(~hit) - 1)
                order = jnp.zeros_like(pos).at[pos].set(
                    jnp.arange(pos.shape[0], dtype=pos.dtype))
                o_s = jnp.take(rays_o, order, axis=0)
                d_s = jnp.take(rays_d, order, axis=0)
                t0_s = jnp.take(t0, order, axis=0)
                t1_s = jnp.take(t1, order, axis=0)
                nr_s = jnp.take(nears, order, axis=0)
                fr_s = jnp.take(fars, order, axis=0)
                hit_s = jnp.take(hit, order, axis=0)

            pad = Np - N
            if pad:
                o_s = jnp.concatenate([o_s, jnp.zeros((pad, 3))], axis=0)
                d_s = jnp.concatenate(
                    [d_s, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                           (pad, 3))], axis=0)
                t0_s = jnp.concatenate([t0_s, jnp.zeros((pad,))])
                t1_s = jnp.concatenate([t1_s, jnp.zeros((pad,))])
                nr_s = jnp.concatenate([nr_s, jnp.zeros((pad,))])
                fr_s = jnp.concatenate([fr_s, jnp.ones((pad,))])
                hit_s = jnp.concatenate(
                    [hit_s, jnp.zeros((pad,), dtype=bool)])

            def shade_tile(args):
                return _window_shade_tile(
                    net, cfg, params, tile, K, bg_color, args,
                    adaptive_k=adaptive_k,
                    adaptive_span=adaptive_span_cells * cell)

            img, depth, agg, ws, mom = jax.lax.map(
                shade_tile, (o_s.reshape(n_tiles, tile, 3),
                             d_s.reshape(n_tiles, tile, 3),
                             t0_s.reshape(n_tiles, tile),
                             t1_s.reshape(n_tiles, tile),
                             nr_s.reshape(n_tiles, tile),
                             fr_s.reshape(n_tiles, tile),
                             hit_s.reshape(n_tiles, tile)))
            if fine_order == "natural":
                return (img.reshape(Np, 3)[:N], depth.reshape(Np)[:N],
                        agg.reshape(Np)[:N], ws.reshape(Np)[:N],
                        jnp.sum(mom, axis=0))
            inv = pos
            return (jnp.take(img.reshape(Np, 3)[:N], inv, axis=0),
                    jnp.take(depth.reshape(Np)[:N], inv, axis=0),
                    jnp.take(agg.reshape(Np)[:N], inv, axis=0),
                    jnp.take(ws.reshape(Np)[:N], inv, axis=0),
                    jnp.sum(mom, axis=0))

        if prepass_mode == "scout":
            pre_idx_np = np.asarray(pre_idx)   # numpy: traced as a constant
            S = scout_samples

            @jax.jit
            def fine(params, p_params, rays_o, rays_d, bitfield):
                pre_o = jnp.take(rays_o, pre_idx_np, axis=0)
                pre_d = jnp.take(rays_d, pre_idx_np, axis=0)
                pre_dabs, pre_ws = _scout_field(p_net, p_params, pre_o,
                                                pre_d, S, cfg, aabb_of(cfg),
                                                bitfield=bitfield,
                                                grid_size=cfg.grid_size)
                return _body(params, rays_o, rays_d, pre_dabs, pre_ws)
        else:
            fine = jax.jit(_body)
        _FRAME_GUIDED_CACHE[cache_key] = (net, p_net, fine)
    fine = _FRAME_GUIDED_CACHE[cache_key][2]
    if prepass_mode == "scout":
        img, depth, agg, ws, mom = fine(params, p_params, rays_o, rays_d,
                                        state.density_bitfield)
    else:
        # marched prepass through the fast path (its own jit)
        pre = render_frame_fast(p_net, p_params, state,
                                jnp.take(rays_o, jnp.asarray(pre_idx),
                                         axis=0),
                                jnp.take(rays_d, jnp.asarray(pre_idx),
                                         axis=0),
                                tile=min(prepass_tile,
                                         _round_up(h * w, 1024)),
                                max_samples=K, max_steps=max_steps,
                                dt_gamma=dt_gamma, bg_color=bg_color,
                                samples_per_hit=samples_per_hit,
                                march_tile=prepass_march_tile)
        img, depth, agg, ws, mom = fine(params, rays_o, rays_d,
                                        pre["depth_abs"],
                                        pre["weights_sum"])
    out = {"image": img, "depth": depth, "aggregated_density": agg,
           "weights_sum": ws}
    if return_moments:
        out["uq_moments"] = mom
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
