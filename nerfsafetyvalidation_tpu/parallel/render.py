"""Multi-chip frame rendering via shard_map over the data mesh.

The reference scales rendering only by staged host loops (renderer.py:
562-577); multi-GPU rendering does not exist there. Here a full frame
shards its rays over the 1-D 'data' mesh: every device marches + shades its
ray shard through the SAME replicated params/occupancy state (run_grid),
and the image assembles from the sharded outputs — an embarrassingly
parallel decomposition whose collectives are only the initial broadcast, so
scaling rides ICI bandwidth-free. The weak-scaling harness in
tests/test_parallel.py drives this on the virtual CPU mesh; on a real slice
the same code runs unchanged.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import renderer as R


def render_frame_sharded(net, params, state, rays_o, rays_d, mesh,
                         max_samples: int = 16, max_steps: int = 512,
                         samples_per_hit: int = 2, bg_color: float = 1.0,
                         dt_gamma: float = 0.0):
    """rays_o/d: [N, 3] with N divisible by the mesh size (pad upstream).
    Returns {image [N, 3], depth [N], aggregated_density [N]}."""

    def one_shard(params, state, ro, rd):
        out = R.run_grid(net, params, state, ro, rd,
                         max_samples=max_samples, max_steps=max_steps,
                         dt_gamma=dt_gamma, bg_color=bg_color,
                         samples_per_hit=samples_per_hit)
        return out["image"], out["depth"], out["aggregated_density"]

    smapped = shard_map(
        one_shard, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_rep=False)

    img, depth, agg = jax.jit(smapped)(params, state, rays_o, rays_d)
    return {"image": img, "depth": depth, "aggregated_density": agg}


_GUIDED_SHARDED_CACHE = {}


def render_frame_guided_sharded(net, params, rays_o, rays_d, H, W, mesh,
                                prepass_factor: int = 8,
                                max_samples: int = 16, tile: int = 8192,
                                scout_samples: int = 64,
                                margin_cells: float = 6.0,
                                bg_color: float = 1.0,
                                prepass_net=None, prepass_params=None,
                                bitfield=None):
    """Multi-chip depth-guided frame render (scout prepass, natural tile
    order — the single-chip headline path of models/renderer.py
    render_frame_guided, sharded over the 1-D 'data' mesh).

    Decomposition: every device recomputes the FULL low-res scout
    (h*w = N/prepass_factor^2 rays through the density head — ~2% of a
    frame's FLOPs, so replicating it is cheaper than gathering a sharded
    prepass) and the [h, w] window grids, guaranteeing windows identical
    to the single-chip render; each device then shades only its own
    contiguous chunk of raster-order tiles. No collectives beyond the
    initial broadcast — outputs assemble sharded, so scaling is linear in
    devices like the reference could never do (its multi-GPU story stops
    at DDP training, main_nerf.py has no multi-GPU inference).

    rays_o/d: [H*W, 3] row-major (padded internally). Returns
    {image [H*W, 3], depth, aggregated_density, weights_sum}.
    """
    from ..models.renderer import (aabb_of, near_far_from_aabb,
                                   _scout_field, _window_grids,
                                   _window_shade_tile)

    cfg = net.cfg
    f = prepass_factor
    K = max_samples
    N = H * W
    assert rays_o.shape[0] == N, "guided render needs full-frame rays"
    h = (H + f - 1) // f
    w = (W + f - 1) // f
    aabb = aabb_of(cfg)
    cell = 2.0 * cfg.bound / cfg.grid_size
    margin = margin_cells * cell
    p_net = prepass_net if prepass_net is not None else net
    p_params = prepass_params if prepass_params is not None else params

    n_dev = mesh.devices.size
    n_tiles = -(-N // tile)
    n_tiles = -(-n_tiles // n_dev) * n_dev        # tiles % devices == 0
    Np = n_tiles * tile
    Ns = Np // n_dev                              # rays per shard

    yy = np.clip(np.arange(h) * f + f // 2, 0, H - 1)
    xx = np.clip(np.arange(w) * f + f // 2, 0, W - 1)
    pre_idx = jnp.asarray((yy[:, None] * W + xx[None, :]).reshape(-1))

    key = (id(net), id(p_net), id(mesh), H, W, f, K, tile, scout_samples,
           float(margin), float(bg_color), bitfield is not None)
    hit = _GUIDED_SHARDED_CACHE.get(key)
    if hit is None or hit[0] is not net:

        def one_shard(params, p_params, bf, pre_o, pre_d, ro, rd):
            i = jax.lax.axis_index("data")
            # occupancy-masked scout (models/renderer._scout_field): on a
            # really-trained field the unmasked scout reads uncarved-space
            # junk density and drags the windows
            pre_dabs, pre_ws = _scout_field(p_net, p_params, pre_o, pre_d,
                                            scout_samples, cfg, aabb,
                                            bitfield=bf,
                                            grid_size=cfg.grid_size)
            tmin, tmax, anyhit = _window_grids(pre_dabs, pre_ws, h, w)

            def up(m):   # [h, w] -> [Np] nearest-neighbor, zero-padded
                m = jnp.broadcast_to(m[:, None, :, None], (h, f, w, f))
                m = m.reshape(h * f, w * f)[:H, :W].reshape(N)
                if Np > N:
                    m = jnp.concatenate(
                        [m, jnp.zeros((Np - N,), m.dtype)])
                return m

            off = i * Ns
            t0 = jax.lax.dynamic_slice(up(tmin), (off,), (Ns,))
            t1 = jax.lax.dynamic_slice(up(tmax), (off,), (Ns,))
            hb = jax.lax.dynamic_slice(
                up(anyhit.astype(jnp.float32)), (off,), (Ns,))
            nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.min_near)
            t0 = jnp.clip(t0 - margin, nears, fars)
            t1 = jnp.clip(t1 + margin, nears, fars)
            hitb = (hb > 0.5) & (fars > nears) & (t1 > t0)

            nt = Ns // tile
            img, depth, agg, ws, _ = jax.lax.map(
                lambda a: _window_shade_tile(net, cfg, params, tile, K,
                                             bg_color, a),
                (ro.reshape(nt, tile, 3), rd.reshape(nt, tile, 3),
                 t0.reshape(nt, tile), t1.reshape(nt, tile),
                 nears.reshape(nt, tile), fars.reshape(nt, tile),
                 hitb.reshape(nt, tile)))
            return (img.reshape(Ns, 3), depth.reshape(Ns),
                    agg.reshape(Ns), ws.reshape(Ns))

        smapped = shard_map(
            one_shard, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data")),
            check_rep=False)
        _GUIDED_SHARDED_CACHE[key] = (net, jax.jit(smapped))

    runf = _GUIDED_SHARDED_CACHE[key][1]
    if bitfield is None:
        # no-mask sentinel: every (clamped) lookup reads 0xFF = occupied,
        # so the scout is unmasked — for nets whose free-space density is
        # already consistent (tests' sphere-masked field)
        bitfield = jnp.full((8,), 255, dtype=jnp.uint8)
    pre_o = jnp.take(rays_o, pre_idx, axis=0)
    pre_d = jnp.take(rays_d, pre_idx, axis=0)
    pad = Np - N
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                      (pad, 3))], axis=0)
    img, depth, agg, ws = runf(params, p_params, bitfield, pre_o, pre_d,
                               rays_o, rays_d)
    return {"image": img[:N], "depth": depth[:N],
            "aggregated_density": agg[:N], "weights_sum": ws[:N]}


def psnr_allreduce(pred, gt, mesh):
    """Eval-metric reduction over sharded predictions — the analog of the
    reference's dist.all_reduce of eval statistics (utils.py:867-882)."""

    def shard_fn(p, g):
        se = jnp.sum((p - g) ** 2)
        n = jnp.asarray(p.size, dtype=jnp.float32)
        se = jax.lax.psum(se, "data")
        n = jax.lax.psum(n, "data")
        return (-10.0 * jnp.log10(se / n))[None]

    smapped = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P("data"), P("data")),
                        out_specs=P(None), check_rep=False)
    return jax.jit(smapped)(pred, gt)[0]
