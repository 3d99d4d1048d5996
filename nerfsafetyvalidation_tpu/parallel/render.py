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
