"""Headline benchmark: render throughput (rays/sec/chip) on the validation
workload — an 800x800 view (640k rays) through the flagship Instant-NGP
hash-grid NeRF (reference envConfig.json:51-52, validate.py:72-75).

Render path = the TPU-native production config: occupancy-grid marching
(ops/marching.py; the reference's cuda_ray path, raymarching.cu:313-495)
over a scene-realistic bitfield + cell-layout hash encoding (one HBM row
gather per point per level, ops/hash_encoding.build_cell_table) + bf16 MLPs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star target of 50M rays/sec/chip.

Timing note: on the tunneled TPU platform block_until_ready() does not
synchronize, so every iteration fetches one output element to force
completion.
"""

import json
import time

import numpy as np

NORTH_STAR_RAYS_PER_SEC = 50e6
MAX_SAMPLES = 32  # slots per ray; trained NGP scenes average 8-32 hits


def _scene_bitfield(cfg):
    """Synthetic 'trained Stonehenge-like' occupancy: a ground slab plus a
    ring of pillars occupying ~5% of the grid (matches a converged density
    grid's sparsity; the bench measures throughput, not fidelity)."""
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.ops.ray_ops import (packbits, morton3d,
                                                      occupancy_to_skip_grid)

    H = cfg.grid_size
    g = np.arange(H)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * (np.stack([xx, yy, zz], -1) + 0.5) / H - 1.0
    r = np.sqrt(c[..., 0] ** 2 + c[..., 1] ** 2)
    ground = c[..., 2] < -0.96  # thin ground plane (~1 cell)
    pillars = (np.abs(r - 0.6) < 0.08) & (c[..., 2] < 0.2) & \
        ((np.arctan2(c[..., 1], c[..., 0]) * 8 % 2) < 1.0)
    occ = (ground | pillars).astype(np.float32) * 100.0
    grid = np.zeros((cfg.cascade, H ** 3), dtype=np.float32)
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    idx = np.asarray(morton3d(jnp.asarray(coords)))
    grid[0, idx] = occ.ravel()
    bitfield = packbits(jnp.asarray(grid), 0.5)
    skip = occupancy_to_skip_grid(jnp.asarray(grid) > 0.5, H)
    return bitfield, skip


def main():
    import os
    import jax
    # persistent compile cache: first compile of the marched renderer takes
    # minutes through the remote-compile tunnel; cache it next to the repo
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.rays import get_rays

    H = W = 800
    cfg = NetworkConfig(bound=1.0, compute_dtype="bfloat16")
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    params = net.to_cell(params)  # fast inference table layout

    state = R.RendererState.create(cfg.cascade, cfg.grid_size)
    bitfield, skip = _scene_bitfield(cfg)
    state = R.RendererState(
        density_grid=state.density_grid,
        density_bitfield=bitfield,
        mean_density=state.mean_density,
        iter_density=state.iter_density,
        skip_grid=skip)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    rays = get_rays(jnp.asarray(pose[None]), (1111.0, 1111.0, W / 2, H / 2),
                    H, W)
    rays_o = rays["rays_o"].reshape(-1, 3)
    rays_d = rays["rays_d"].reshape(-1, 3)
    n_rays = rays_o.shape[0]

    TILE = 131072
    n_tiles = (n_rays + TILE - 1) // TILE
    pad = n_tiles * TILE - n_rays
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))])

    @jax.jit
    def render(params, state, ro, rd):
        def tile(args):
            o, d = args
            out = R.run_grid(net, params, state, o, d,
                             max_samples=MAX_SAMPLES, max_steps=512,
                             sample_budget=TILE * 12,
                             samples_per_hit=2)
            return out["image"]
        imgs = jax.lax.map(tile, (ro.reshape(n_tiles, TILE, 3),
                                  rd.reshape(n_tiles, TILE, 3)))
        return imgs.reshape(-1, 3)

    img = render(params, state, rays_o, rays_d)
    _ = np.asarray(img[:1])  # force completion (see timing note)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        img = render(params, state, rays_o, rays_d)
        _ = np.asarray(img[:1])
    dt = (time.perf_counter() - t0) / n_iters

    rays_per_sec = n_rays / dt
    print(json.dumps({
        "metric": "rays/sec/chip (800^2 render, occupancy-marched hashgrid "
                  "NeRF, cell-layout tables, bf16)",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
