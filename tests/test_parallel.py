"""Multi-chip sharding: shard_map frame rendering + sharded batched
rollouts on the 8-virtual-device CPU mesh (SURVEY.md §2c plan; VERDICT r1
item 8). Correctness gates here; weak-scaling timings are recorded into
MULTICHIP_NOTES.md by scripts/measure_scaling.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.parallel.mesh import (get_mesh,
                                                    replicate_params,
                                                    shard_batch)
from nerfsafetyvalidation_tpu.parallel.render import (render_frame_sharded,
                                                      psnr_allreduce)


@pytest.fixture(scope="module")
def stack():
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                        grid_ray=True)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = R.RendererState.create(cfg.cascade, cfg.grid_size)
    # make everything occupied so marching emits samples
    grid = jnp.full_like(state.density_grid, 10.0)
    from nerfsafetyvalidation_tpu.ops.ray_ops import packbits
    state = R.RendererState(grid, packbits(grid, 0.5), state.mean_density,
                            state.iter_density, None)
    rng = np.random.default_rng(0)
    n = 8 * 32
    ro = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3)), dtype=jnp.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return net, params, state, ro, rd


def test_sharded_render_matches_single_device(stack):
    net, params, state, ro, rd = stack
    mesh = get_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices
    params_r = replicate_params(params, mesh)
    state_r = jax.device_put(state, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    sharded = shard_batch({"o": ro, "d": rd}, mesh)

    out = render_frame_sharded(net, params_r, state_r, sharded["o"],
                               sharded["d"], mesh, max_samples=8,
                               max_steps=64)
    ref = R.run_grid(net, params, state, ro, rd, max_samples=8,
                     max_steps=64, samples_per_hit=2, bg_color=1.0)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-4,
                               atol=1e-4)


def test_psnr_allreduce_matches_global(stack):
    net, params, state, ro, rd = stack
    mesh = get_mesh()
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.uniform(0, 1, (256, 3)), dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (256, 3)), dtype=jnp.float32)
    sharded = shard_batch({"p": pred, "g": gt}, mesh)
    v = float(psnr_allreduce(sharded["p"], sharded["g"], mesh))
    ref = float(-10 * jnp.log10(jnp.mean((pred - gt) ** 2)))
    assert abs(v - ref) < 1e-3


def test_full_batched_engine_sharded(stack):
    """The full-fidelity rollout engine shards its population axis over the
    mesh and matches the unsharded run."""
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)
    net, params, state, _, _ = stack

    kw = dict(
        actions=np.tile(np.asarray([10.2, 0.01, 0.0, 0.0], np.float32),
                        (3, 1)),
        dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
        sdf=np.full((96, 92, 24), 1.0, np.float32),
        sdf_start=[-1.4, -1.3, -0.1], granularity=40,
        noise_mean=np.zeros(12, np.float32),
        noise_std=np.full(12, 0.01, np.float32),
        start_state=np.concatenate([
            np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(np.float32),
        net=net, params=params, obs_res=8, render_steps=4,
        base_intrinsics=(10.0, 10.0, 4.0, 4.0), base_res=8)

    z = np.random.default_rng(2).normal(size=(8, 3, 12)).astype(np.float32)
    plain = FullBatchedRolloutEngine(**kw)
    out0 = plain.run(z)
    eng = FullBatchedRolloutEngine(mesh=get_mesh(), **kw)
    out1 = eng.run(z)
    np.testing.assert_allclose(np.asarray(out0["positions"]),
                               np.asarray(out1["positions"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0["sdf_vals"]),
                               np.asarray(out1["sdf_vals"]), rtol=1e-5)


def test_sharded_guided_render_matches_single_device():
    """Frame-banded sharded guided render (scout prepass, natural order)
    is bit-comparable to the single-device render_frame_guided scout path
    — every device recomputes the full window grids, so the windows (and
    hence the shading) are identical."""
    from nerfsafetyvalidation_tpu.parallel.render import (
        render_frame_guided_sharded)
    from nerfsafetyvalidation_tpu.ops.ray_ops import (morton3d, packbits,
                                                      occupancy_to_skip_grid)
    from tests.test_guided_bake import _SphereMaskedNet

    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                        grid_ray=True, density_scale=50.0)
    net = _SphereMaskedNet(NeRFNetwork(cfg))
    params = net.init(jax.random.PRNGKey(0))
    G = cfg.grid_size
    g = np.arange(G)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * (np.stack([xx, yy, zz], -1) + 0.5) / G - 1.0
    occ = (np.linalg.norm(c, axis=-1) < 0.4).astype(np.float32) * 100
    grid = np.zeros((cfg.cascade, G ** 3), np.float32)
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    idx = np.asarray(morton3d(jnp.asarray(coords)))
    grid[0, idx] = occ.ravel()
    gridj = jnp.asarray(grid)
    state = R.RendererState(gridj, packbits(gridj, 0.5), jnp.asarray(1.0),
                            jnp.asarray(1),
                            occupancy_to_skip_grid(gridj > 0.5, G))
    H = W = 32
    ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, H),
                         np.linspace(-0.9, 0.9, W), indexing="ij")
    ro = jnp.asarray(np.stack(
        [xs.ravel(), ys.ravel(), np.full(H * W, -2.5)], -1), jnp.float32)
    rd = jnp.asarray(np.broadcast_to(
        np.asarray([0.0, 0.0, 1.0]), (H * W, 3)), jnp.float32)

    mesh = get_mesh()
    single = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                   prepass_factor=4, max_samples=16,
                                   tile=64, prepass_mode="scout",
                                   scout_samples=32, fine_order="natural")
    # same occupancy mask as the single-device scout (the real usage:
    # measure_scaling passes state.density_bitfield)
    sharded = render_frame_guided_sharded(net, params, ro, rd, H, W, mesh,
                                          prepass_factor=4, max_samples=16,
                                          tile=64, scout_samples=32,
                                          bitfield=state.density_bitfield)
    for k in ("image", "depth", "aggregated_density", "weights_sum"):
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(single[k]), rtol=1e-5,
                                   atol=1e-5)
