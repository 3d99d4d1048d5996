"""render_frame_fast (two-phase sorted march + bucketed shading) parity and
phased-march equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.ops.marching import march_rays
from nerfsafetyvalidation_tpu.ops.ray_ops import (packbits,
                                                  occupancy_to_skip_grid,
                                                  morton3d,
                                                  near_far_from_aabb)


@pytest.fixture(scope="module")
def scene():
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                        grid_ray=True)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    H = cfg.grid_size
    g = np.arange(H)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * (np.stack([xx, yy, zz], -1) + 0.5) / H - 1.0
    occ = (np.linalg.norm(c, axis=-1) < 0.4).astype(np.float32) * 100
    grid = np.zeros((cfg.cascade, H ** 3), np.float32)
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    idx = np.asarray(morton3d(jnp.asarray(coords)))
    grid[0, idx] = occ.ravel()
    gridj = jnp.asarray(grid)
    state = R.RendererState(gridj, packbits(gridj, 0.5), jnp.asarray(1.0),
                            jnp.asarray(1),
                            occupancy_to_skip_grid(gridj > 0.5, H))
    rng = np.random.default_rng(0)
    n = 256
    ro = jnp.asarray(np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                               np.full(n, -2.5)], -1), jnp.float32)
    d = np.stack([rng.normal(0, 0.1, n), rng.normal(0, 0.1, n),
                  np.ones(n)], -1)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                     jnp.float32)
    return net, params, state, ro, rd


@pytest.mark.parametrize("dt_gamma", [0.0, 1.0 / 64])
def test_fast_path_matches_run_grid(scene, dt_gamma):
    net, params, state, ro, rd = scene
    R._FRAME_FAST_CACHE.clear()
    out = R.render_frame_fast(net, params, state, ro, rd, tile=64,
                              max_samples=16, max_steps=64, march_tile=32,
                              dt_gamma=dt_gamma)
    ref = R.run_grid(net, params, state, ro, rd, max_samples=16,
                     max_steps=64, samples_per_hit=2, bg_color=1.0,
                     dt_gamma=dt_gamma)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["aggregated_density"]),
                               np.asarray(ref["aggregated_density"]),
                               rtol=1e-3, atol=1e-4)


def test_phased_march_equals_single_while_loop(scene):
    """fixed_iters phase + resume_carry must land exactly where one
    while_loop lands (for rays finishing within the caps)."""
    net, params, state, ro, rd = scene
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(ro, rd, aabb, 0.2)
    kw = dict(bound=1.0, cascade=1, grid_size=128, max_samples=16,
              max_steps=64, skip_grid=state.skip_grid, samples_per_hit=2)
    ref = march_rays(ro, rd, nears, fars, state.density_bitfield, **kw)
    _, carry = march_rays(ro, rd, nears, fars, state.density_bitfield,
                          fixed_iters=7, return_carry=True, **kw)
    res = march_rays(ro, rd, nears, fars, state.density_bitfield,
                     resume_carry=carry, **kw)
    np.testing.assert_array_equal(np.asarray(ref["count"]),
                                  np.asarray(res["count"]))
    np.testing.assert_allclose(np.asarray(ref["ts"]), np.asarray(res["ts"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref["rs"]), np.asarray(res["rs"]),
                               rtol=1e-5, atol=1e-6)


def test_fast_path_sky_only_is_background(scene):
    net, params, state, ro, rd = scene
    # rays pointing away from the scene: pure background
    out = R.render_frame_fast(net, params, state,
                              ro + jnp.asarray([0.0, 0.0, -1.0]),
                              -rd, tile=64, max_samples=16, max_steps=64)
    np.testing.assert_allclose(np.asarray(out["image"]), 1.0, atol=1e-6)


def test_fast_path_uq_moments(scene):
    """return_moments: the in-pass Gaussian-UQ sample moments must equal
    the moments computed from the march's own masked sigmas/rgbs (the
    sums the batched engine's UQ consumes at reference obs sizes)."""
    net, params, state, ro, rd = scene
    R._FRAME_FAST_CACHE.clear()
    out = R.render_frame_fast(net, params, state, ro, rd, tile=64,
                              max_samples=16, max_steps=64, march_tile=32,
                              return_moments=True)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(ro, rd, aabb, net.cfg.min_near)
    m = march_rays(ro, rd, nears, fars, state.density_bitfield,
                   bound=1.0, cascade=1, grid_size=128, max_samples=16,
                   max_steps=64, skip_grid=state.skip_grid,
                   samples_per_hit=2)
    n = ro.shape[0]
    sig, rgb = net.apply(params, m["xyzs"].reshape(-1, 3),
                         jnp.broadcast_to(rd[:, None, :],
                                          (n, 16, 3)).reshape(-1, 3))
    sig = jnp.where(m["mask"], sig.reshape(n, 16), 0.0)
    cd = rgb.reshape(n, 16, 3) * sig[..., None]
    ref = np.asarray(jnp.stack([jnp.sum(cd * cd), jnp.sum(cd),
                                jnp.sum(sig), jnp.sum(sig ** 2)]))
    np.testing.assert_allclose(np.asarray(out["uq_moments"]), ref,
                               rtol=1e-3, atol=1e-4)


def test_cached_frame_render_inside_two_outer_traces(scene):
    """Regression (round-3 tunnel capture): render_frame_fast's cached jit
    closure must not capture arrays created during an OUTER trace. First
    call traced inside scan A created `aabb` as a tracer; a later scan B
    with the same inner cache key reused the closure and hit
    UnexpectedTracerError (scripts/bench_batched_obs.py at obs 200^2,
    where both engines' marched prepasses pad to the same N=1024)."""
    net, params, state, ro, rd = scene
    R._FRAME_FAST_CACHE.clear()

    def frame(o, d):
        return R.render_frame_fast(net, params, state, o, d, tile=64,
                                   max_samples=8, max_steps=32,
                                   march_tile=32)["image"]

    def outer_a(o, d):
        img, _ = jax.lax.scan(lambda c, _: (frame(o, d), None), ro * 0,
                              None, length=1)
        return img

    def outer_b(o, d):
        img, _ = jax.lax.scan(lambda c, _: (frame(o, d) + 1.0, None),
                              ro * 0, None, length=1)
        return img

    a = jax.jit(outer_a)(ro, rd)       # traces frame inside outer trace A
    b = jax.jit(outer_b)(ro, rd)       # cache hit inside a DIFFERENT trace
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0,
                               rtol=1e-5, atol=1e-5)
