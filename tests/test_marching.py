"""Occupancy-grid marching tests (reference raymarching.cu N4 equivalents)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.ops.marching import march_rays, composite_marched
from nerfsafetyvalidation_tpu.ops.ray_ops import packbits, morton3d
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.config import NetworkConfig


def make_bitfield(occupied_fn, grid_size=32, cascade=1):
    """Build a bitfield from a cell-occupancy predicate on [-1,1]^3 centers."""
    g = np.arange(grid_size)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    centers = 2.0 * (coords + 0.5) / grid_size - 1.0
    occ = occupied_fn(centers).astype(np.float32)
    grid = np.zeros((cascade, grid_size ** 3), dtype=np.float32)
    idx = np.asarray(morton3d(jnp.asarray(coords)))
    grid[0, idx] = occ * 100.0
    return packbits(jnp.asarray(grid), 0.5)


class TestMarchRays:
    def test_samples_land_in_occupied_region(self):
        gs = 32
        # occupied slab: z in [0.2, 0.5]
        bf = make_bitfield(lambda c: (c[:, 2] > 0.2) & (c[:, 2] < 0.5), gs)
        o = jnp.asarray([[0.0, 0.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        nears = jnp.asarray([1.0])
        fars = jnp.asarray([3.0])
        m = march_rays(o, d, nears, fars, bf, bound=1.0, cascade=1,
                       grid_size=gs, max_samples=32, max_steps=512)
        count = int(m["count"][0])
        assert count > 0
        pts = np.asarray(m["xyzs"][0][:count])
        # all samples inside (or within a cell of) the slab
        assert (pts[:, 2] > 0.1).all() and (pts[:, 2] < 0.6).all()

    def test_empty_grid_gives_no_samples(self):
        gs = 32
        bf = make_bitfield(lambda c: np.zeros(len(c), bool), gs)
        o = jnp.asarray([[0.0, 0.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        m = march_rays(o, d, jnp.asarray([1.0]), jnp.asarray([3.0]), bf,
                       bound=1.0, cascade=1, grid_size=gs, max_samples=32,
                       max_steps=512)
        assert int(m["count"][0]) == 0
        assert not bool(m["mask"].any())

    def test_deltas_positive_and_monotone_ts(self):
        gs = 32
        bf = make_bitfield(lambda c: np.ones(len(c), bool), gs)
        o = jnp.asarray([[0.0, 0.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        m = march_rays(o, d, jnp.asarray([1.0]), jnp.asarray([3.0]), bf,
                       bound=1.0, cascade=1, grid_size=gs, max_samples=16,
                       max_steps=512)
        count = int(m["count"][0])
        assert count == 16  # fully occupied -> fills all slots
        ts = np.asarray(m["ts"][0])
        assert (np.diff(ts) > 0).all()
        assert (np.asarray(m["deltas"][0]) > 0).all()

    def test_composite_marched_matches_dense(self):
        # against the plain compositing math on an all-valid mask
        rng = np.random.default_rng(0)
        N, K = 4, 16
        sig = jnp.asarray(rng.uniform(0, 5, (N, K)), dtype=jnp.float32)
        rgb = jnp.asarray(rng.uniform(0, 1, (N, K, 3)), dtype=jnp.float32)
        dt = jnp.full((N, K), 0.05)
        rs = dt
        ts = jnp.cumsum(dt, axis=-1)
        mask = jnp.ones((N, K), dtype=bool)
        res = composite_marched(sig, rgb, dt, rs, ts, mask,
                                jnp.zeros(N), jnp.ones(N))
        from nerfsafetyvalidation_tpu.ops.compositing import composite_weights
        w_ref, _ = composite_weights(sig, dt)
        np.testing.assert_allclose(np.asarray(res["weights"]),
                                   np.asarray(w_ref), rtol=1e-5)

    def test_masked_slots_contribute_nothing(self):
        N, K = 2, 8
        sig = jnp.full((N, K), 10.0)
        rgb = jnp.ones((N, K, 3))
        dt = jnp.full((N, K), 0.1)
        mask = jnp.zeros((N, K), dtype=bool).at[:, :2].set(True)
        res = composite_marched(sig, rgb, dt, dt, jnp.cumsum(dt, -1), mask,
                                jnp.zeros(N), jnp.ones(N))
        full = composite_marched(sig, rgb, dt, dt, jnp.cumsum(dt, -1),
                                 jnp.ones((N, K), bool),
                                 jnp.zeros(N), jnp.ones(N))
        assert float(res["weights_sum"][0]) < float(full["weights_sum"][0])


class TestRunGrid:
    def test_run_grid_end_to_end(self):
        cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0,
                            grid_size=32)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        state = R.RendererState.create(cfg.cascade, 32)
        state = R.update_extra_state(net, params, state, jax.random.PRNGKey(1),
                                     grid_size=32)
        rng = np.random.default_rng(2)
        o = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 3)), dtype=jnp.float32)
        dn = rng.normal(size=(8, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        res = R.run_grid(net, params, state, o, jnp.asarray(dn),
                         max_samples=16, max_steps=128)
        assert res["image"].shape == (8, 3)
        assert np.isfinite(np.asarray(res["image"])).all()
        assert res["sigmas"].shape == (8 * 16, 1)

    def test_run_grid_jittable(self):
        cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                            grid_size=16)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        state = R.RendererState.create(cfg.cascade, 16)
        f = jax.jit(lambda p, s, o, d: R.run_grid(net, p, s, o, d,
                                                  max_samples=8,
                                                  max_steps=64)["image"])
        o = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        img = f(params, state, o, d)
        assert img.shape == (4, 3)


class TestCompaction:
    def test_compact_roundtrip(self):
        from nerfsafetyvalidation_tpu.ops.marching import (
            compact_samples, gather_compacted, scatter_back)
        rng = np.random.default_rng(0)
        mask = jnp.asarray(rng.uniform(size=(8, 16)) > 0.7)
        vals = jnp.asarray(rng.normal(size=(8, 16, 3)), dtype=jnp.float32)
        budget = 64
        dest, kept, n = compact_samples(mask, budget)
        assert int(n) == int(np.asarray(mask).sum())
        comp = gather_compacted(vals, dest, budget)
        back = np.asarray(scatter_back(comp, dest, (8, 16)))
        expected = np.where(np.asarray(mask)[..., None], np.asarray(vals), 0.0)
        np.testing.assert_allclose(back, expected, rtol=1e-6)

    def test_compact_overflow_drops(self):
        from nerfsafetyvalidation_tpu.ops.marching import compact_samples
        mask = jnp.ones((4, 8), dtype=bool)
        dest, kept, n = compact_samples(mask, budget=16)
        assert int(np.asarray(kept).sum()) == 16
        assert int(n) == 32

    def test_run_grid_budget_matches_full(self):
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
        cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                            grid_size=16)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        state = R.RendererState.create(cfg.cascade, 16)
        state = R.update_extra_state(net, params, state,
                                     jax.random.PRNGKey(1), grid_size=16)
        o = jnp.zeros((8, 3)).at[:, 2].set(-2.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
        full = R.run_grid(net, params, state, o, d, max_samples=16,
                          max_steps=128)
        budg = R.run_grid(net, params, state, o, d, max_samples=16,
                          max_steps=128, sample_budget=8 * 16)
        np.testing.assert_allclose(np.asarray(full["image"]),
                                   np.asarray(budg["image"]),
                                   rtol=1e-3, atol=1e-4)


class TestSkipGrid:
    def test_skip_grid_distances(self):
        from nerfsafetyvalidation_tpu.ops.ray_ops import occupancy_to_skip_grid
        gs = 16
        # one occupied cell at (8, 8, 8)
        g = np.arange(gs)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
        occ = np.zeros((1, gs ** 3), dtype=bool)
        center_m = int(np.asarray(morton3d(jnp.asarray([[8, 8, 8]]))))
        occ[0, center_m] = True
        skip = np.asarray(occupancy_to_skip_grid(jnp.asarray(occ), gs))
        # occupied cell -> 0
        assert skip[0, center_m] == 0
        # cell at chebyshev distance 3
        m3 = int(np.asarray(morton3d(jnp.asarray([[11, 8, 8]]))))
        assert skip[0, m3] == 3
        m_diag = int(np.asarray(morton3d(jnp.asarray([[10, 10, 10]]))))
        assert skip[0, m_diag] == 2
        # far corner capped at max_skip
        m_far = int(np.asarray(morton3d(jnp.asarray([[0, 0, 0]]))))
        assert skip[0, m_far] == 8  # chebyshev distance exactly 8

    def test_march_with_skip_grid_matches_bitfield(self):
        from nerfsafetyvalidation_tpu.ops.ray_ops import occupancy_to_skip_grid
        gs = 32
        bf = make_bitfield(lambda c: (c[:, 2] > 0.2) & (c[:, 2] < 0.4), gs)
        # matching skip grid from the same occupancy
        g = np.arange(gs)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
        centers = 2.0 * (coords + 0.5) / gs - 1.0
        occ_xyz = (centers[:, 2] > 0.2) & (centers[:, 2] < 0.4)
        occ_m = np.zeros((1, gs ** 3), dtype=bool)
        occ_m[0, np.asarray(morton3d(jnp.asarray(coords)))] = occ_xyz
        skip = occupancy_to_skip_grid(jnp.asarray(occ_m), gs)

        o = jnp.asarray([[0.0, 0.0, -2.0], [0.3, -0.2, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        nears = jnp.asarray([1.0, 1.0])
        fars = jnp.asarray([3.0, 3.0])
        m_bf = march_rays(o, d, nears, fars, bf, 1.0, 1, gs,
                          max_samples=16, max_steps=512)
        m_sk = march_rays(o, d, nears, fars, bf, 1.0, 1, gs,
                          max_samples=16, max_steps=512, skip_grid=skip)
        # same number of occupied-region samples, all within the slab
        np.testing.assert_array_equal(np.asarray(m_bf["count"]),
                                      np.asarray(m_sk["count"]))
        cnt = int(m_sk["count"][0])
        pts = np.asarray(m_sk["xyzs"][0][:cnt])
        assert (pts[:, 2] > 0.1).all() and (pts[:, 2] < 0.5).all()


def test_render_grid_staged_contract():
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                        grid_size=16)
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = R.RendererState.create(cfg.cascade, 16)
    state = R.update_extra_state(net, params, state, jax.random.PRNGKey(1),
                                 grid_size=16)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 10, 3)), dtype=jnp.float32)
    dn = rng.normal(size=(1, 10, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    res = R.render_grid_staged(net, params, state, o, jnp.asarray(dn),
                               max_ray_batch=4, max_samples=8, max_steps=64)
    assert res["image"].shape == (1, 10, 3)
    assert res["depth"].shape == (1, 10)
    assert res["aggregated_density"].shape == (1, 10)
    # staged quirk preserved: per-sample extras from the last chunk
    assert res["rgbs"].shape == (4, 8, 3)
    assert res["sigmas"].shape == (4 * 8, 1)
    assert np.isfinite(np.asarray(res["image"])).all()


def test_samples_per_hit_two_matches_counts():
    gs = 32
    bf = make_bitfield(lambda c: (c[:, 2] > 0.0) & (c[:, 2] < 0.4), gs)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = jnp.asarray([1.0]), jnp.asarray([3.0])
    m1 = march_rays(o, d, nears, fars, bf, 1.0, 1, gs, max_samples=32,
                    max_steps=512, samples_per_hit=1)
    m2 = march_rays(o, d, nears, fars, bf, 1.0, 1, gs, max_samples=32,
                    max_steps=512, samples_per_hit=2)
    # paired emission covers the same region with a similar sample count
    c1, c2 = int(m1["count"][0]), int(m2["count"][0])
    assert abs(c1 - c2) <= max(2, c1 // 4)
    ts = np.asarray(m2["ts"][0][:c2])
    assert (np.diff(ts) > 0).all()
    assert (np.asarray(m2["deltas"][0][:c2]) > 0).all()
