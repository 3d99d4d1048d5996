"""Validation-layer tests: toy CEM/MC integration (the reference's de facto
test strategy, SURVEY.md §4), distributions, batched rollout engine, utils."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.validation.distributions import (
    SeedableMultivariateNormal, mvn_log_prob)
from nerfsafetyvalidation_tpu.validation.simulators.toy_simulator import ToySimulator
from nerfsafetyvalidation_tpu.validation.stresstests.cross_entropy import (
    CrossEntropyMethod, _weighted_mean_cov)
from nerfsafetyvalidation_tpu.validation.batched import BatchedRolloutEngine
from nerfsafetyvalidation_tpu.validation.utils.blender import (
    worldToIndex, indexToWorld, stateToGridCoord)
from nerfsafetyvalidation_tpu.validation.utils.paths import (
    calculate_steps, generate_path, save_coords, load_coords)
from nerfsafetyvalidation_tpu.validation.utils.sdf import (
    collision_map_from_density, sdf_from_collision_map)
from nerfsafetyvalidation_tpu.validation.utils.math import is_positive_definite


class TestDistributions:
    def test_log_prob_matches_scipy(self):
        from scipy.stats import multivariate_normal
        rng = np.random.default_rng(0)
        mean = rng.normal(size=4)
        A = rng.normal(size=(4, 4))
        cov = A @ A.T + 4 * np.eye(4)
        x = rng.normal(size=4)
        ours = float(mvn_log_prob(jnp.asarray(x), jnp.asarray(mean),
                                  jnp.asarray(cov)))
        ref = multivariate_normal(mean, cov).logpdf(x)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_seedable_reproducible(self):
        means = [jnp.zeros(12)] * 3
        covs = [jnp.eye(12) * 0.01] * 3
        d1 = SeedableMultivariateNormal(means, covs, noise_seed=7)
        d2 = SeedableMultivariateNormal(means, covs, noise_seed=7)
        s1 = d1.sample(5)
        s2 = d2.sample(5)
        for a, b in zip(s1, s2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # different simulation number -> different draw
        s3 = d1.sample(6)
        assert not np.allclose(np.asarray(s1[0]), np.asarray(s3[0]))

    def test_sample_statistics(self):
        means = [jnp.full(2, 3.0)]
        covs = [jnp.eye(2) * 0.25]
        d = SeedableMultivariateNormal(means, covs, noise_seed=0)
        draws = np.stack([np.asarray(d.sample(i)[0]) for i in range(500)])
        np.testing.assert_allclose(draws.mean(0), 3.0, atol=0.1)
        np.testing.assert_allclose(draws.std(0), 0.5, atol=0.1)


class TestToyCEM:
    """The reference runs CEM against ToySimulator at import
    (ToySimulator.py:21-36); here it is a proper integration test."""

    def test_cem_toy_converges_toward_goal(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        steps = 12
        means = [jnp.zeros(2)] * steps
        covs = [jnp.eye(2) * 0.25] * steps
        q = SeedableMultivariateNormal(means, covs, noise_seed=0)
        p = SeedableMultivariateNormal(means, covs, noise_seed=0)
        sim = ToySimulator(collision_threshold=10.0)
        cem = CrossEntropyMethod(sim, q, p, m=10, m_elite=3, kmax=5,
                                 noise_seed=0, blend_file=None,
                                 workspace=None)
        cem.TOY_PROBLEM = True
        means_out, covs_out, q_out, bm, bc, bv = cem.optimize()
        assert len(means_out) == steps
        # elite updates should push the mean step toward the goal direction
        total_drift = np.sum([np.asarray(m) for m in means_out], axis=0)
        assert total_drift[0] > 0 and total_drift[1] > 0

    def test_weighted_mean_cov_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(10, 3))
        w = rng.uniform(0.1, 1.0, size=10)
        mean, cov = _weighted_mean_cov(x, w)
        np.testing.assert_allclose(mean, np.average(x, axis=0, weights=w),
                                   rtol=1e-10)
        ref_cov = np.cov(x.T, aweights=w)
        np.testing.assert_allclose(cov, ref_cov, rtol=1e-8)


class TestBatchedRollouts:
    def make_engine(self, mesh=None):
        T = 10
        actions = np.tile(np.asarray([10.0, 0, 0, 0], dtype=np.float32),
                          (T, 1))
        # SDF: free space everywhere except a wall at x > 0.5
        g = 20
        xs = np.linspace(-1, 1, g)
        sdf = np.ones((g, g, g), dtype=np.float32)
        sdf[xs > 0.5] = 0.0
        start = np.zeros(12, dtype=np.float32)
        return BatchedRolloutEngine(
            actions=actions, dt=0.1, g=10.0, mass=1.0, I=np.eye(3),
            sdf=sdf, sdf_start=[-1, -1, -1], granularity=g / 2,
            noise_mean=np.zeros(12),
            noise_std=np.full(12, 0.05, dtype=np.float32),
            start_state=start, mesh=mesh)

    def test_monte_carlo_batch(self):
        eng = self.make_engine()
        out = eng.monte_carlo(jax.random.PRNGKey(0), n_sims=64)
        assert out["positions"].shape == (64, 10, 3)
        assert out["risk"].shape == (64,)
        assert 0.0 <= out["collision_rate"] <= 1.0
        assert np.isfinite(out["log_likelihoods"]).all()

    def test_collision_detected_when_pushed_into_wall(self):
        eng = self.make_engine()
        # drive everything toward +x hard
        noises = np.zeros((4, 10, 12), dtype=np.float32)
        noises[..., 0] = 0.2  # +0.2 m x-position disturbance per step
        out = eng.run(jnp.asarray(noises))
        assert bool(np.asarray(out["ever_collided"]).all())
        # post-collision states frozen: positions stop advancing
        pos = np.asarray(out["positions"])[0, :, 0]
        first = int(np.argmax(np.asarray(out["collided"])[0]))
        assert np.allclose(pos[first:], pos[first])

    def test_no_collision_in_free_space(self):
        eng = self.make_engine()
        noises = np.zeros((4, 10, 12), dtype=np.float32)
        out = eng.run(jnp.asarray(noises))
        assert not bool(np.asarray(out["ever_collided"]).any())

    def test_cem_batched(self):
        eng = self.make_engine()
        res = eng.cem(jax.random.PRNGKey(0), m=16, m_elite=4, kmax=2)
        assert res["means"].shape == (10, 12)
        assert res["covs"].shape == (10, 12, 12)
        assert (res["vars"] > 0).all() and (res["vars"] <= 0.1 + 1e-9).all()
        assert len(res["history"]) == 2

    def test_full_cov_sampling_statistics(self):
        """sample_noises(covs=...) draws from the FULL mvn (Cholesky), the
        torch MultivariateNormal equivalent."""
        eng = self.make_engine()
        T = eng.steps
        rng = np.random.default_rng(3)
        A = rng.normal(size=(12, 12)) * 0.05
        cov = A @ A.T + 0.01 * np.eye(12)
        covs = np.broadcast_to(cov, (T, 12, 12))
        means = np.tile(rng.normal(size=12).astype(np.float32), (T, 1))
        draws = np.asarray(eng.sample_noises(
            jax.random.PRNGKey(0), 20000, jnp.asarray(means),
            covs=jnp.asarray(covs)))
        emp = np.cov(draws[:, 0].T)
        np.testing.assert_allclose(emp, cov, atol=0.01)
        np.testing.assert_allclose(draws.mean(0), means, atol=0.02)

    def test_cem_proposal_update_matches_sequential(self):
        """_cem_proposal_update must reproduce the sequential port's elite
        update (cross_entropy.py:175-195 == reference CEM.py:211-262) step
        by step: full mvn importance weights, torch.cov aweights
        normalization, diagonal clamp."""
        from scipy.special import logsumexp
        from nerfsafetyvalidation_tpu.validation.batched import (
            _cem_proposal_update)
        rng = np.random.default_rng(7)
        E, T = 6, 4
        elite = rng.normal(0, 0.3, size=(E, T, 12))
        q_mean = rng.normal(0, 0.1, size=(T, 12))
        p_mean = np.zeros((T, 12))
        q_cov = np.broadcast_to(0.04 * np.eye(12), (T, 12, 12)).copy()
        p_cov = np.broadcast_to(0.09 * np.eye(12), (T, 12, 12)).copy()
        means, covs = _cem_proposal_update(elite, q_mean, q_cov,
                                           p_mean, p_cov)
        for t in range(T):
            log_w = np.asarray([
                float(mvn_log_prob(jnp.asarray(e), jnp.asarray(p_mean[t]),
                                   jnp.asarray(p_cov[t]))
                      - mvn_log_prob(jnp.asarray(e), jnp.asarray(q_mean[t]),
                                     jnp.asarray(q_cov[t])))
                for e in elite[:, t]])
            log_w = log_w - logsumexp(log_w)
            w = np.clip(np.exp(log_w), 1e-8, None)
            mean_ref, cov_ref = _weighted_mean_cov(elite[:, t], w)
            diag = np.clip(np.diag(cov_ref), 0.0, 0.1)
            np.testing.assert_allclose(means[t], mean_ref, rtol=1e-4,
                                       atol=1e-6)
            np.testing.assert_allclose(np.diag(covs[t]),
                                       np.maximum(diag, 1e-12), rtol=1e-4,
                                       atol=1e-6)
            # the batched proposal keeps only the clamped diagonal, exactly
            # like the sequential port (CEM.py:244-249)
            np.testing.assert_allclose(covs[t], np.diag(np.diag(covs[t])))

    def test_sharded_over_mesh(self):
        from nerfsafetyvalidation_tpu.parallel.mesh import get_mesh
        eng = self.make_engine(mesh=get_mesh())
        out = eng.monte_carlo(jax.random.PRNGKey(0), n_sims=64)
        ref = self.make_engine().monte_carlo(jax.random.PRNGKey(0), n_sims=64)
        np.testing.assert_allclose(out["risk"], ref["risk"], rtol=1e-5)


class TestUtils:
    def test_world_index_roundtrip(self):
        i = worldToIndex(0.35, -1.4, 40)
        w = indexToWorld(i, -1.4, 40)
        assert abs(w - 0.35) < 1 / 40
        assert stateToGridCoord(np.asarray([0.0, 0.0, 0.0])) == (10, 10, 10)

    def test_calculate_steps(self):
        assert calculate_steps([0, 0, 0], [0.9, 0, 0]) == 10

    def test_coords_roundtrip(self, tmp_path):
        p = str(tmp_path / "coords.json")
        save_coords([1, 2, 3], [4, 5, 6], 7, path=p)
        s, e, n = load_coords(p)
        assert s == [1, 2, 3] and e == [4, 5, 6] and n == 7

    def test_generate_path_in_bounds(self):
        s, e, n = generate_path([-1, 1], [-1, 1], [0, 0.5])
        assert -1 <= s[0] <= 1 and 0 <= s[2] <= 0.5
        assert n == calculate_steps(s, e)

    def test_sdf_pipeline(self):
        # ball of density at origin
        density = lambda pts: 100.0 * (np.linalg.norm(pts, axis=-1) < 0.3)
        cmap = collision_map_from_density(density, start=(-1, -1, -1),
                                          end=(1, 1, 1), granularity=10)
        assert cmap.any() and not cmap.all()
        sdf = sdf_from_collision_map(cmap, granularity=10)
        assert sdf.min() == 0.0
        assert sdf.max() > 0.3  # corners are far from the ball

    def test_is_positive_definite(self):
        assert is_positive_definite(jnp.eye(3))
        assert not is_positive_definite(jnp.asarray([[1.0, 2.0], [2.0, 1.0]]))


class TestReplayCounts:
    def test_confusion_matrix_written(self, tmp_path):
        from nerfsafetyvalidation_tpu.validation.replay import (
            createConfusionMatrix)
        createConfusionMatrix(1, 2, 3, 4, "unit", out_dir=str(tmp_path))
        assert os.path.exists(tmp_path / "confusion_matrix_unit.png")


def test_weighted_mean_cov_degenerate_single_weight():
    """One elite carrying all mass must not emit NaN/inf covariance
    (VERDICT r1 weak #5; reference torch.cov degenerates to NaN there)."""
    from nerfsafetyvalidation_tpu.validation.stresstests.cross_entropy import (
        _weighted_mean_cov)

    samples = np.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    weights = np.asarray([0.0, 1.0, 0.0])
    with np.errstate(all="raise"):
        mean, cov = _weighted_mean_cov(samples, weights)
    assert np.isfinite(mean).all() and np.isfinite(cov).all()
    np.testing.assert_allclose(mean, [3.0, 4.0])


def test_full_engine_uq_degenerate_density_finite():
    """A density-collapsed NeRF (S_c2d2 ~ 0) must not poison the batched
    rollout with NaN sigma/reward (found by the validate.py --batched
    TPU drive on a collapsed checkpoint)."""
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)

    eng = FullBatchedRolloutEngine.__new__(FullBatchedRolloutEngine)
    eng.uq_iters = 50
    eng.uq_lr = 1e-2
    rgbs = jnp.full((16, 4, 3), 0.5)
    sigmas = jnp.zeros((16, 4))
    image = jnp.ones((16, 3))
    mu, sd = eng._gaussian_uq(rgbs, sigmas, image)
    assert np.isfinite(float(mu)) and np.isfinite(float(sd))


def test_full_engine_uq_from_moments_matches_direct():
    """_gaussian_uq_from_moments must equal _gaussian_uq when fed the
    moments of the same sample set (the frame renderers compute these
    in-pass so reference-size observations never materialize rgbs/sigmas)."""
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)

    eng = FullBatchedRolloutEngine.__new__(FullBatchedRolloutEngine)
    eng.uq_iters = 50
    eng.uq_lr = 1e-2
    rng = np.random.default_rng(3)
    rgbs = jnp.asarray(rng.uniform(0, 1, (16, 4, 3)), jnp.float32)
    sigmas = jnp.asarray(rng.uniform(0, 5, (16, 4)), jnp.float32)
    image = jnp.asarray(rng.uniform(0, 1, (16, 3)), jnp.float32)
    mu0, sd0 = eng._gaussian_uq(rgbs, sigmas, image)
    cd = rgbs * sigmas[..., None]
    mom = jnp.stack([jnp.sum(cd * cd), jnp.sum(cd), jnp.sum(sigmas),
                     jnp.sum(sigmas ** 2)])
    mu1, sd1 = eng._gaussian_uq_from_moments(mom, image, float(16 * 4))
    np.testing.assert_allclose(float(mu1), float(mu0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(sd1), float(sd0), rtol=1e-5, atol=1e-6)


def test_full_engine_obs_render_frame_paths():
    """obs_render='fast'/'guided' run the marched frame renderers with
    in-pass UQ moments inside the scan — the reference-obs-size scaling
    path (VERDICT r2 item 2). Smoke: finite UQ/reward, identical dynamics
    across obs paths (the render only feeds the reward)."""
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.ops.ray_ops import (packbits, morton3d,
                                                      occupancy_to_skip_grid)
    from nerfsafetyvalidation_tpu.validation.batched import (
        FullBatchedRolloutEngine)

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
    grid[0, np.asarray(morton3d(jnp.asarray(coords)))] = occ.ravel()
    gridj = jnp.asarray(grid)
    state = R.RendererState(gridj, packbits(gridj, 0.5), jnp.asarray(1.0),
                            jnp.asarray(1),
                            occupancy_to_skip_grid(gridj > 0.5, H))

    kw = dict(
        actions=np.tile(np.asarray([10.2, 0.01, 0.0, 0.0], np.float32),
                        (2, 1)),
        dt=0.1, g=10.0, mass=1.0, I=np.eye(3, dtype=np.float32),
        sdf=np.full((96, 92, 24), 1.0, np.float32),
        sdf_start=[-1.4, -1.3, -0.1], granularity=40,
        noise_mean=np.zeros(12, np.float32),
        noise_std=np.full(12, 0.01, np.float32),
        start_state=np.concatenate([
            np.asarray([-0.5, -0.5, 0.1]), np.zeros(9)]).astype(np.float32),
        net=net, params=params, obs_res=16, grid_max_samples=8,
        base_intrinsics=(10.0, 10.0, 8.0, 8.0), base_res=16,
        renderer_state=state)
    z = np.random.default_rng(5).normal(size=(2, 2, 12)).astype(np.float32)

    outs = {}
    for mode in ("fast", "guided", "scout"):
        eng = FullBatchedRolloutEngine(obs_render=mode,
                                       obs_prepass_factor=4, **kw)
        out = eng.run(z)
        sig = np.asarray(out["sigma_d"])
        rew = np.asarray(out["reward"])
        assert sig.shape == (2, 2) and np.all(np.isfinite(sig))
        assert np.all(sig >= 0) and np.all(np.isfinite(rew))
        outs[mode] = out

    # the obs path feeds only the reward; dynamics/SDF must be identical
    np.testing.assert_allclose(np.asarray(outs["fast"]["positions"]),
                               np.asarray(outs["guided"]["positions"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(outs["fast"]["positions"]),
                               np.asarray(outs["scout"]["positions"]),
                               rtol=1e-6, atol=1e-7)

    # renderer_state is required for the frame paths
    import pytest as _pytest
    with _pytest.raises(ValueError):
        FullBatchedRolloutEngine(obs_render="fast",
                                 **{**kw, "renderer_state": None})
