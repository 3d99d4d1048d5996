"""Tests for the navigation stack (reference L4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.nav.math_utils import (
    vec_to_rot_matrix, rot_matrix_to_vec, skew_matrix, next_rotation,
    mahalanobis, nearestPD, isPD, calcSE3Err, rot_x)
from nerfsafetyvalidation_tpu.nav.agent import Agent, drone_dynamics
from nerfsafetyvalidation_tpu.nav.astar import astar
from nerfsafetyvalidation_tpu.nav.planner import Planner
from nerfsafetyvalidation_tpu.nav.camera import CannedCamera
from nerfsafetyvalidation_tpu.nav.estimator import Estimator, find_POI


class TestRotations:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        vecs = jnp.asarray(rng.normal(size=(16, 3)) * 0.5, dtype=jnp.float32)
        R = vec_to_rot_matrix(vecs)
        back = rot_matrix_to_vec(R)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vecs),
                                   rtol=1e-3, atol=1e-5)

    def test_rotation_orthonormal(self):
        v = jnp.asarray([0.3, -0.2, 0.9])
        R = np.asarray(vec_to_rot_matrix(v))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-5)

    def test_zero_vec(self):
        R = np.asarray(vec_to_rot_matrix(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        v = np.asarray(rot_matrix_to_vec(jnp.eye(3)))
        np.testing.assert_allclose(v, 0.0, atol=1e-5)

    def test_skew(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        S = np.asarray(skew_matrix(v))
        a = np.asarray([0.5, -1.0, 2.0])
        np.testing.assert_allclose(S @ a, np.cross([1, 2, 3], a), rtol=1e-6)

    def test_next_rotation_zero_omega(self):
        R = np.asarray(next_rotation(jnp.eye(3), jnp.zeros(3), 0.1))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_next_rotation_jittable(self):
        f = jax.jit(lambda R, w: next_rotation(R, w, 0.1))
        out = np.asarray(f(jnp.eye(3), jnp.asarray([0.0, 0.0, 1.0])))
        expected = np.asarray(vec_to_rot_matrix(jnp.asarray([0.0, 0.0, 0.1])))
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_mahalanobis(self):
        u = jnp.asarray([1.0, 0.0])
        v = jnp.asarray([0.0, 0.0])
        cov = jnp.eye(2) * 4.0
        np.testing.assert_allclose(float(mahalanobis(u, v, cov)), 0.25,
                                   rtol=1e-5)

    def test_nearest_pd(self):
        A = np.asarray([[1.0, 2.0], [0.0, -3.0]])
        B = nearestPD(A)
        assert isPD(B)

    def test_se3_err(self):
        T = np.eye(4)
        T2 = np.eye(4)
        T2[:3, 3] = [1, 0, 0]
        t_err, ang = calcSE3Err(T, T2)
        np.testing.assert_allclose(t_err, 1.0)
        np.testing.assert_allclose(ang, 0.0, atol=1e-4)


class TestDynamics:
    def setup_method(self):
        self.I = jnp.eye(3)
        self.args = dict(dt=0.1, g=10.0, mass=1.0, I=self.I,
                         invI=jnp.linalg.inv(self.I))

    def test_hover(self):
        # thrust = m*g exactly cancels gravity: state unchanged (zero vel)
        state = jnp.zeros(12)
        action = jnp.asarray([10.0, 0.0, 0.0, 0.0])
        nxt = np.asarray(drone_dynamics(state, action, **self.args))
        np.testing.assert_allclose(nxt, np.zeros(12), atol=1e-6)

    def test_freefall(self):
        state = jnp.zeros(12)
        action = jnp.zeros(4)
        nxt = np.asarray(drone_dynamics(state, action, **self.args))
        np.testing.assert_allclose(nxt[5], -1.0, rtol=1e-5)  # vz = -g*dt

    def test_jacobian_12x12(self):
        state = jnp.asarray(np.random.default_rng(0).normal(size=12) * 0.1,
                            dtype=jnp.float32)
        action = jnp.asarray([10.0, 0.01, 0.0, 0.0])
        A = jax.jacfwd(lambda x: drone_dynamics(x, action, **self.args))(state)
        assert A.shape == (12, 12)
        assert np.isfinite(np.asarray(A)).all()

    def test_vmap_over_noise_population(self):
        state = jnp.zeros(12)
        action = jnp.asarray([10.0, 0.0, 0.0, 0.0])
        noises = jnp.asarray(np.random.default_rng(1).normal(size=(32, 12)),
                             dtype=jnp.float32) * 0.01
        step = lambda n: drone_dynamics(state, action, **self.args) + n
        out = jax.vmap(step)(noises)
        assert out.shape == (32, 12)

    def test_agent_step_with_canned_camera(self):
        cam = CannedCamera(res_x=32, res_y=32)
        agent_cfg = {"x0": np.zeros(12), "dt": 0.1, "g": 10.0, "mass": 1.0,
                     "I": np.eye(3).tolist()}
        camera_cfg = {"res_x": 32, "res_y": 32, "trans": True, "mode": "RGBA",
                      "path": "./sim_img_cache"}
        agent = Agent(agent_cfg, camera_cfg, camera=cam)
        pose, state, img = agent.step(jnp.asarray([10.0, 0, 0, 0]),
                                      noise=jnp.full(12, 0.01))
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(state, 0.01, atol=1e-5)
        assert img.shape == (32, 32, 3)
        assert len(agent.states_history) == 2


def test_astar_simple():
    occ = np.zeros((8, 8, 8), dtype=bool)
    occ[4, :, :] = True
    occ[4, 0, 0] = False  # one hole
    path = astar(occ, (0, 0, 0), (7, 0, 0))
    assert path[0] == (0, 0, 0) and path[-1] == (7, 0, 0)
    assert (4, 0, 0) in path
    # adjacent steps
    for a, b in zip(path[:-1], path[1:]):
        assert sum(abs(x - y) for x, y in zip(a, b)) == 1


def test_astar_no_path_raises():
    occ = np.zeros((4, 4, 4), dtype=bool)
    occ[2, :, :] = True
    with pytest.raises(ValueError):
        astar(occ, (0, 0, 0), (3, 0, 0))


class TestPlanner:
    def make_planner(self, steps=6):
        cfg = {"T_final": 2.0, "steps": steps, "lr": 1e-3, "epochs_init": 20,
               "epochs_update": 10, "fade_out_epoch": 0,
               "fade_out_sharpness": 10, "mass": 1.0, "I": np.eye(3),
               "g": 10.0, "body": np.asarray([[-0.05, 0.05], [-0.05, 0.05],
                                              [-0.02, 0.02]]),
               "nbins": [4, 4, 2]}
        # a density bump at the origin
        density_fn = lambda x: 50.0 * jnp.exp(
            -jnp.sum(x ** 2, axis=-1) / 0.05)
        start = np.zeros(18, dtype=np.float32)
        start[:3] = [-0.7, -0.7, 0.1]
        start[6:15] = np.eye(3).reshape(-1)
        end = np.zeros(18, dtype=np.float32)
        end[:3] = [0.7, 0.7, 0.1]
        end[6:15] = np.eye(3).reshape(-1)
        return Planner(jnp.asarray(start), jnp.asarray(end), cfg, density_fn)

    def test_calc_everything_shapes(self):
        p = self.make_planner(steps=6)
        pos, vel, accel, rot, omega, aaccel, actions = p.calc_everything()
        S = 7  # steps + 1
        assert pos.shape == (S, 3)
        assert vel.shape == (S, 3)
        assert rot.shape == (S, 3, 3)
        assert actions.shape == (S, 4)
        # boundary conditions pinned
        np.testing.assert_allclose(np.asarray(pos[0]), [-0.7, -0.7, 0.1],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pos[-1]), [0.7, 0.7, 0.1],
                                   atol=1e-5)

    def test_a_star_init_then_learn(self, tmp_path):
        p = self.make_planner()
        p.a_star_init(side=20, kernel_size=5)
        assert p.states.shape[0] >= 3
        c0 = float(p.total_cost())
        p.learn_init()
        c1 = float(p.total_cost())
        assert np.isfinite(c1)
        assert c1 <= c0 * 1.5  # should not blow up; typically decreases

    def test_mpc_interface(self):
        p = self.make_planner()
        a = p.get_next_action()
        assert a.shape == (4,)
        n_states = p.states.shape[0]
        full = p.get_full_states()
        meas = np.asarray(full[1])
        p.update_state(jnp.asarray(meas))
        assert p.states.shape[0] == n_states - 1

    def test_save_poses_costs(self, tmp_path):
        p = self.make_planner()
        p.save_poses(tmp_path / "poses.json")
        p.save_costs(tmp_path / "costs.json")
        import json
        with open(tmp_path / "poses.json") as f:
            poses = json.load(f)["poses"]
        assert len(poses) == 7


class TestEstimator:
    def test_find_poi_on_textured_image(self):
        rng = np.random.default_rng(0)
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        xy, extras = find_POI(img)
        assert xy.ndim == 2 and xy.shape[1] == 2

    def make_estimator(self):
        from nerfsafetyvalidation_tpu.data.rays import get_rays

        H = W = 16
        intr = (20.0, 20.0, 8.0, 8.0)

        def get_rays_fn(pose):
            return get_rays(pose, intr, H, W)

        def render_fn(rays_o, rays_d):
            # fake differentiable renderer: shade by ray direction
            img = 0.5 + 0.5 * rays_d.reshape(-1, 3)
            return {"image": img}

        class FakeAgent:
            def drone_dynamics(self, x, a):
                return drone_dynamics(x, a, 0.1, 10.0, 1.0, jnp.eye(3),
                                      jnp.eye(3))

        cfg = {"dil_iter": 2, "kernel_size": 3, "batch_size": 64,
               "lrate": 1e-3, "N_iter": 5, "render_viz": False,
               "show_rate": [20, 100], "sig0": np.eye(12),
               "Q": np.eye(12)}
        start = jnp.zeros(12)
        return Estimator(cfg, FakeAgent(), start, get_rays_fn=get_rays_fn,
                         render_fn=render_fn), H, W

    def test_estimate_state_runs(self):
        est, H, W = self.make_estimator()
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        xt = est.estimate_state(img, None, jnp.asarray([10.0, 0, 0, 0]))
        assert xt.shape == (12,)
        assert np.isfinite(np.asarray(xt)).all()
        assert np.isfinite(np.asarray(est.sig)).all()

    def test_measurement_fn_differentiable(self):
        est, H, W = self.make_estimator()
        target = jnp.full((H, W, 3), 0.5)
        batch = jnp.asarray(np.random.default_rng(0).integers(0, H, (16, 2)),
                            dtype=jnp.int32)
        g = jax.grad(lambda s: est.measurement_fn(
            s, jnp.zeros(12), jnp.eye(12), target, batch))(jnp.zeros(12) + 0.01)
        assert np.isfinite(np.asarray(g)).all()


def test_planner_fixed_horizon_keeps_shapes_and_converges():
    """fixed_horizon MPC mode: update_state preserves the decision shape
    (no recompile per step) and replans still pull the trajectory toward
    the goal."""
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.nav.planner import Planner
    from nerfsafetyvalidation_tpu.nav.math_utils import vec_to_rot_matrix

    sp = jnp.asarray([-0.5, -0.5, 0.1])
    ep = jnp.asarray([0.5, 0.5, 0.1])
    R0 = vec_to_rot_matrix(jnp.zeros(3)).reshape(-1)
    z3 = jnp.zeros(3)
    start = jnp.concatenate([sp, z3, R0, z3])
    end = jnp.concatenate([ep, z3, R0, z3])
    cfg = {"T_final": 2.0, "steps": 6, "lr": 1e-2, "epochs_init": 10,
           "epochs_update": 5, "fade_out_epoch": 0,
           "fade_out_sharpness": 10, "mass": 1.0, "g": 10.0,
           "I": np.eye(3).tolist(),
           "body": np.asarray([[-0.05, 0.05]] * 3), "nbins": [2, 2, 2],
           "fixed_horizon": True}

    def density_fn(x):
        return jnp.zeros(x.shape[:-1])

    p = Planner(start, end, cfg, density_fn)
    p.basefolder = None
    p.learn_init()
    shape0 = p.states.shape
    block0 = p._opt_block
    for _ in range(3):
        a = p.get_next_action()
        full = p.get_full_states()[0]
        p.update_state(full)
        p.learn_update(1)
    assert p.states.shape == shape0            # constant knots
    assert p._opt_block is block0              # SAME compiled block
    # trajectory end stays pinned at the goal
    pos = np.asarray(p.get_full_states()[:, :3])
    assert np.linalg.norm(pos[-1] - np.asarray(ep)) < 0.2
