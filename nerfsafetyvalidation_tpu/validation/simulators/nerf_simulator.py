"""NeRF-surrogate safety-validation simulator.

Parity target: reference validation/simulators/NerfSimulator.py — full
plan->act->render->UQ->estimate->replan->SDF-collision loop (:66-155),
safety-masked reward (:159-181), workspace/pose-cache management in reset
(:183-248), hard-coded SDF grid constants (:55-62).

The observation camera is pluggable (nav/camera.py): BlenderCamera keeps the
reference's external-process semantics; NerfCamera runs the whole loop on
TPU with the NeRF as the camera (hermetic mode).
"""

import os
import pathlib
import shutil
from copy import deepcopy

import numpy as np
import jax.numpy as jnp

from ...nav import Estimator, Agent, Planner, vec_to_rot_matrix, rot_matrix_to_vec
from ...utils.seeding import seed_everything
from ...uq.orchestrator import uncertainty
from ..utils.files import cache_poses, restore_poses
from ..utils.blender import worldToIndex
from .base import Env, disturbance_action_space, rgb_observation_space


class NerfSimulator(Env):
    """Safety-validation environment over the NeRF surrogate."""

    def __init__(self, start_state, end_state, agent_cfg, planner_cfg,
                 camera_cfg, filter_cfg, get_rays_fn, render_fn, blender_cfg,
                 density_fn, uq_method, net, params, seed, camera=None,
                 sdf_path="validation/utils/sdf.npy", sdf=None,
                 uq_kwargs=None, render_batch_fn=None):
        super().__init__()
        self.action_space = disturbance_action_space()
        self.observation_space = rgb_observation_space(
            camera_cfg.get("res_y", 800), camera_cfg.get("res_x", 800))
        self.planner_cfg = planner_cfg
        self.start_state = jnp.asarray(start_state, dtype=jnp.float32)
        self.end_state = jnp.asarray(end_state, dtype=jnp.float32)
        self.density_fn = density_fn
        self.camera_cfg = camera_cfg
        self.filter_cfg = filter_cfg
        self.blender_cfg = blender_cfg
        self.get_rays_fn = get_rays_fn
        self.render_fn = render_fn
        self.render_batch_fn = render_batch_fn
        self.uq_method = uq_method
        self.uq_kwargs = uq_kwargs or {}
        self.net = net
        self.params = params
        self.camera = camera

        # 18-vector (rot matrix) -> 12-vector (rot vec) (NerfSimulator.py:40-44)
        agent_cfg = dict(agent_cfg)
        agent_cfg["x0"] = jnp.concatenate([
            self.start_state[:6],
            rot_matrix_to_vec(self.start_state[6:15].reshape((3, 3))),
            self.start_state[15:]], axis=-1)
        agent_cfg["dt"] = planner_cfg["T_final"] / planner_cfg["steps"]
        self.agent_cfg = agent_cfg
        self.true_start_state = agent_cfg["x0"]
        self.true_states = np.asarray(self.true_start_state)[None]
        self.current_state = None
        self.dynamics = None
        self.filter = None
        self.traj = None
        self.steps = 0
        self.iter = 0

        # collision grid constants (NerfSimulator.py:55-62)
        self.GRANULARITY = 40
        self.START_X = -1.4
        self.END_X = 1.0
        self.START_Y = -1.3
        self.END_Y = 1.0
        self.START_Z = -0.1
        self.END_Z = 0.5
        if sdf is not None:
            self.sdf = np.asarray(sdf)
        elif os.path.exists(sdf_path):
            self.sdf = np.load(sdf_path)
        else:
            raise FileNotFoundError(
                f"SDF grid not found at {sdf_path}; build one with "
                "validation.utils.sdf.build_sdf")
        self.seed = seed
        self.res_x = camera_cfg.get("res_x", 800)
        self.res_y = camera_cfg.get("res_y", 800)

    # ------------------------------------------------------------------ step
    def step(self, disturbance, num_interpolated_points: int = 4):
        """One validated MPC step (NerfSimulator.py:66-155). Returns
        (collided, collisionVal, position[3], sigma, trace)."""
        action = np.asarray(self.traj.get_next_action())

        true_pose, true_state, gt_img = self.dynamics.step(
            action, noise=jnp.asarray(disturbance, dtype=jnp.float32))
        self.current_state = true_state
        self.true_states = np.vstack((self.true_states, true_state))

        # linear interpolation on states (NerfSimulator.py:93-98)
        x = np.arange(self.true_states.shape[0])
        xnew = np.linspace(x.min(), x.max(),
                           self.true_states.shape[0] * num_interpolated_points)
        interp = np.empty((xnew.shape[0], self.true_states.shape[1]))
        for i in range(self.true_states.shape[1]):
            interp[:, i] = np.interp(xnew, x, self.true_states[:, i])

        nerf_image = self.filter.render_from_pose(jnp.asarray(true_pose))
        nerf_image = np.asarray(nerf_image).reshape((self.res_y, self.res_x, -1))
        nerf_image_u8 = (nerf_image * 255).astype(np.uint8)

        # online uncertainty (NerfSimulator.py:110)
        trace, sigma = uncertainty(
            self.uq_method,
            rendered_output=self.filter.render_for_uncertainty(
                jnp.asarray(true_pose)),
            net=self.net, params=self.params, lr=self.filter.lrate,
            H=self.res_y, W=self.res_x, **self.uq_kwargs)

        os.makedirs("./sim_img_cache", exist_ok=True)
        try:
            import matplotlib.image
            matplotlib.image.imsave("./sim_img_cache/blenderRender.png",
                                    np.asarray(gt_img))
            matplotlib.image.imsave("./sim_img_cache/NeRFRender.png",
                                    nerf_image_u8)
        except Exception:
            pass

        state_est = self.filter.estimate_state(nerf_image_u8, true_pose, action)
        state_est = jnp.concatenate([
            state_est[:6], vec_to_rot_matrix(state_est[6:9]).reshape(-1),
            state_est[9:]], axis=-1)
        self.traj.update_state(state_est)
        self.traj.learn_update(self.iter)

        collisionVal = 9999
        collided = False
        for current_state in interp[-num_interpolated_points:]:
            try:
                xi = worldToIndex(current_state[0], self.START_X, self.GRANULARITY)
                yi = worldToIndex(current_state[1], self.START_Y, self.GRANULARITY)
                zi = worldToIndex(current_state[2], self.START_Z, self.GRANULARITY)
                if xi < 0 or yi < 0 or zi < 0:
                    raise IndexError
                collisionVal = self.sdf[xi, yi, zi]
                collided = collisionVal < (1 / self.GRANULARITY)
            except IndexError:
                print(f"We are out of bounds with current state {current_state}")
                collided = False
            if collided:
                print(f"Drone collided in state {current_state}")
                return collided, collisionVal, current_state[:3], sigma, trace
        self.iter += 1
        return collided, collisionVal, current_state[:3], sigma, trace

    # ---------------------------------------------------------------- reward
    def reward(self, likelihood, sigma_d_opt, trace=None):
        """Safety-masked reward (NerfSimulator.py:159-181)."""
        penalty_strength = 36.0
        num_perturbations = 3
        if self.uq_method == "Gaussian Approximation":
            return np.clip(likelihood - penalty_strength * sigma_d_opt,
                           -penalty_strength * 2, penalty_strength)
        elif self.uq_method == "Bayesian Laplace Approximation":
            return np.clip(
                likelihood - penalty_strength * sigma_d_opt * trace
                * num_perturbations, -penalty_strength * 2, penalty_strength)
        raise ValueError(f"unknown uq_method {self.uq_method}")

    # ----------------------------------------------------------------- reset
    def reset(self):
        """NerfSimulator.py:183-223."""
        self.basefolder = "paths" / pathlib.Path(self.planner_cfg["exp_name"])
        cache_flag = os.path.exists(
            self.basefolder / pathlib.Path("init_poses") / "0.json")
        self.clear_workspace()
        seed_everything(self.seed)
        self.iter = 0
        self.true_states = np.asarray(self.true_start_state)[None]

        self.dynamics = Agent(self.agent_cfg, self.camera_cfg,
                              self.blender_cfg, camera=self.camera)
        self.filter = Estimator(self.filter_cfg, self.dynamics,
                                self.true_start_state,
                                get_rays_fn=self.get_rays_fn,
                                render_fn=self.render_fn,
                                render_batch_fn=self.render_batch_fn)
        traj = Planner(self.start_state, self.end_state, self.planner_cfg,
                       self.density_fn)
        traj.basefolder = self.basefolder
        self.filter.basefolder = self.basefolder

        traj.a_star_init()  # raises ValueError when no path exists

        if not cache_flag:
            traj.learn_init()
            exp = pathlib.Path(self.planner_cfg["exp_name"])
            cache_poses("paths" / exp / "init_poses",
                        "paths" / exp / "init_costs", "cached" / exp)
        else:
            exp = pathlib.Path(self.planner_cfg["exp_name"])
            restore_poses("cached" / exp / "poses", "cached" / exp / "costs",
                          "paths" / exp)

        self.traj = traj
        self.steps = int(traj.get_actions().shape[0])

    def clear_workspace(self):
        """NerfSimulator.py:226-248."""
        if self.basefolder.exists():
            shutil.rmtree(self.basefolder)
        self.basefolder.mkdir(parents=True)
        for sub in ("init_poses", "init_costs", "replan_poses",
                    "replan_costs", "estimator_data"):
            (self.basefolder / sub).mkdir()
        sim_img_cache = pathlib.Path(self.agent_cfg.get("path",
                                                        "./sim_img_cache"))
        if sim_img_cache.exists():
            shutil.rmtree(sim_img_cache)
        sim_img_cache.mkdir(parents=True)
