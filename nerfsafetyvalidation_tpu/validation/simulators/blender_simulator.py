"""Ground-truth replay simulator (observation = external render, no UQ).

Parity target: reference validation/simulators/BlenderSimulator.py — the same
plan->act->estimate->replan->SDF loop as NerfSimulator but the observation
comes from the Blender render and there is no uncertainty/reward, since this
simulator IS the ground truth the NeRF run is replayed against (:17-205).
"""

import os
import pathlib
import shutil

import numpy as np
import jax.numpy as jnp

from ...nav import Estimator, Agent, Planner, vec_to_rot_matrix, rot_matrix_to_vec
from ...utils.seeding import seed_everything
from ..utils.files import cache_poses, restore_poses
from ..utils.blender import worldToIndex
from .base import Env, disturbance_action_space, rgb_observation_space


class BlenderSimulator(Env):
    def __init__(self, start_state, end_state, agent_cfg, planner_cfg,
                 camera_cfg, filter_cfg, get_rays_fn, render_fn, blender_cfg,
                 density_fn, seed, camera=None,
                 sdf_path="validation/utils/sdf.npy", sdf=None,
                 render_batch_fn=None):
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
        self.camera = camera

        agent_cfg = dict(agent_cfg)
        agent_cfg["x0"] = jnp.concatenate([
            self.start_state[:6],
            rot_matrix_to_vec(self.start_state[6:15].reshape((3, 3))),
            self.start_state[15:]], axis=-1)
        agent_cfg["dt"] = planner_cfg["T_final"] / planner_cfg["steps"]
        self.agent_cfg = agent_cfg
        self.true_start_state = agent_cfg["x0"]
        self.true_states = np.asarray(self.true_start_state)[None]
        self.dynamics = None
        self.filter = None
        self.traj = None
        self.steps = 0
        self.iter = 0

        self.GRANULARITY = 40
        self.START_X = -1.4
        self.START_Y = -1.3
        self.START_Z = -0.1
        if sdf is not None:
            self.sdf = np.asarray(sdf)
        elif os.path.exists(sdf_path):
            self.sdf = np.load(sdf_path)
        else:
            raise FileNotFoundError(f"SDF grid not found at {sdf_path}")
        self.seed = seed

    def step(self, disturbance, num_interpolated_points: int = 4):
        """Returns (collided, collisionVal, position[3])
        (BlenderSimulator.py step loop)."""
        action = np.asarray(self.traj.get_next_action())
        true_pose, true_state, gt_img = self.dynamics.step(
            action, noise=jnp.asarray(disturbance, dtype=jnp.float32))
        self.true_states = np.vstack((self.true_states, true_state))

        x = np.arange(self.true_states.shape[0])
        xnew = np.linspace(x.min(), x.max(),
                           self.true_states.shape[0] * num_interpolated_points)
        interp = np.empty((xnew.shape[0], self.true_states.shape[1]))
        for i in range(self.true_states.shape[1]):
            interp[:, i] = np.interp(xnew, x, self.true_states[:, i])

        state_est = self.filter.estimate_state(np.asarray(gt_img)[..., :3],
                                               true_pose, action)
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
                return collided, collisionVal, current_state[:3]
        self.iter += 1
        return collided, collisionVal, current_state[:3]

    def reset(self):
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
        traj.a_star_init()
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
