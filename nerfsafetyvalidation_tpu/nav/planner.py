"""Trajectory planner over the NeRF density field.

Parity target: reference nav/quad_plot.py (`Planner`):
  * A* initialization on a maxpooled 100^3 density probe (:63-114)
  * differentiable flat-state trajectory -> actions reconstruction
    `calc_everything` (:119-197)
  * collision + effort cost (:223-253): 1000*fz^2 + 0.01*|tau|^4 +
    1e6 * mean_B(density^2 * speed) with an optional fade-out mask
  * Adam optimization `learn_init` / `learn_update` (:255-300) with pose/
    cost JSON snapshots every 50 epochs
  * MPC interface get_next_action / update_state (:211-214, :302-308)

TPU design: `calc_everything` and the cost are pure jnp closed over static
boundary states, so one jit compiles cost+grad+adam; the epoch loop runs as
lax.fori_loop blocks of `save_step` (=50) between host-side JSON snapshots —
the planner's 1000-epoch init is a single-digit number of device dispatches
instead of 1000 torch step() calls.
"""

import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .math_utils import rot_matrix_to_vec, next_rotation
from .astar import astar

SAVE_STEP = 50

# Compiled-optimizer cache shared across Planner instances: the horizon
# shrinks by one state per MPC step (update_state), so each trajectory
# length triggers one compile — but stress tests reset the planner per
# simulation (NerfSimulator.py:183-223) and replay the same lengths, so
# caching by (density_fn, shape, hyperparams) makes every simulation after
# the first reuse the compiled replan blocks.
_OPT_CACHE = {}


def calc_everything(states, initial_accel, start_state, end_state, dt, g_vec,
                    J, mass):
    """Differentiable reconstruction (quad_plot.py:119-197).

    states: [S, 4] (xyz + yaw) decision vars; initial_accel: [2].
    start_state/end_state: [18] = [pos, vel, R(9), omega].
    Returns (pos, vel, accel, rot_matrix, omega, angular_accel, actions).
    """
    start_pos = start_state[None, 0:3]
    start_v = start_state[None, 3:6]
    start_R = start_state[6:15].reshape((1, 3, 3))
    start_omega = start_state[None, 15:]

    end_pos = end_state[None, 0:3]
    end_v = end_state[None, 3:6]
    end_R = end_state[6:15].reshape((1, 3, 3))
    end_omega = end_state[None, 15:]

    next_R = next_rotation(start_R, start_omega, dt)

    e3 = jnp.asarray([0.0, 0.0, 1.0])
    start_accel = (start_R @ e3) * initial_accel[0] + g_vec
    next_accel = (next_R @ e3) * initial_accel[1] + g_vec

    next_vel = start_v + start_accel * dt
    after_next_vel = next_vel + next_accel * dt

    next_pos = start_pos + start_v * dt
    after_next_pos = next_pos + next_vel * dt
    after2_next_pos = after_next_pos + after_next_vel * dt

    current_pos = jnp.concatenate(
        [start_pos, next_pos, after_next_pos, after2_next_pos,
         states[2:, :3], end_pos], axis=0)

    prev_pos = current_pos[:-1]
    nxt_pos = current_pos[1:]
    current_vel = (nxt_pos - prev_pos) / dt
    current_vel = jnp.concatenate([current_vel, end_v], axis=0)

    prev_vel = current_vel[:-1]
    nxt_vel = current_vel[1:]
    current_accel = (nxt_vel - prev_vel) / dt - g_vec
    current_accel = jnp.concatenate([current_accel, current_accel[-1:]], axis=0)

    accel_mag = jnp.linalg.norm(current_accel, axis=-1, keepdims=True)
    z_axis_body = current_accel / accel_mag
    z_axis_body = z_axis_body[2:-1]

    z_angle = states[:, 3]
    in_plane = jnp.stack([jnp.sin(z_angle), -jnp.cos(z_angle),
                          jnp.zeros_like(z_angle)], axis=-1)
    x_axis_body = jnp.cross(z_axis_body, in_plane)
    x_axis_body = x_axis_body / jnp.linalg.norm(x_axis_body, axis=-1,
                                                keepdims=True)
    y_axis_body = jnp.cross(z_axis_body, x_axis_body)

    rot_matrix = jnp.stack([x_axis_body, y_axis_body, z_axis_body], axis=-1)
    rot_matrix = jnp.concatenate([start_R, next_R, rot_matrix, end_R], axis=0)

    current_omega = rot_matrix_to_vec(
        rot_matrix[1:] @ jnp.swapaxes(rot_matrix[:-1], -1, -2)) / dt
    current_omega = jnp.concatenate([current_omega, end_omega], axis=0)

    prev_omega = current_omega[:-1]
    nxt_omega = current_omega[1:]
    angular_accel = (nxt_omega - prev_omega) / dt
    angular_accel = jnp.concatenate([angular_accel, angular_accel[-1:]], axis=0)

    torques = (J @ angular_accel[..., None])[..., 0]
    actions = jnp.concatenate([accel_mag * mass, torques], axis=-1)
    return (current_pos, current_vel, current_accel, rot_matrix,
            current_omega, angular_accel, actions)


def planner_cost_terms(states, initial_accel, start_state, end_state, epoch,
                       *, density_fn, dt, g_vec, J, mass, robot_body,
                       fade_out_epoch, fade_out_sharpness):
    """Pure-functional planner cost (quad_plot.py:223-253): 1000*fz^2 +
    0.01*|tau|^4 + 1e6 * mean_B(density^2 * speed), with the optional
    fade-out mask. Module-level so the in-scan closed-loop engine
    (validation/closed_loop.py) can run the replan block inside a jitted
    scan with exactly the Planner's math. Returns (total [S], colision [S])."""
    pos, vel, accel, rot_matrix, omega, angular_accel, actions = \
        calc_everything(states, initial_accel, start_state, end_state,
                        dt, g_vec, J, mass)
    fz = actions[:, 0]
    torques = jnp.linalg.norm(actions[:, 1:], axis=-1)
    world_body = (rot_matrix @ robot_body.T + pos[..., None])   # [S, 3, B]
    world_body = jnp.swapaxes(world_body, -1, -2)               # [S, B, 3]
    distance = jnp.sum(vel ** 2 + 1e-5, axis=-1) ** 0.5
    density = density_fn(world_body) ** 2                        # [S, B]
    colision_prob = jnp.mean(density * distance[:, None], axis=-1)
    if fade_out_epoch > 0:
        t = jnp.linspace(0.0, 1.0, colision_prob.shape[0])
        position = epoch / fade_out_epoch
        mask = jax.nn.sigmoid(fade_out_sharpness * (position - t))
        mask = jnp.where(epoch < fade_out_epoch, mask, jnp.ones_like(mask))
        colision_prob = colision_prob * mask
    colision_prob = colision_prob * 1e6
    return 1000 * fz ** 2 + 0.01 * torques ** 4 + colision_prob, colision_prob


class Planner:
    def __init__(self, start_state, end_state, cfg, density_fn,
                 density_params=None):
        """density_params: optional pytree of network parameters. When
        given, density_fn is called as fn(params, x) and the pytree rides
        the jitted replan block as an ARGUMENT — a closure-captured
        trained table (e.g. the flagship's 537 MB folded volume) bakes
        into the HLO as constants and exceeds the tunneled remote-compile
        request limit (HTTP 413). Same contract as closed_loop.py /
        estimator.py render_params. Swapping checkpoints between runs
        then reuses the compiled block."""
        self.nerf = density_fn
        self.density_params = density_params
        self.cfg = cfg
        self.T_final = cfg["T_final"]
        self.steps = cfg["steps"]
        self.lr = cfg["lr"]
        self.epochs_init = cfg["epochs_init"]
        self.epochs_update = cfg["epochs_update"]
        self.fade_out_epoch = cfg["fade_out_epoch"]
        self.fade_out_sharpness = cfg["fade_out_sharpness"]
        # fixed-horizon MPC (opt-in, TPU-native): the reference drops one
        # knot per step (quad_plot.py:302-308), shrinking the decision
        # shape and forcing a fresh replan compile at EVERY horizon length
        # (~1 min/step through the remote-compile tunnel — 97% of a
        # sequential validation step, measured). fixed_horizon keeps the
        # knot count constant by shifting the horizon (classic receding-
        # horizon MPC: same start/end boundary conditions, constant
        # discretization), so one compiled replan block serves the whole
        # sweep. Semantics deviation documented in COMPONENTS.md.
        self.fixed_horizon = bool(cfg.get("fixed_horizon", False))
        self.mass = float(cfg["mass"])
        self.J = jnp.asarray(cfg["I"], dtype=jnp.float32)
        self.g = jnp.asarray([0.0, 0.0, -float(cfg["g"])])
        self.body_extent = np.asarray(cfg["body"])
        self.body_nbins = cfg["nbins"]

        self.dt = self.T_final / self.steps
        self.start_state = jnp.asarray(start_state, dtype=jnp.float32)
        self.end_state = jnp.asarray(end_state, dtype=jnp.float32)

        slider = jnp.linspace(0.0, 1.0, self.steps)[1:-1, None]
        s0 = self.full_to_reduced_state(self.start_state)
        s1 = self.full_to_reduced_state(self.end_state)
        self.states = (1 - slider) * s0 + slider * s1
        self.initial_accel = jnp.asarray([cfg["g"], cfg["g"]],
                                         dtype=jnp.float32)

        bx, by, bz = [np.linspace(self.body_extent[i, 0],
                                  self.body_extent[i, 1], self.body_nbins[i])
                      for i in range(3)]
        gx, gy, gz = np.meshgrid(bx, by, bz, indexing="ij")
        self.robot_body = jnp.asarray(
            np.stack([gx, gy, gz], axis=-1).reshape(-1, 3), dtype=jnp.float32)

        self.epoch = 0
        self.basefolder = None
        self._opt_block = None  # jit cache, built lazily per state shape

    # ----------------------------------------------------------------- state
    def full_to_reduced_state(self, state):
        pos = state[:3]
        R = state[6:15].reshape((3, 3))
        v = R @ jnp.asarray([1.0, 0.0, 0.0])
        angle = jnp.arctan2(v[1], v[0])
        return jnp.concatenate([pos, angle[None]], axis=-1)

    def params(self):
        return {"states": self.states, "initial_accel": self.initial_accel}

    def _density(self, x, dp=None):
        if self.density_params is None:
            return self.nerf(x)
        return self.nerf(self.density_params if dp is None else dp, x)

    # --------------------------------------------------------------- A* init
    def a_star_init(self, side: int = 100, kernel_size: int = 5):
        """quad_plot.py:63-114."""
        lin = np.linspace(-1, 1, side, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        coods = jnp.asarray(np.stack([gx, gy, gz], axis=-1))
        output = np.asarray(self._density(coods))
        gs = side // kernel_size
        occupied = output.reshape(gs, kernel_size, gs, kernel_size, gs,
                                  kernel_size).max(axis=(1, 3, 5)) > 0.3

        start_grid = gs * (np.asarray(self.start_state[:3]) + 1) / 2
        end_grid = gs * (np.asarray(self.end_state[:3]) + 1) / 2
        start = tuple(int(start_grid[i]) for i in range(3))
        end = tuple(int(end_grid[i]) for i in range(3))

        path = astar(occupied, start, end)  # raises ValueError if no path

        squares = 2 * (np.asarray(path, dtype=np.float32) / gs) - 1
        states = np.concatenate(
            [squares, np.zeros((squares.shape[0], 1), dtype=np.float32)],
            axis=-1)
        states += np.random.normal(0.0, 0.001, states.shape).astype(np.float32)
        # 3-point smoothing (quad_plot.py:106-112)
        prev_s = np.concatenate([states[:1], states[:-1]], axis=0)
        next_s = np.concatenate([states[1:], states[-1:]], axis=0)
        states = (prev_s + next_s + states) / 3
        self.states = jnp.asarray(states)
        self._opt_block = None  # state shape changed; re-jit

    # ------------------------------------------------------------------ cost
    def calc_everything(self, states=None, initial_accel=None):
        states = self.states if states is None else states
        ia = self.initial_accel if initial_accel is None else initial_accel
        return calc_everything(states, ia, self.start_state, self.end_state,
                               self.dt, self.g, self.J, self.mass)

    def _cost_terms(self, states, ia, epoch, start_state=None,
                    end_state=None, dp=None):
        start_state = self.start_state if start_state is None else start_state
        end_state = self.end_state if end_state is None else end_state
        return planner_cost_terms(
            states, ia, start_state, end_state, epoch,
            density_fn=lambda x: self._density(x, dp),
            dt=self.dt, g_vec=self.g, J=self.J,
            mass=self.mass, robot_body=self.robot_body,
            fade_out_epoch=self.fade_out_epoch,
            fade_out_sharpness=self.fade_out_sharpness)

    def get_state_cost(self):
        return self._cost_terms(self.states, self.initial_accel, self.epoch)

    def total_cost(self):
        total, _ = self.get_state_cost()
        return jnp.mean(total)

    # ---------------------------------------------------------- optimization
    def _build_opt(self):
        tx = optax.adam(self.lr)

        @jax.jit
        def block(params, opt_state, epoch0, n_steps, start_state,
                  end_state, dp):
            def body(i, carry):
                params, opt_state = carry
                def loss_fn(p):
                    total, _ = self._cost_terms(p["states"],
                                                p["initial_accel"],
                                                epoch0 + i,
                                                start_state, end_state,
                                                dp=dp)
                    return jnp.mean(total)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state
            params, opt_state = jax.lax.fori_loop(0, n_steps, body,
                                                  (params, opt_state))
            return params, opt_state
        return tx, block

    def _learn(self, epochs, tag, iteration=None):
        if self._opt_block is None:
            cache_key = (id(self.nerf), self.states.shape,
                         float(self.lr), int(self.fade_out_epoch),
                         float(self.fade_out_sharpness), float(self.dt),
                         float(self.mass),
                         np.asarray(self.J).tobytes(),
                         np.asarray(self.g).tobytes(),
                         np.asarray(self.robot_body).tobytes())
            if cache_key not in _OPT_CACHE:
                _OPT_CACHE[cache_key] = self._build_opt()
            self._opt_block = _OPT_CACHE[cache_key]
        tx, block = self._opt_block
        params = self.params()
        opt_state = tx.init(params)
        done = 0
        while done < epochs:
            n = min(SAVE_STEP, epochs - done)
            if done % SAVE_STEP == 0 and self.basefolder is not None:
                suffix = str(done // SAVE_STEP) + \
                    (f"_time{iteration}" if iteration is not None else "")
                self.save_poses(pathlib.Path(self.basefolder) /
                                f"{tag}_poses" / (suffix + ".json"))
                self.save_costs(pathlib.Path(self.basefolder) /
                                f"{tag}_costs" / (suffix + ".json"))
            self.epoch = done
            params, opt_state = block(params, opt_state, jnp.asarray(done),
                                      n, self.start_state, self.end_state,
                                      self.density_params)
            self.states = params["states"]
            self.initial_accel = params["initial_accel"]
            done += n
        self.epoch = epochs

    def learn_init(self):
        """1000-epoch initial plan (quad_plot.py:255-276)."""
        self._learn(self.epochs_init, "init")

    def learn_update(self, iteration):
        """250-epoch replan (quad_plot.py:278-300)."""
        self._learn(self.epochs_update, "replan", iteration=iteration)

    # ------------------------------------------------------------------- MPC
    def get_full_states(self):
        pos, vel, accel, rot_matrix, omega, angular_accel, actions = \
            self.calc_everything()
        return jnp.concatenate([pos, vel, rot_matrix.reshape(-1, 9), omega],
                               axis=-1)

    def get_actions(self):
        _, _, _, _, _, _, actions = self.calc_everything()
        return actions

    def get_next_action(self):
        return self.get_actions()[0, :]

    def body_to_world(self, points):
        pos, _, _, rot_matrix, _, _, _ = self.calc_everything()
        world = rot_matrix @ points.T + pos[..., None]
        return jnp.swapaxes(world, -1, -2)

    def update_state(self, measured_state):
        """Shift the horizon after a measurement (quad_plot.py:302-308)."""
        _, _, _, _, _, _, actions = self.calc_everything()
        self.start_state = jnp.asarray(measured_state, dtype=jnp.float32)
        if self.fixed_horizon:
            # constant knot count: consume the first knot, duplicate the
            # last — shapes (and the compiled replan block) are preserved
            self.states = jnp.concatenate(
                [self.states[1:, :], self.states[-1:, :]], axis=0)
        else:
            self.states = self.states[1:, :]
            self._opt_block = None  # shapes changed
        self.initial_accel = actions[1:3, 0]

    # ------------------------------------------------------------------- IO
    def save_poses(self, filename):
        pathlib.Path(filename).parent.mkdir(parents=True, exist_ok=True)
        positions, _, _, rot_matrix, _, _, _ = self.calc_everything()
        poses = []
        for pos, rot in zip(np.asarray(positions), np.asarray(rot_matrix)):
            pose = np.zeros((4, 4))
            pose[:3, :3] = rot
            pose[:3, 3] = pos
            pose[3, 3] = 1
            poses.append(pose.tolist())
        with open(filename, "w+") as f:
            json.dump({"poses": poses}, f, indent=4)

    def save_costs(self, filename):
        pathlib.Path(filename).parent.mkdir(parents=True, exist_ok=True)
        positions, vel, _, rot_matrix, omega, _, actions = self.calc_everything()
        total_cost, colision_loss = self.get_state_cost()
        with open(filename, "w+") as f:
            json.dump({
                "colision_loss": np.asarray(colision_loss).tolist(),
                "pos": np.asarray(positions).tolist(),
                "actions": np.asarray(actions).tolist(),
                "total_cost": np.asarray(total_cost).tolist(),
            }, f, indent=4)
