"""Quadrotor agent: 12-D dynamics + camera observation.

Parity target: reference nav/agent_helpers.py — `drone_dynamics` (:102-148,
state [pos(3), vel(3), rotvec(3), omega(3)], actions [fz, tau(3)]),
`Agent.step` with additive disturbance injection (:43-77) and the camera
pose convention rot_x(pi/2) @ R (:61), `state2image` (:79-100), history
persistence (:186-191).

The dynamics are a pure jnp function — differentiable (the estimator takes
its 12x12 Jacobian, estimator_helpers.py:275) and vmap-able (the batched
rollout engine maps it over whole disturbance populations).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from .math_utils import vec_to_rot_matrix, rot_matrix_to_vec, skew_matrix, rot_x
from .camera import CameraBackend, BlenderCamera


def add_noise_to_state(state, noise):
    return state + noise


def drone_dynamics(state, action, dt, g, mass, I, invI):
    """One Euler step of the 12-D quadrotor (agent_helpers.py:102-148).

    state: [12] = [pos, vel, rotvec, omega]; action: [4] = [fz, taux, tauy, tauz].
    """
    fz = action[0]
    tau = action[1:]
    pos = state[0:3]
    v = state[3:6]
    R = vec_to_rot_matrix(state[6:9])
    omega = state[9:]

    sum_action = jnp.zeros(3).at[2].set(fz)
    dv = (jnp.asarray([0.0, 0.0, -mass * g]) + R @ sum_action) / mass
    domega = invI @ (tau - jnp.cross(omega, I @ omega))

    # SO(3) exponential propagation (agent_helpers.py:128-139) — via the
    # Taylor-guarded Rodrigues form so the estimator's dynamics Jacobian
    # (jacfwd through this function) is finite at omega = 0
    next_R = R @ vec_to_rot_matrix(omega * dt)

    return jnp.concatenate([
        pos + v * dt,
        v + dv * dt,
        rot_matrix_to_vec(next_R).reshape(-1),
        omega + domega * dt,
    ])


class Agent:
    def __init__(self, agent_cfg, camera_cfg, blender_cfg=None,
                 camera: CameraBackend = None):
        # camera params (agent_helpers.py:13-31)
        self.path = camera_cfg.get("path", "./sim_img_cache")
        self.half_res = camera_cfg.get("half_res", False)
        self.white_bg = camera_cfg.get("white_bg", True)
        self.data = {
            "pose": None,
            "res_x": camera_cfg["res_x"],
            "res_y": camera_cfg["res_y"],
            "trans": camera_cfg["trans"],
            "mode": camera_cfg["mode"],
        }
        if camera is not None:
            self.camera = camera
        else:
            self.camera = BlenderCamera(
                self.path, blender_cfg["blend_path"],
                blender_cfg["script_path"], half_res=self.half_res,
                white_bg=self.white_bg)

        self.iter = 0
        self.x = jnp.asarray(agent_cfg["x0"], dtype=jnp.float32)
        self.dt = float(agent_cfg["dt"])
        self.g = float(agent_cfg["g"])
        self.mass = float(agent_cfg["mass"])
        self.I = jnp.asarray(agent_cfg["I"], dtype=jnp.float32)
        self.invI = jnp.linalg.inv(self.I)
        self.states_history = [np.asarray(self.x).tolist()]

        self._dynamics = jax.jit(
            lambda s, a: drone_dynamics(s, a, self.dt, self.g, self.mass,
                                        self.I, self.invI))

    def drone_dynamics(self, state, action):
        return self._dynamics(jnp.asarray(state, dtype=jnp.float32),
                              jnp.asarray(action, dtype=jnp.float32).reshape(-1))

    def _camera_pose(self, state):
        """Camera is rotated +90deg about body x (agent_helpers.py:59-62)."""
        pose = np.eye(4, dtype=np.float32)
        R = np.asarray(vec_to_rot_matrix(jnp.asarray(state[6:9])))
        pose[:3, :3] = np.asarray(rot_x(np.pi / 2)) @ R
        pose[:3, 3] = np.asarray(state[:3])
        return pose

    def step(self, action, noise=None):
        """Dynamics + disturbance + observation (agent_helpers.py:43-77).
        Returns (body-frame pose [4,4] np, state [12] np, img jnp uint8)."""
        action = jnp.asarray(action, dtype=jnp.float32).reshape(-1)
        newstate = self._dynamics(self.x, action)
        if noise is not None:
            newstate = add_noise_to_state(newstate,
                                          jnp.asarray(noise, dtype=jnp.float32))
        self.x = newstate
        new_state = np.asarray(newstate)

        new_pose = self._camera_pose(new_state)
        self.data["pose"] = new_pose.tolist()
        img = self.camera.capture(self.data, self.iter)
        self.states_history.append(new_state.tolist())
        self.iter += 1

        # revert camera pose to body frame (agent_helpers.py:75)
        new_pose[:3, :3] = np.asarray(rot_x(-np.pi / 2)) @ new_pose[:3, :3]
        return new_pose, new_state, jnp.asarray(img)

    def state2image(self, state):
        """Set the state directly and capture (agent_helpers.py:79-100)."""
        self.x = jnp.asarray(state, dtype=jnp.float32)
        new_state = np.asarray(self.x)
        new_pose = self._camera_pose(new_state)
        self.data["pose"] = new_pose.tolist()
        img = self.camera.capture(self.data, self.iter)
        self.img = jnp.asarray(img)
        self.states_history.append(new_state.tolist())
        return new_pose, new_state, self.img

    def save_data(self, filename):
        with open(filename, "w+") as f:
            json.dump({"true_states": self.states_history}, f)
