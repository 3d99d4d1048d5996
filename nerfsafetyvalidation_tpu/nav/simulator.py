"""18-D state simulator + matplotlib trajectory visualization.

Parity target: reference nav/quad_helpers.py `Simulator` (:8-106) and
`QuadPlot` (:109-183). Both are legacy helpers kept for API completeness
(the main pipeline drives Agent/Planner/Estimator instead).
"""

import json

import numpy as np
import jax.numpy as jnp

from .math_utils import next_rotation


class Simulator:
    """18-D state [pos(3), vel(3), R(9), omega(3)] forward simulator."""

    def __init__(self, start_state):
        self.states = jnp.asarray(start_state, dtype=jnp.float32)[None, :]
        self.mass = 1.0
        self.I = jnp.eye(3)
        self.invI = jnp.eye(3)
        self.dt = 0.1
        self.g = 10.0

    def add_state(self, state):
        self.states = jnp.concatenate([self.states, state[None]], axis=0)

    def copy_states(self, states):
        self.states = states

    def advance(self, action, state_noise=None):
        if state_noise is None:
            state_noise = 0.0
        nxt = self.next_state(self.states[-1], action) + state_noise
        self.states = jnp.concatenate([self.states, nxt[None]], axis=0)

    def advance_smooth(self, action, detail: int = 5):
        cur = self.states[-1]
        for _ in range(detail):
            cur = self.next_state(cur, action, self.dt / detail)
        self.states = jnp.concatenate([self.states, cur[None]], axis=0)

    def get_current_state(self):
        return self.states[-1]

    def body_to_world(self, points):
        pos = self.states[:, 0:3]
        R = self.states[:, 6:15].reshape((-1, 3, 3))
        world = R @ points.T + pos[..., None]
        return jnp.swapaxes(world, -1, -2)

    def next_state(self, state, action, dt=None):
        if dt is None:
            dt = self.dt
        fz = action[0]
        tau = action[1:]
        pos = state[0:3]
        v = state[3:6]
        R = state[6:15].reshape((3, 3))
        omega = state[15:]
        sum_action = jnp.zeros(3).at[2].set(fz)
        dv = (jnp.asarray([0.0, 0.0, -self.mass * self.g])
              + R @ sum_action) / self.mass
        domega = self.invI @ (tau - jnp.cross(omega, self.I @ omega))
        next_R = next_rotation(R, omega, dt)
        return jnp.concatenate([pos + v * dt, v + dv * dt,
                                next_R.reshape(-1), omega + domega * dt])

    def save_poses(self, filename):
        positions = np.asarray(self.states[:, 0:3])
        rot = np.asarray(self.states[:, 6:15]).reshape((-1, 3, 3))
        with open(filename, "w+") as f:
            for pos, r in zip(positions, rot):
                pose = np.zeros((4, 4))
                pose[:3, :3] = r
                pose[:3, 3] = pos
                pose[3, 3] = 1
                json.dump(pose.tolist(), f)
                f.write("\n")


class QuadPlot:
    """Matplotlib 3-D trajectory viewer (quad_helpers.py:109-183)."""

    def __init__(self):
        import matplotlib.pyplot as plt
        self.plt = plt
        self.fig = plt.figure(figsize=(16, 8))
        self.ax_map = self.fig.add_subplot(1, 2, 1, projection="3d")
        self.ax_graph = self.fig.add_subplot(1, 2, 2)
        self.ax_graph_right = self.ax_graph.twinx()
        body = np.stack(np.meshgrid(np.linspace(-0.05, 0.05, 10),
                                    np.linspace(-0.05, 0.05, 10),
                                    np.linspace(-0.02, 0.02, 5),
                                    indexing="ij"), axis=-1)
        self.robot_body = jnp.asarray(body.reshape(-1, 3), dtype=jnp.float32)
        self.fig.tight_layout()

    def trajectory(self, traj, color="g", show_cloud=True):
        ax = self.ax_map
        ax.set_ylim3d(-1, 1)
        ax.set_xlim3d(-1, 1)
        ax.set_zlim3d(0, 1)
        pos = np.asarray(traj.body_to_world(jnp.zeros((1, 3))))
        ax.plot(pos[:, 0, 0], pos[:, 0, 1], pos[:, 0, 2])
        if show_cloud:
            body_points = np.asarray(traj.body_to_world(self.robot_body))
            for i, state_body in enumerate(body_points):
                c = (color[i] if isinstance(color, list) else color) + "."
                ax.plot(*state_body.T, c, ms=72.0 / ax.figure.dpi, alpha=0.5)
        size = 0.05
        points = jnp.asarray([[0, 0, 0], [size, 0, 0], [0, size, 0],
                              [0, 0, size]], dtype=jnp.float32)
        colors = ["r", "g", "b"]
        points_world = np.asarray(traj.body_to_world(points))
        for state_axis in points_world:
            for i in range(1, 4):
                ax.plot(state_axis[[0, i], 0], state_axis[[0, i], 1],
                        state_axis[[0, i], 2], c=colors[i - 1])

    def plot_data(self, *args, **kwargs):
        self.ax_graph.plot(*args, **kwargs)

    def show(self):
        self.plt.show()
