"""Minimal gym.Env-compatible base.

The reference subclasses gym.Env purely for the Box action/observation space
declarations (NerfSimulator.py:25-26). gymnasium is used when available;
otherwise a tiny structural stand-in keeps the same attributes.
"""

import numpy as np

try:
    import gymnasium as gym
    from gymnasium.spaces import Box
    Env = gym.Env
except ImportError:  # pragma: no cover
    class Box:
        def __init__(self, low, high, shape, dtype):
            self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

    class Env:
        pass


def disturbance_action_space():
    return Box(low=-np.inf, high=np.inf, shape=(12,), dtype=np.float32)


def rgb_observation_space(h=800, w=800):
    return Box(low=0, high=255, shape=(h, w, 3), dtype=np.uint8)
