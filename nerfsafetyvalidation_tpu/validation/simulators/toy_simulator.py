"""2-D point-mass fake backend for CEM/MC sanity checks.

Parity target: reference validation/simulators/ToySimulator.py:7-19. The
reference runs a CEM smoke test at import time (:21-36); here that lives in
tests/test_validation.py where it belongs.
"""

import numpy as np


class ToySimulator:
    def __init__(self, collision_threshold: float):
        self.position = np.zeros(2, dtype=np.float32)
        self.collision_threshold = collision_threshold

    def reset(self):
        self.position = np.zeros(2, dtype=np.float32)

    def step(self, noise):
        self.position = self.position + np.asarray(noise, dtype=np.float32)
        collision_value = -float(np.linalg.norm(self.position
                                                - np.asarray([5.0, 5.0])))
        is_collision = bool(np.linalg.norm(self.position)
                            > self.collision_threshold)
        return is_collision, collision_value, self.position.copy()
