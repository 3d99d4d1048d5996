"""Random path generation for the validation sweep.

Parity target: reference validation/utils/generatePath.py — step count is
distance / 0.09 (:5-8, tuned for the Stonehenge scene), coordinates persist
to results/coordinates.json so interrupted sweeps resume the same path.
"""

import json
import os
import random

import numpy as np

COORDS_FILE = "results/coordinates.json"


def calculate_steps(start_position, end_position, step_size: float = 0.09):
    total = np.linalg.norm(np.array(end_position) - np.array(start_position))
    return round(total / step_size)


def save_coords(start_position, end_position, steps, path: str = COORDS_FILE):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"start_position": list(start_position),
                   "end_position": list(end_position),
                   "steps": steps}, f)


def load_coords(path: str = COORDS_FILE):
    with open(path) as f:
        data = json.load(f)
    return data["start_position"], data["end_position"], data["steps"]


def generate_path(x_range, y_range, z_range):
    start = [random.uniform(lo, hi) for lo, hi in (x_range, y_range, z_range)]
    end = [random.uniform(lo, hi) for lo, hi in (x_range, y_range, z_range)]
    return start, end, calculate_steps(start, end)
