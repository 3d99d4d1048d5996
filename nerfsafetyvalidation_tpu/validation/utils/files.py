"""Pose caching + counts persistence.

Parity target: reference validation/utils/fileUtils.py — cache_poses/
restore_poses (:5-45, the planner warm-start cache that avoids re-running the
1000-epoch learn_init per simulation) and save_counts/load_counts (:47-56,
TP/FP tallies resumable across replay runs).
"""

import os
import pickle
import shutil


def cache_poses(pose_file_path, cost_file_path, destination_dir):
    os.makedirs(destination_dir, exist_ok=True)
    pose_dir = os.path.join(destination_dir, "poses")
    cost_dir = os.path.join(destination_dir, "costs")
    os.makedirs(pose_dir, exist_ok=True)
    os.makedirs(cost_dir, exist_ok=True)
    for f in os.listdir(pose_file_path):
        shutil.copy(os.path.join(pose_file_path, f), pose_dir)
    for f in os.listdir(cost_file_path):
        shutil.copy(os.path.join(cost_file_path, f), cost_dir)
    print("Caching posts & costs!")


def restore_poses(cached_pose_dir, cached_cost_dir, destination_dir):
    os.makedirs(destination_dir, exist_ok=True)
    pose_dir = os.path.join(destination_dir, "init_poses")
    cost_dir = os.path.join(destination_dir, "init_costs")
    os.makedirs(pose_dir, exist_ok=True)
    os.makedirs(cost_dir, exist_ok=True)
    for f in os.listdir(cached_pose_dir):
        shutil.copy(os.path.join(cached_pose_dir, f), pose_dir)
    for f in os.listdir(cached_cost_dir):
        shutil.copy(os.path.join(cached_cost_dir, f), cost_dir)
    print("Using cached posts & costs!")


def save_counts(counts, filename):
    with open(filename, "wb") as f:
        pickle.dump(counts, f)


def load_counts(filename):
    if os.path.exists(filename):
        with open(filename, "rb") as f:
            return pickle.load(f)
    return [0, 0, 0, 0, 0, 0, 0, 0]
