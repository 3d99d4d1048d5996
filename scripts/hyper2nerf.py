#!/usr/bin/env python3
"""Convert a HyperNeRF dataset (dataset.json/scene.json/camera jsons) to
nerf-format transforms jsons with per-frame time values. Functional
equivalent of the reference scripts/hyper2nerf.py: supports the vrig split
(dataset.json train/val ids) and the interp split (every --interval frames),
reads per-camera orientation/position/focal from camera/*.json, applies the
scene center/scale, and writes transforms_{train,val}.json."""

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, help="dataset root")
    p.add_argument("--downscale", type=int, default=2)
    p.add_argument("--interval", type=int, default=4,
                   help="interp-mode train/val split interval (even, > 2)")
    return p.parse_args()


def load_camera(path, downscale, scene_center, scene_scale):
    with open(path) as f:
        cam = json.load(f)
    orientation = np.asarray(cam["orientation"])  # world->cam rotation
    position = np.asarray(cam["position"])
    focal = cam["focal_length"] / downscale
    principal = np.asarray(cam["principal_point"]) / downscale
    size = np.asarray(cam["image_size"]) // downscale  # (W, H)

    position = (position - scene_center) * scene_scale
    c2w = np.eye(4)
    c2w[:3, :3] = orientation.T
    c2w[:3, 3] = position
    # nerf convention: flip y and z camera axes
    c2w[:3, 1:3] *= -1
    return c2w, focal, principal, size


def main():
    args = parse_args()
    with open(os.path.join(args.path, "dataset.json")) as f:
        dataset = json.load(f)
    with open(os.path.join(args.path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(args.path, "metadata.json")) as f:
        metadata = json.load(f)

    center = np.asarray(scene.get("center", [0, 0, 0]))
    scale = scene.get("scale", 1.0)
    ids = dataset["ids"]

    if "train_ids" in dataset and dataset.get("train_ids"):
        train_ids = set(dataset["train_ids"])
        val_ids = set(dataset.get("val_ids", []))
    else:  # interp split
        train_ids = {i for k, i in enumerate(ids)
                     if k % args.interval != args.interval // 2}
        val_ids = set(ids) - train_ids

    max_time = max(metadata[i]["time_id"] for i in ids) or 1

    splits = {"train": [], "val": []}
    meta_common = {}
    for i in ids:
        cam_path = os.path.join(args.path, "camera", f"{i}.json")
        c2w, focal, principal, size = load_camera(cam_path, args.downscale,
                                                  center, scale)
        frame = {
            "file_path": os.path.join(f"rgb/{args.downscale}x", f"{i}.png"),
            "transform_matrix": c2w.tolist(),
            "time": metadata[i]["time_id"] / max_time,
        }
        meta_common = {"fl_x": focal, "fl_y": focal,
                       "cx": float(principal[0]), "cy": float(principal[1]),
                       "w": int(size[0]), "h": int(size[1]), "aabb_scale": 2}
        if i in train_ids:
            splits["train"].append(frame)
        elif i in val_ids:
            splits["val"].append(frame)

    for split, frames in splits.items():
        out = dict(meta_common, frames=frames)
        with open(os.path.join(args.path, f"transforms_{split}.json"),
                  "w") as fp:
            json.dump(out, fp, indent=2)
        print(f"wrote transforms_{split}.json ({len(frames)} frames)")


if __name__ == "__main__":
    main()
