#!/usr/bin/env python3
"""Convert a Tanks&Temples dataset (rgb/, pose/, intrinsics.txt) to
nerf-format transforms jsons. Functional equivalent of the reference
scripts/tanks2nerf.py: splits come from the 0_/1_/2_ filename prefixes
(train/val/test), poses flip the y/z axes to the nerf convention, and
translations rescale so cameras average radius 4."""

import argparse
import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str,
                   help="root with rgb/, pose/, intrinsics.txt")
    args = p.parse_args()

    intr = np.loadtxt(os.path.join(args.path, "intrinsics.txt"))
    fl_x, fl_y = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]

    splits = {"0": "train", "1": "val", "2": "test"}
    frames = {v: [] for v in splits.values()}
    all_poses = []

    for pose_file in sorted(glob.glob(os.path.join(args.path, "pose", "*.txt"))):
        name = os.path.splitext(os.path.basename(pose_file))[0]
        prefix = name.split("_")[0]
        split = splits.get(prefix)
        if split is None:
            continue
        pose = np.loadtxt(pose_file).reshape(4, 4)
        pose[:3, 1:3] *= -1  # flip y/z to nerf convention
        img = os.path.join("rgb", name + ".png")
        if not os.path.exists(os.path.join(args.path, img)):
            img = os.path.join("rgb", name + ".jpg")
        frames[split].append({"file_path": img, "transform_matrix": pose})
        all_poses.append(pose)

    avglen = np.mean([np.linalg.norm(p[:3, 3]) for p in all_poses]) or 1.0
    W = H = None
    try:
        import cv2
        sample = frames["train"][0]["file_path"]
        im = cv2.imread(os.path.join(args.path, sample))
        H, W = im.shape[:2]
    except Exception:
        pass

    for split, fs in frames.items():
        for f in fs:
            f["transform_matrix"][:3, 3] *= 4.0 / avglen
            f["transform_matrix"] = f["transform_matrix"].tolist()
        out = {"fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
               "aabb_scale": 2, "frames": fs}
        if W is not None:
            out["w"], out["h"] = W, H
        with open(os.path.join(args.path, f"transforms_{split}.json"),
                  "w") as fp:
            json.dump(out, fp, indent=2)
        print(f"wrote transforms_{split}.json ({len(fs)} frames)")


if __name__ == "__main__":
    main()
