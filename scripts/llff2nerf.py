#!/usr/bin/env python3
"""Convert an LLFF dataset (poses_bounds.npy) to nerf-format transforms.json.

Functional equivalent of reference scripts/llff2nerf.py: reads the [N, 17]
poses_bounds array, converts the [down right back] convention to [right up
back], rescales translations, and writes transforms_{train,val,test}.json
with a --hold split.
"""

import argparse
import glob
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, help="dataset root with poses_bounds.npy")
    p.add_argument("--images", type=str, default="images")
    p.add_argument("--downscale", type=float, default=1.0)
    p.add_argument("--hold", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()
    poses_bounds = np.load(os.path.join(args.path, "poses_bounds.npy"))
    N = poses_bounds.shape[0]
    poses = poses_bounds[:, :15].reshape(-1, 3, 5)  # [N, 3, 5]

    H, W, fl = poses[0, :, 4]
    H, W, fl = H / args.downscale, W / args.downscale, fl / args.downscale

    # [down right back] -> [right up back], pad to 4x4
    poses = np.concatenate(
        [poses[..., 1:2], -poses[..., 0:1], poses[..., 2:4]], axis=-1)
    bottom = np.tile(np.array([0, 0, 0, 1.0])[None, None], (N, 1, 1))
    poses = np.concatenate([poses, bottom], axis=1)  # [N, 4, 4]

    # rescale like the reference: average camera distance to ~4
    avglen = np.mean(np.linalg.norm(poses[:, 0:3, 3], axis=-1)) or 1.0
    poses[:, 0:3, 3] *= 4.0 / avglen

    images = sorted(glob.glob(os.path.join(args.path, args.images, "*")))
    assert len(images) == N, f"{len(images)} images vs {N} poses"

    frames = [{"file_path": os.path.relpath(img, args.path),
               "transform_matrix": poses[i].tolist()}
              for i, img in enumerate(images)]

    base = {
        "w": W, "h": H, "fl_x": fl, "fl_y": fl, "cx": W / 2, "cy": H / 2,
        "aabb_scale": 2,
    }
    train = dict(base, frames=[f for i, f in enumerate(frames)
                               if i % args.hold != 0])
    val = dict(base, frames=[f for i, f in enumerate(frames)
                             if i % args.hold == 0])
    for name, data in (("train", train), ("val", val), ("test", val)):
        with open(os.path.join(args.path, f"transforms_{name}.json"),
                  "w") as fp:
            json.dump(data, fp, indent=2)
    print(f"wrote transforms_{{train,val,test}}.json ({N} frames)")


if __name__ == "__main__":
    main()
