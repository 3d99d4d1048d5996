#!/usr/bin/env python3
"""Build the SDF grid from a collision map (reference validation/utils/
createSDF.py CLI equivalent): euclidean distance transform scaled back to
meters. Alternatively build the collision map straight from a trained NeRF
checkpoint (hermetic, no Blender)."""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--collision_map", default="collision_map.npy")
    p.add_argument("--out", default="validation/utils/sdf.npy")
    p.add_argument("--granularity", type=int, default=40)
    args = p.parse_args()

    from nerfsafetyvalidation_tpu.validation.utils.sdf import (
        sdf_from_collision_map)
    cmap = np.load(args.collision_map)
    sdf = sdf_from_collision_map(cmap, granularity=args.granularity)
    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out, sdf)
    print(f"wrote {args.out} shape={sdf.shape} min={sdf.min():.4f} "
          f"max={sdf.max():.4f}")


if __name__ == "__main__":
    main()
