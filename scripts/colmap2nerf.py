#!/usr/bin/env python3
"""Convert a COLMAP text export to nerf-format transforms.json.

Functional equivalent of the reference scripts/colmap2nerf.py: parses
cameras.txt / images.txt, derives camera intrinsics (incl. camera_angle_x/y),
recenters/rescales poses so the average camera sits at radius ~4, flips axes
to the nerf convention, optionally runs ffmpeg/colmap first, and writes
transforms.json (or per-split jsons with --hold).
"""

import argparse
import json
import math
import os
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="convert a text colmap export to nerf-format "
                    "transforms.json")
    p.add_argument("--video", default="", help="input path to a video")
    p.add_argument("--images", default="images", help="image folder")
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--dynamic", action="store_true",
                   help="save per-frame time from frame index")
    p.add_argument("--estimate_affine_shape", action="store_true")
    p.add_argument("--hold", type=int, default=8,
                   help="hold out every Nth image for validation")
    p.add_argument("--video_fps", default=3)
    p.add_argument("--time_slice", default="")
    p.add_argument("--colmap_matcher", default="exhaustive",
                   choices=["exhaustive", "sequential", "spatial",
                            "transitive", "vocab_tree"])
    p.add_argument("--skip_early", default=0)
    p.add_argument("--colmap_text", default="colmap_text")
    p.add_argument("--colmap_db", default="colmap.db")
    p.add_argument("--aabb_scale", default=2, type=int)
    p.add_argument("--out", default="transforms.json")
    return p.parse_args()


def do_system(cmd):
    print(f"==== running: {cmd}")
    if os.system(cmd):
        print("FATAL: command failed")
        sys.exit(1)


def run_ffmpeg(args):
    fps = float(args.video_fps) or 1.0
    os.makedirs(args.images, exist_ok=True)
    time_arg = ""
    if args.time_slice:
        t1, t2 = args.time_slice.split(",")
        time_arg = f"-ss {t1} -to {t2}"
    do_system(f"ffmpeg -i {args.video} {time_arg} -qscale:v 1 -qmin 1 "
              f"-vf \"fps={fps}\" {args.images}/%04d.jpg")


def run_colmap(args):
    db, images, text = args.colmap_db, args.images, args.colmap_text
    flags = "--SiftExtraction.estimate_affine_shape=true " \
            "--SiftExtraction.domain_size_pooling=true" \
        if args.estimate_affine_shape else ""
    do_system(f"colmap feature_extractor {flags} --ImageReader.camera_model "
              f"OPENCV --ImageReader.single_camera 1 --database_path {db} "
              f"--image_path {images}")
    do_system(f"colmap {args.colmap_matcher}_matcher --database_path {db}")
    do_system("mkdir -p sparse")
    do_system(f"colmap mapper --database_path {db} --image_path {images} "
              f"--output_path sparse")
    do_system("colmap bundle_adjuster --input_path sparse/0 --output_path "
              "sparse/0 --BundleAdjustment.refine_principal_point 1")
    do_system(f"mkdir -p {text}")
    do_system(f"colmap model_converter --input_path sparse/0 --output_path "
              f"{text} --output_type TXT")


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y]])


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to both rays; weight goes to 0 when near-parallel."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    if ta > 0:
        ta = 0
    if tb > 0:
        tb = 0
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def sharpness(image_path):
    try:
        import cv2
        img = cv2.imread(image_path)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return cv2.Laplacian(gray, cv2.CV_64F).var()
    except Exception:
        return 100.0


def parse_cameras(path):
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            els = line.split()
            cam_id = int(els[0])
            model = els[1]
            w, h = float(els[2]), float(els[3])
            fl_x = fl_y = float(els[4])
            cx, cy = w / 2, h / 2
            k1 = k2 = p1 = p2 = 0.0
            if model == "SIMPLE_PINHOLE":
                cx, cy = float(els[5]), float(els[6])
            elif model == "PINHOLE":
                fl_y = float(els[5])
                cx, cy = float(els[6]), float(els[7])
            elif model == "SIMPLE_RADIAL":
                cx, cy, k1 = float(els[5]), float(els[6]), float(els[7])
            elif model == "RADIAL":
                cx, cy, k1, k2 = [float(e) for e in els[5:9]]
            elif model == "OPENCV":
                fl_y = float(els[5])
                cx, cy, k1, k2, p1, p2 = [float(e) for e in els[6:12]]
            cams[cam_id] = dict(w=w, h=h, fl_x=fl_x, fl_y=fl_y, cx=cx, cy=cy,
                                k1=k1, k2=k2, p1=p1, p2=p2)
    return cams


def main():
    args = parse_args()
    if args.video:
        run_ffmpeg(args)
    if args.run_colmap:
        run_colmap(args)

    cams = parse_cameras(os.path.join(args.colmap_text, "cameras.txt"))
    cam = next(iter(cams.values()))
    angle_x = math.atan(cam["w"] / (cam["fl_x"] * 2)) * 2
    angle_y = math.atan(cam["h"] / (cam["fl_y"] * 2)) * 2

    frames = []
    skip = int(args.skip_early)
    with open(os.path.join(args.colmap_text, "images.txt")) as f:
        i = 0
        for line in f:
            line = line.strip()
            if line.startswith("#") or not line:
                continue
            i += 1
            if i < skip * 2:
                continue
            if i % 2 == 1:
                els = line.split()
                qvec = np.array([float(e) for e in els[1:5]])
                tvec = np.array([float(e) for e in els[5:8]])
                name = "_".join(els[9:])
                R = qvec2rotmat(-qvec)
                t = tvec.reshape(3, 1)
                m = np.concatenate(
                    [np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)
                c2w = np.linalg.inv(m)
                # nerf convention flips (same as instant-ngp's converter)
                c2w[0:3, 2] *= -1
                c2w[0:3, 1] *= -1
                c2w = c2w[[1, 0, 2, 3], :]
                c2w[2, :] *= -1
                frames.append({
                    "file_path": os.path.join(args.images, name),
                    "sharpness": sharpness(os.path.join(args.images, name)),
                    "transform_matrix": c2w})

    # recenter: point closest to all camera forward rays
    totw, totp = 0.0, np.zeros(3)
    for f in frames:
        mf = f["transform_matrix"][0:3, :]
        for g in frames:
            mg = g["transform_matrix"][0:3, :]
            p, w = closest_point_2_lines(mf[:, 3], mf[:, 2], mg[:, 3],
                                         mg[:, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    if totw > 0:
        totp /= totw
    for f in frames:
        f["transform_matrix"][0:3, 3] -= totp

    avglen = np.mean([np.linalg.norm(f["transform_matrix"][0:3, 3])
                      for f in frames]) or 1.0
    for f in frames:
        f["transform_matrix"][0:3, 3] *= 4.0 / avglen
        f["transform_matrix"] = f["transform_matrix"].tolist()

    out = {
        "camera_angle_x": angle_x, "camera_angle_y": angle_y,
        "fl_x": cam["fl_x"], "fl_y": cam["fl_y"],
        "k1": cam["k1"], "k2": cam["k2"], "p1": cam["p1"], "p2": cam["p2"],
        "cx": cam["cx"], "cy": cam["cy"], "w": cam["w"], "h": cam["h"],
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    if args.dynamic:
        for idx, f in enumerate(frames):
            f["time"] = idx / max(len(frames) - 1, 1)

    if args.hold > 0:
        train = dict(out, frames=[f for i, f in enumerate(frames)
                                  if i % args.hold != 0])
        val = dict(out, frames=[f for i, f in enumerate(frames)
                                if i % args.hold == 0])
        with open("transforms_train.json", "w") as fp:
            json.dump(train, fp, indent=2)
        with open("transforms_val.json", "w") as fp:
            json.dump(val, fp, indent=2)
        with open("transforms_test.json", "w") as fp:
            json.dump(val, fp, indent=2)
        print(f"wrote transforms_{{train,val,test}}.json "
              f"({len(frames)} frames)")
    else:
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=2)
        print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
