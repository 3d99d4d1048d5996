"""Trajectory visualizer: draw planner trajectories as NURBS curves in the
scene and save a *_result.blend.

Runs INSIDE Blender's Python (invoked by validate.py / simulate.py as
`blender scene.blend -P viz_data_blend.py --background -- <workspace>
<bevel_depth>`). Functional equivalent of the reference's viz_data_blend.py:
reads the latest init_poses snapshot plus every replan_poses/*_time{t}.json
and adds one beveled curve per plan.
"""

import glob
import json
import os
import sys

import bpy  # noqa: F401 (Blender runtime only)
import numpy as np


def add_curve(collection, points, name, bevel_depth=0.02):
    crv = bpy.data.curves.new("crv", "CURVE")
    crv.dimensions = "3D"
    spline = crv.splines.new(type="NURBS")
    spline.points.add(len(points) - 1)
    for p, xyz in zip(spline.points, points):
        p.co = (list(xyz) + [1.0])
    obj = bpy.data.objects.new(name, crv)
    obj.data.bevel_depth = bevel_depth
    collection.objects.link(obj)
    bpy.context.view_layer.update()


def latest_json(pattern):
    files = glob.glob(pattern)
    if not files:
        return None
    return sorted(files, key=lambda p: os.path.getmtime(p))[-1]


def main():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    exp_name = argv[0]
    bevel_depth = float(argv[1]) if len(argv) > 1 else 0.02

    base = bpy.path.abspath("//") + f"paths/{exp_name}"
    coll = bpy.data.collections.new(f"{exp_name}_visualization")
    bpy.context.scene.collection.children.link(coll)

    init_files = glob.glob(base + "/init_poses/*.json")
    latest_init = base + f"/init_poses/{len(init_files) - 1}.json"
    with open(latest_init) as f:
        poses = np.array(json.load(f)["poses"])
    add_curve(coll, poses[:, :3, -1], "traj_init", bevel_depth)

    t = 0
    while os.path.exists(base + f"/replan_poses/0_time{t}.json"):
        files = glob.glob(base + f"/replan_poses/*_time{t}.json")
        latest = base + f"/replan_poses/{len(files) - 1}_time{t}.json"
        with open(latest) as f:
            poses = np.array(json.load(f)["poses"])
        add_curve(coll, poses[:, :3, -1], f"traj_{t}", bevel_depth)
        t += 1

    name = os.path.splitext(os.path.basename(bpy.data.filepath))[0]
    os.makedirs("./results", exist_ok=True)
    bpy.ops.wm.save_as_mainfile(
        filepath=os.path.join("./results/", f"{name}_result.blend"))
    print("--------  DONE WITH BLENDER SCRIPT  --------")


if __name__ == "__main__":
    main()
