"""Failure visualizer: draw the planned trajectories plus drone bounding
cubes along the failed rollout, then save a failure .blend.

Runs INSIDE Blender's Python (invoked by validation/utils/blender.py
runBlenderOnFailure as `blender scene.blend -P viz_failures_blend.py
--background -- <workspace> <bevel> <sim#> <step#> <json rows> <pop#>`).
Functional equivalent of the reference's viz_failures_blend.py; the position
columns sit at 15:18 for MC rows and 18:21 for CEM rows (27 columns).
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


def add_cube(collection, location, scale=(0.0125, 0.0125, 0.0125)):
    bpy.ops.mesh.primitive_cube_add(size=2.0, enter_editmode=False,
                                    align="WORLD", location=location,
                                    scale=scale)
    obj = bpy.context.object
    obj.location = location
    obj.name = "Drone_bounding_box"
    collection.objects.link(obj)
    bpy.context.view_layer.update()


def main():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    exp_name, bevel_depth, n_sim, step = argv[0], float(argv[1]), argv[2], argv[3]
    simulationList = json.loads(argv[4])
    populationNum = argv[5]

    base = bpy.path.abspath("//") + f"paths/{exp_name}"
    coll = bpy.data.collections.new(f"{exp_name}_visualization")
    bpy.context.scene.collection.children.link(coll)

    init_files = glob.glob(base + "/init_poses/*.json")
    with open(base + f"/init_poses/{len(init_files) - 1}.json") as f:
        poses = np.array(json.load(f)["poses"])
    add_curve(coll, poses[:, :3, -1], "traj_init", bevel_depth)

    t = 0
    while os.path.exists(base + f"/replan_poses/0_time{t}.json"):
        files = glob.glob(base + f"/replan_poses/*_time{t}.json")
        with open(base + f"/replan_poses/{len(files) - 1}_time{t}.json") as f:
            poses = np.array(json.load(f)["poses"])
        add_curve(coll, poses[:, :3, -1], f"traj_{t}", bevel_depth)
        t += 1

    # drone bounding cubes at every logged step (CEM rows carry 3 extra
    # leading columns, shifting positions from 15:18 to 18:21)
    offset = 3 if len(simulationList[0]) == 27 else 0
    for row in simulationList:
        add_cube(coll, row[15 + offset:18 + offset])

    name = os.path.splitext(os.path.basename(bpy.data.filepath))[0]
    if populationNum != "NA":
        out = f"{name}_failure_{populationNum}_{n_sim}_{step}.blend"
    else:
        out = f"{name}_failure_{n_sim}_{step}.blend"
    failure_dir = os.path.join("./results/", name, "failures")
    os.makedirs(failure_dir, exist_ok=True)
    bpy.ops.wm.save_as_mainfile(filepath=os.path.join(failure_dir, out))
    print("--------  DONE WITH BLENDER SCRIPT  --------")


if __name__ == "__main__":
    main()
