"""Headless Blender camera server: render one frame at a given pose.

Runs INSIDE Blender's Python (invoked by nav/camera.py BlenderCamera as
`blender -b scene.blend -P viz_func.py -- pose.json out.png`). Functional
equivalent of the reference's viz_func.py camera protocol: the JSON payload
carries pose (4x4), res_x/res_y, trans (film transparency) and mode
(RGB/RGBA).
"""

import json
import sys

import bpy  # noqa: F401 (Blender runtime only)
import numpy as np
from mathutils import Matrix


def main():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    pose_json, out_png = argv[0], argv[1]

    with open(bpy.path.abspath("//") + pose_json) as f:
        meta = json.load(f)

    camera = bpy.data.objects["Camera"]
    camera.matrix_world = Matrix(np.array(meta["pose"]).tolist())
    bpy.context.view_layer.update()

    render = bpy.context.scene.render
    render.filepath = out_png
    render.resolution_x = meta["res_x"]
    render.resolution_y = meta["res_y"]
    render.film_transparent = bool(meta["trans"])
    render.image_settings.color_mode = meta["mode"]
    bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
