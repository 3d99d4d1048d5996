"""Scene-mesh voxelizer: build the ground-truth collision map inside Blender.

Runs INSIDE Blender's Python (`blender scene.blend -b -P
create_collision_map.py`). Functional equivalent of the reference's
validation/utils/createCollisionMap.py: marks every mesh vertex's grid cell
at GRANULARITY cells/meter over the scene extents, writing
collision_map.npy. Feed the result to
nerfsafetyvalidation_tpu.validation.utils.sdf.sdf_from_collision_map (or
validation/utils/createSDF semantics) for the SDF grid. For hermetic runs
without Blender, validation/utils/sdf.collision_map_from_density builds the
same map from the trained NeRF's density field instead.
"""

import bmesh  # noqa: F401 (Blender runtime only)
import bpy
import numpy as np

GRANULARITY = 40  # cells per world meter (drone ~= 1 cell ~= 0.5 m real)
START_X, END_X = -1.2, 0.6
START_Y, END_Y = -1.2, 1.2
START_Z, END_Z = -0.22, 1.2


def worldToIndex(world, start, granularity):
    return int(np.floor((world - start) * granularity))


def main():
    meshes = [obj for obj in bpy.data.objects if obj.type == "MESH"]
    xr = worldToIndex(END_X, START_X, GRANULARITY)
    yr = worldToIndex(END_Y, START_Y, GRANULARITY)
    zr = worldToIndex(END_Z, START_Z, GRANULARITY)
    collision_map = np.zeros((xr, yr, zr), dtype=bool)

    for mesh in meshes:
        bm = bmesh.new()
        bm.from_mesh(mesh.data)
        bm.transform(mesh.matrix_world)
        for v in bm.verts:
            x = worldToIndex(v.co.x, START_X, GRANULARITY)
            y = worldToIndex(v.co.y, START_Y, GRANULARITY)
            z = worldToIndex(v.co.z, START_Z, GRANULARITY)
            if 0 <= x < xr and 0 <= y < yr and 0 <= z < zr:
                collision_map[x, y, z] = True
        bm.free()

    print("occupied cells:", int(collision_map.sum()))
    np.save("collision_map.npy", collision_map)
    print("wrote collision_map.npy", collision_map.shape)


if __name__ == "__main__":
    main()
