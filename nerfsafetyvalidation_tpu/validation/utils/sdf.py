"""Collision map -> signed distance field pipeline.

Parity target: reference validation/utils/createCollisionMap.py (Blender-side
scene voxelization at GRANULARITY=40 cells/meter) + createSDF.py (scipy
euclidean distance transform scaled back to meters, :10-32).

The Blender voxelizer needed bpy; here the collision map can additionally be
built straight from the trained NeRF density field (the same surrogate the
simulator flies through), which keeps the whole pipeline on-device and
hermetic. Grid extents default to the NerfSimulator constants
(NerfSimulator.py:55-61).
"""

import numpy as np

GRANULARITY = 40
START = (-1.4, -1.3, -0.1)
END = (1.0, 1.0, 0.5)


def collision_map_from_density(density_fn, start=START, end=END,
                               granularity=GRANULARITY, thresh=10.0):
    """Voxelize a density field into an occupancy map on the reference's
    validation grid. density_fn: [N,3] world -> [N] sigma."""
    axes = [np.arange(start[i], end[i], 1.0 / granularity) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    sig = np.asarray(density_fn(pts)).reshape(gx.shape)
    return sig > thresh


def sdf_from_collision_map(collision_map, granularity=GRANULARITY):
    """Euclidean distance transform in meters (createSDF.py:10-32)."""
    import scipy.ndimage
    free = ~np.asarray(collision_map, dtype=bool)
    sdf = scipy.ndimage.distance_transform_edt(free)
    return sdf / granularity


def build_sdf(density_fn=None, collision_map=None, out_path=None, **kw):
    if collision_map is None:
        collision_map = collision_map_from_density(density_fn, **kw)
    sdf = sdf_from_collision_map(collision_map,
                                 kw.get("granularity", GRANULARITY))
    if out_path is not None:
        np.save(out_path, sdf)
    return sdf
