"""Density-field mesh export.

Parity target: reference nerf/utils.py `extract_fields`/`extract_geometry`
(:152-182) + `Trainer.save_mesh` (:533-553), which use mcubes + trimesh.
Neither package ships in this environment, so geometry extraction uses a
dependency-free voxel-surface mesher: it probes the density field on a dense
grid (identical to extract_fields) and emits quads for every occupied-cell
face that borders an unoccupied cell. Vertices land on the dual grid, so the
surface is within half a voxel of the true iso-surface — adequate for the
collision/visualization uses downstream. A true marching-cubes kernel can be
swapped in behind the same API.
"""

import numpy as np


def extract_fields(bound_min, bound_max, resolution, query_func, S=128):
    """Probe query_func on a resolution^3 grid in blocks (utils.py:152-167)."""
    xs = np.array_split(np.linspace(bound_min[0], bound_max[0], resolution),
                        max(resolution // S, 1))
    ys = np.array_split(np.linspace(bound_min[1], bound_max[1], resolution),
                        max(resolution // S, 1))
    zs = np.array_split(np.linspace(bound_min[2], bound_max[2], resolution),
                        max(resolution // S, 1))
    u = np.zeros([resolution, resolution, resolution], dtype=np.float32)
    xo = 0
    for xb in xs:
        yo = 0
        for yb in ys:
            zo = 0
            for zb in zs:
                xx, yy, zz = np.meshgrid(xb, yb, zb, indexing="ij")
                pts = np.stack([xx.reshape(-1), yy.reshape(-1),
                                zz.reshape(-1)], axis=-1).astype(np.float32)
                val = np.asarray(query_func(pts)).reshape(
                    len(xb), len(yb), len(zb))
                u[xo:xo + len(xb), yo:yo + len(yb), zo:zo + len(zb)] = val
                zo += len(zb)
            yo += len(yb)
        xo += len(xb)
    return u


def extract_geometry(bound_min, bound_max, resolution, threshold, query_func):
    """Returns (vertices [V,3] float32, faces [F,3] int32)."""
    u = extract_fields(bound_min, bound_max, resolution, query_func)
    occ = u > threshold
    span = (np.asarray(bound_max) - np.asarray(bound_min))
    step = span / (resolution - 1)

    verts = []
    faces = []
    vert_ids = {}

    def vid(i, j, k):
        key = (i, j, k)
        if key not in vert_ids:
            vert_ids[key] = len(verts)
            verts.append(bound_min + np.asarray([i, j, k]) * step)
        return vert_ids[key]

    # exposed faces along each axis
    padded = np.pad(occ, 1, constant_values=False)
    for axis in range(3):
        inner = padded
        hi = np.logical_and(occ, ~np.roll(padded, -1, axis)[1:-1, 1:-1, 1:-1])
        lo = np.logical_and(occ, ~np.roll(padded, 1, axis)[1:-1, 1:-1, 1:-1])
        for mask, off in ((hi, 1), (lo, 0)):
            ii, jj, kk = np.nonzero(mask)
            for i, j, k in zip(ii.tolist(), jj.tolist(), kk.tolist()):
                c = [i, j, k]
                c[axis] += off
                a1, a2 = [a for a in range(3) if a != axis]
                corners = []
                for d1, d2 in ((0, 0), (1, 0), (1, 1), (0, 1)):
                    cc = list(c)
                    cc[a1] += d1
                    cc[a2] += d2
                    corners.append(vid(*cc))
                faces.append([corners[0], corners[1], corners[2]])
                faces.append([corners[0], corners[2], corners[3]])

    if not verts:
        return (np.zeros((0, 3), dtype=np.float32),
                np.zeros((0, 3), dtype=np.int32))
    return (np.asarray(verts, dtype=np.float32),
            np.asarray(faces, dtype=np.int32))


def write_ply(path, verts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
