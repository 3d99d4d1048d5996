"""Density-field iso-surface mesh export.

Parity target: reference nerf/utils.py `extract_fields`/`extract_geometry`
(:152-182) + `Trainer.save_mesh` (:533-553), which use mcubes + trimesh
(neither ships in this environment). Geometry extraction probes the density
field on a dense grid (identical to extract_fields) and polygonises it with
**marching tetrahedra**: each cell is split into 6 tetrahedra around its main
diagonal and every iso-crossing tet emits 1-2 triangles whose vertices are
linearly interpolated onto the iso-surface — the same class of iso-surface
(and the same vertices along grid edges) as mcubes' marching cubes, built
from first principles instead of the 256-entry case tables. Vertices shared
between tets/cells are deduplicated by their grid-edge identity, so the mesh
is watertight wherever the field is.
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


# cube corners indexed by bits (x, y, z); 6-tet split around diagonal 0-7
_CORNER_OFF = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1]
                        for c in range(8)], dtype=np.int64)
_TETS = np.array([(0, 5, 1, 7), (0, 1, 3, 7), (0, 3, 2, 7),
                  (0, 2, 6, 7), (0, 6, 4, 7), (0, 4, 5, 7)], dtype=np.int64)


def _iso_surface(u, threshold):
    """Marching tetrahedra over the value grid u [R, R, R].

    Returns (verts [V, 3] float64 in GRID coordinates, faces [F, 3] int32)
    with triangle winding oriented so normals point from inside (u > thr)
    toward outside.
    """
    R = u.shape[0]
    inside = u > threshold

    # global linear index of every cube corner of every cell: [ncells, 8]
    g = np.arange(R - 1)
    ci, cj, ck = np.meshgrid(g, g, g, indexing="ij")
    base = np.stack([ci.ravel(), cj.ravel(), ck.ravel()], axis=-1)  # [M, 3]
    corner_ijk = base[:, None, :] + _CORNER_OFF[None]               # [M, 8, 3]
    corner_gid = (corner_ijk[..., 0] * R + corner_ijk[..., 1]) * R \
        + corner_ijk[..., 2]                                        # [M, 8]

    flat_u = u.reshape(-1)
    flat_in = inside.reshape(-1)

    # expand to tets: [M, 6, 4] corner gids
    tet_gid = corner_gid[:, _TETS].reshape(-1, 4)                   # [T, 4]
    tet_in = flat_in[tet_gid]                                       # [T, 4]
    n_in = tet_in.sum(axis=1)
    active = (n_in > 0) & (n_in < 4)
    tet_gid = tet_gid[active]
    tet_in = tet_in[active]
    n_in = n_in[active]
    if tet_gid.shape[0] == 0:
        return (np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int32))

    # order corners of each tet so the "special" ones come first:
    #   n_in == 1: the single inside corner first
    #   n_in == 3: the single outside corner first
    #   n_in == 2: the two inside corners first
    key = np.where((n_in == 3)[:, None], tet_in, ~tet_in)  # False sorts first
    order = np.argsort(key, axis=1, kind="stable")
    sg = np.take_along_axis(tet_gid, order, axis=1)        # sorted gids

    def edge_key(a_gid, b_gid):
        lo = np.minimum(a_gid, b_gid).astype(np.int64)
        hi = np.maximum(a_gid, b_gid).astype(np.int64)
        return lo * (R ** 3) + hi

    tri_edges = []   # list of [K, 3, 2] (a_gid, b_gid) per triangle corner
    tri_inref = []   # inside-centroid gids to orient winding: list of [K, 4]

    one = n_in == 1
    three = n_in == 3
    two = n_in == 2
    for m in (one, three):
        if not m.any():
            continue
        s = sg[m]   # [K, 4]; s[:,0] is the lone corner (inside or outside)
        e = np.stack([np.stack([s[:, 0], s[:, 1]], -1),
                      np.stack([s[:, 0], s[:, 2]], -1),
                      np.stack([s[:, 0], s[:, 3]], -1)], axis=1)  # [K, 3, 2]
        tri_edges.append(e)
        tri_inref.append(s)
    if two.any():
        s = sg[two]  # s[:,0:2] inside, s[:,2:4] outside
        quad = np.stack([np.stack([s[:, 0], s[:, 2]], -1),
                         np.stack([s[:, 0], s[:, 3]], -1),
                         np.stack([s[:, 1], s[:, 3]], -1),
                         np.stack([s[:, 1], s[:, 2]], -1)], axis=1)  # [K,4,2]
        tri_edges.append(quad[:, [0, 1, 2]])
        tri_edges.append(quad[:, [0, 2, 3]])
        tri_inref.append(s)
        tri_inref.append(s)

    edges = np.concatenate(tri_edges, axis=0)        # [F, 3, 2] gid pairs
    refs = np.concatenate(tri_inref, axis=0)         # [F, 4] tet corner gids

    # unique vertex per crossed grid-line segment (tet edges are either cube
    # edges, face diagonals, or the main diagonal — all unique by gid pair)
    keys = edge_key(edges[..., 0], edges[..., 1]).reshape(-1)
    _, first, idx_map = np.unique(keys, return_index=True,
                                  return_inverse=True)
    a_gid = edges.reshape(-1, 2)[first, 0]
    b_gid = edges.reshape(-1, 2)[first, 1]
    va, vb = flat_u[a_gid].astype(np.float64), flat_u[b_gid].astype(np.float64)
    t = np.clip((threshold - va) / np.where(vb != va, vb - va, 1.0), 0.0, 1.0)
    pa = np.stack([a_gid // (R * R), (a_gid // R) % R, a_gid % R], -1).astype(np.float64)
    pb = np.stack([b_gid // (R * R), (b_gid // R) % R, b_gid % R], -1).astype(np.float64)
    verts = pa + t[:, None] * (pb - pa)
    faces = idx_map.reshape(-1, 3).astype(np.int32)

    # consistent winding: normal should point from the inside corners toward
    # the outside corners of the generating tet
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    normal = np.cross(p1 - p0, p2 - p0)
    ref_in = flat_in[refs]                                  # [F, 4]
    pts = np.stack([refs // (R * R), (refs // R) % R, refs % R], -1).astype(np.float64)
    w_in = ref_in[..., None].astype(np.float64)
    cin = (pts * w_in).sum(1) / np.maximum(w_in.sum(1), 1)
    cout = (pts * (1 - w_in)).sum(1) / np.maximum((1 - w_in).sum(1), 1)
    flip = np.einsum("fd,fd->f", normal, cout - cin) < 0
    faces[flip] = faces[flip][:, ::-1]
    return verts, faces


def extract_geometry(bound_min, bound_max, resolution, threshold, query_func):
    """Returns (vertices [V, 3] float32 in world coords, faces [F, 3] int32)
    of the `threshold` iso-surface (utils.py:170-182)."""
    u = extract_fields(bound_min, bound_max, resolution, query_func)
    verts, faces = _iso_surface(u, threshold)
    bound_min = np.asarray(bound_min, dtype=np.float64)
    bound_max = np.asarray(bound_max, dtype=np.float64)
    step = (bound_max - bound_min) / (resolution - 1)
    return ((bound_min + verts * step).astype(np.float32),
            faces.astype(np.int32))


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
