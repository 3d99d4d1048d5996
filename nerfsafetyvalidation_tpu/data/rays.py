"""Pinhole ray generation + pose conventions.

Parity targets:
  get_rays           <- nerf/utils.py:52-116 (pixel centers +0.5, normalized
                        directions, optional random-index subsampling and
                        error-map importance sampling)
  nerf_matrix_to_ngp <- nerf/provider.py:19-27 (axis cycle + yz flip + scale)
  rand_poses         <- nerf/provider.py:57-91 (orbit camera sampling)
  linear<->srgb      <- nerf/utils.py:42-49
"""

import numpy as np
import jax
import jax.numpy as jnp


def linear_to_srgb(x):
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x ** 0.41666 - 0.055)


def srgb_to_linear(x):
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0, 0, 0)):
    """[4,4] nerf-convention c2w -> ngp convention (provider.py:19-27)."""
    pose = np.asarray(pose, dtype=np.float32)
    return np.array([
        [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
        [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
        [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
        [0, 0, 0, 1],
    ], dtype=np.float32)


def get_rays(poses, intrinsics, H: int, W: int, N: int = -1, error_map=None,
             key=None):
    """poses: [B, 4, 4] c2w; intrinsics: (fx, fy, cx, cy).

    Returns dict with rays_o/rays_d [B, N, 3] (N = H*W if N <= 0) and, when
    subsampling, 'inds' [B, N] (+ 'inds_coarse' with an error map).
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    B = poses.shape[0]
    fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics).reshape(-1)[:4]]

    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    i = i.reshape(1, H * W) + 0.5
    j = j.reshape(1, H * W) + 0.5
    i = jnp.broadcast_to(i, (B, H * W))
    j = jnp.broadcast_to(j, (B, H * W))

    results = {}
    if N > 0:
        N = min(N, H * W)
        if error_map is None:
            if key is None:
                raise ValueError("subsampled get_rays requires a PRNG key")
            inds = jax.random.randint(key, (N,), 0, H * W)  # may duplicate
            inds = jnp.broadcast_to(inds, (B, N))
        else:
            # weighted sampling on the 128x128 error map (utils.py:82-93)
            if key is None:
                raise ValueError("error-map get_rays requires a PRNG key")
            k1, k2, k3 = jax.random.split(key, 3)
            error_map = jnp.asarray(error_map)
            logits = jnp.log(jnp.clip(error_map, 1e-12, None))
            inds_coarse = jax.vmap(
                lambda lg, kk: jax.random.categorical(kk, lg, shape=(N,)))(
                    logits, jax.random.split(k1, B))
            inds_x, inds_y = inds_coarse // 128, inds_coarse % 128
            sx, sy = H / 128, W / 128
            inds_x = jnp.clip((inds_x * sx + jax.random.uniform(k2, (B, N)) * sx
                               ).astype(jnp.int32), 0, H - 1)
            inds_y = jnp.clip((inds_y * sy + jax.random.uniform(k3, (B, N)) * sy
                               ).astype(jnp.int32), 0, W - 1)
            inds = inds_x * W + inds_y
            results["inds_coarse"] = inds_coarse
        i = jnp.take_along_axis(i, inds, axis=-1)
        j = jnp.take_along_axis(j, inds, axis=-1)
        results["inds"] = inds
    else:
        results["inds"] = jnp.broadcast_to(jnp.arange(H * W), (B, H * W))

    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    rays_d = jnp.einsum("bnk,bjk->bnj", directions, poses[:, :3, :3],
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)

    results["rays_o"] = rays_o
    results["rays_d"] = rays_d
    return results


def rays_for_pixels(pose, intrinsics, coords):
    """Rays for specific (row, col) pixel coordinates — the traceable analog
    of `get_rays(pose, intr, H, W)["rays_o"].reshape(H, W, 3)[coords]` used
    by the estimator's measurement loop (reference estimator_helpers.py
    :191-225 indexes the full-frame ray grid by interest-region pixels; the
    in-scan closed-loop engine generates only those rays instead).

    pose: [4, 4] c2w; coords: [B, 2] integer (row, col).
    Returns (rays_o [B, 3], rays_d [B, 3]) — bit-identical to the indexed
    full-frame grid (same +0.5 pixel centers, normalization and HIGHEST-
    precision rotation as get_rays above)."""
    pose = jnp.asarray(pose, dtype=jnp.float32)
    fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics).reshape(-1)[:4]]
    i = coords[:, 1].astype(jnp.float32) + 0.5          # x / column
    j = coords[:, 0].astype(jnp.float32) + 0.5          # y / row
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1,
                                              keepdims=True)
    rays_d = jnp.einsum("nk,jk->nj", directions, pose[:3, :3],
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rand_poses(key, size: int, radius: float = 1.0,
               theta_range=(np.pi / 3, 2 * np.pi / 3),
               phi_range=(0.0, 2 * np.pi)):
    """Random orbit-camera poses (provider.py:57-91). Returns [size, 4, 4]."""
    k1, k2 = jax.random.split(key)
    thetas = jax.random.uniform(k1, (size,), minval=theta_range[0],
                                maxval=theta_range[1])
    phis = jax.random.uniform(k2, (size,), minval=phi_range[0],
                              maxval=phi_range[1])
    centers = jnp.stack([
        radius * jnp.sin(thetas) * jnp.sin(phis),
        radius * jnp.cos(thetas),
        radius * jnp.sin(thetas) * jnp.cos(phis),
    ], axis=-1)

    def normalize(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), forward.shape)
    right = normalize(jnp.cross(forward, up))
    up = normalize(jnp.cross(right, forward))

    poses = jnp.tile(jnp.eye(4)[None], (size, 1, 1))
    rot = jnp.stack([right, up, forward], axis=-1)
    poses = poses.at[:, :3, :3].set(rot)
    poses = poses.at[:, :3, 3].set(centers)
    return poses
