"""NeRF dataset provider: transforms.json loader + per-iteration ray collation.

Parity target: reference nerf/provider.py (`NeRFDataset`, :94-332):
  * auto-detects 'colmap' (single transforms.json) vs 'blender'
    (transforms_{split}.json) modes, with 'all'/'trainval' merging
  * poses run through nerf_matrix_to_ngp with scale/offset
  * colmap test split synthesizes a slerp camera path between two poses
  * intrinsics from fl_x/fl_y or camera_angle_x/y
  * collate samples `num_rays` pixels per image (optionally error-map
    weighted) and gathers the matching GT colors

Host-side numpy/cv2 for IO; arrays handed to JAX at collate time.
"""

import os
import glob
import json

import numpy as np
import jax
import jax.numpy as jnp

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .rays import get_rays, nerf_matrix_to_ngp, rand_poses


def fast_collate_math(poses_all, images_flat, idx, key, *, H, W, N,
                      intrinsics):
    """Pure collate math shared by the jitted per-step fast path
    (_fast_collate_fn) and the trainer's fused multi-step scan
    (trainer._scan_block_fn): pose gather + ray synthesis + pixel gather,
    identical key usage and math to the eager path (same inds, same
    rays). idx [B] int32; returns (rays_o, rays_d, inds, images)."""
    fx, fy, cx, cy = intrinsics
    poses = jnp.take(poses_all, idx, axis=0)              # [B, 4, 4]
    k_pose, k_rays = jax.random.split(key)
    del k_pose  # parity with the eager path's key consumption
    inds = jax.random.randint(k_rays, (N,), 0, H * W)
    inds = jnp.broadcast_to(inds, (idx.shape[0], N))
    # meshgrid(indexing="xy") reshaped row-major: n -> (n//W, n%W)
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = jnp.einsum("bnk,bjk->bnj", dirs, poses[:, :3, :3],
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    imgs = jnp.take(images_flat, idx, axis=0)             # [B, HW, C]
    imgs = jnp.take_along_axis(
        imgs, inds[..., None].astype(jnp.int32), axis=1)
    return rays_o, rays_d, inds, imgs.astype(jnp.float32)


class NeRFDataset:
    def __init__(self, opt, type: str = "train", downscale: int = 1,
                 n_test: int = 10):
        """opt needs: path, preload, scale, offset, bound, fp16, num_rays,
        rand_pose, error_map, color_space (reference provider.py:95-112)."""
        self.opt = opt
        self.type = type
        self.downscale = downscale
        self.root_path = opt.path
        self.scale = opt.scale
        self.offset = opt.offset
        self.bound = opt.bound

        self.training = type in ("train", "all", "trainval")
        self.num_rays = getattr(opt, "num_rays", 4096) if self.training else -1
        self.rand_pose = getattr(opt, "rand_pose", -1)

        if os.path.exists(os.path.join(self.root_path, "transforms.json")):
            self.mode = "colmap"
        elif os.path.exists(os.path.join(self.root_path, "transforms_train.json")):
            self.mode = "blender"
        else:
            raise NotImplementedError(
                f"[NeRFDataset] Cannot find transforms*.json under {self.root_path}")

        if self.mode == "colmap":
            with open(os.path.join(self.root_path, "transforms.json")) as f:
                transform = json.load(f)
        else:
            if type == "all":
                transform = None
                for tp in glob.glob(os.path.join(self.root_path, "*.json")):
                    with open(tp) as f:
                        tmp = json.load(f)
                    if transform is None:
                        transform = tmp
                    else:
                        transform["frames"].extend(tmp["frames"])
            elif type == "trainval":
                with open(os.path.join(self.root_path, "transforms_train.json")) as f:
                    transform = json.load(f)
                with open(os.path.join(self.root_path, "transforms_val.json")) as f:
                    transform["frames"].extend(json.load(f)["frames"])
            else:
                with open(os.path.join(self.root_path,
                                       f"transforms_{type}.json")) as f:
                    transform = json.load(f)

        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // downscale
            self.W = int(transform["w"]) // downscale
        else:
            self.H = self.W = None

        frames = transform["frames"]

        if self.mode == "colmap" and type == "test":
            # interpolate a test camera path between two random poses
            # (provider.py:166-182)
            from scipy.spatial.transform import Slerp, Rotation
            f0, f1 = np.random.choice(frames, 2, replace=False)
            pose0 = nerf_matrix_to_ngp(np.array(f0["transform_matrix"]),
                                       self.scale, self.offset)
            pose1 = nerf_matrix_to_ngp(np.array(f1["transform_matrix"]),
                                       self.scale, self.offset)
            rots = Rotation.from_matrix(np.stack([pose0[:3, :3], pose1[:3, :3]]))
            slerp = Slerp([0, 1], rots)
            self.poses = []
            self.images = None
            for i in range(n_test + 1):
                ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = slerp(ratio).as_matrix()
                pose[:3, 3] = (1 - ratio) * pose0[:3, 3] + ratio * pose1[:3, 3]
                self.poses.append(pose)
        else:
            if self.mode == "colmap":
                if type == "train":
                    frames = frames[1:]
                elif type == "val":
                    frames = frames[:1]
            self.poses = []
            self.images = []
            for f in frames:
                f_path = os.path.join(self.root_path, f["file_path"])
                if self.mode == "blender" and "." not in os.path.basename(f_path):
                    f_path += ".png"
                if not os.path.exists(f_path):
                    continue
                pose = nerf_matrix_to_ngp(np.array(f["transform_matrix"],
                                                   dtype=np.float32),
                                          self.scale, self.offset)
                image = cv2.imread(f_path, cv2.IMREAD_UNCHANGED)
                if self.H is None or self.W is None:
                    self.H = image.shape[0] // downscale
                    self.W = image.shape[1] // downscale
                if image.shape[-1] == 3:
                    image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
                else:
                    image = cv2.cvtColor(image, cv2.COLOR_BGRA2RGBA)
                if image.shape[0] != self.H or image.shape[1] != self.W:
                    image = cv2.resize(image, (self.W, self.H),
                                       interpolation=cv2.INTER_AREA)
                self.poses.append(pose)
                self.images.append(image.astype(np.float32) / 255.0)

        self.poses = np.stack(self.poses, axis=0).astype(np.float32)
        if self.images is not None:
            self.images = np.stack(self.images, axis=0)
            if getattr(opt, "preload", False):
                # reference provider.py preload moves every image to the
                # accelerator up front (.half() under fp16). Host-resident
                # images cost a full-image transfer PER STEP here (the
                # collate gathers ray pixels on device) — over the
                # tunneled TPU that is ~2.6 MB/step at 400^2. bf16 halves
                # the resident footprint; collate casts the gathered rays
                # back to f32.
                dtype = jnp.bfloat16 if getattr(opt, "fp16", False) \
                    else jnp.float32
                self.images = jnp.asarray(self.images, dtype=dtype)
        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

        if self.training and getattr(opt, "error_map", False):
            self.error_map = np.ones((len(self.poses), 128 * 128),
                                     dtype=np.float32)
        else:
            self.error_map = None

        # intrinsics (provider.py:259-274)
        if "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / downscale
            fl_y = transform.get("fl_y", transform.get("fl_x")) / downscale
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = self.W / (2 * np.tan(transform["camera_angle_x"] / 2)) \
                if "camera_angle_x" in transform else None
            fl_y = self.H / (2 * np.tan(transform["camera_angle_y"] / 2)) \
                if "camera_angle_y" in transform else None
            if fl_x is None:
                fl_x = fl_y
            if fl_y is None:
                fl_y = fl_x
        else:
            raise RuntimeError(
                "Failed to load focal length, please check the transforms.json!")
        cx = transform.get("cx", self.W / 2) / (downscale if "cx" in transform else 1)
        cy = transform.get("cy", self.H / 2) / (downscale if "cy" in transform else 1)
        self.intrinsics = np.array([fl_x, fl_y, cx, cy])

    # ------------------------------------------------------------------
    def _fast_collate_fn(self, B):
        """One jitted program for the common training collate (no error
        map, preloaded device images): pose gather + ray synthesis + pixel
        gather. The eager path issues ~20 small dispatches per step, which
        over the tunneled TPU costs ~10 ms/step of pure dispatch latency
        (measured: 61.3 vs 51.1 ms/step, scripts/bench_train.py); one
        compiled program collapses that to a single dispatch. Identical
        key usage and math to the eager path (same inds, same rays)."""
        fn = getattr(self, "_fast_collate_cache", {}).get(B)
        if fn is not None:
            return fn
        # same clamp as the eager path (rays.py: N = min(N, H*W)): without
        # it num_rays > H*W would return a larger batch with duplicated
        # pixels than the documented 'identical math' parity allows
        H, W = self.H, self.W
        N = min(self.num_rays, H * W)
        intr = tuple(float(v) for v in self.intrinsics)

        @jax.jit
        def fast(poses_all, images_flat, idx, key):
            return fast_collate_math(poses_all, images_flat, idx, key,
                                     H=H, W=W, N=N, intrinsics=intr)

        if not hasattr(self, "_fast_collate_cache"):
            self._fast_collate_cache = {}
        self._fast_collate_cache[B] = fast
        return fast

    def collate(self, index, key):
        """Build a ray batch for image `index` (provider.py:277-323)."""
        B = len(index)

        use_fast = (self.training and self.error_map is None
                    and self.num_rays > 0 and self.images is not None
                    and isinstance(self.images, jnp.ndarray)
                    and not (self.rand_pose == 0
                             or index[0] >= len(self.poses)))
        if use_fast:
            # cache device copies, invalidated if self.poses/self.images are
            # ever rebound (identity check — the arrays themselves are
            # treated as immutable once loaded)
            src_ids = (id(self.poses), id(self.images))
            if getattr(self, "_dev_cache_ids", None) != src_ids:
                self._poses_dev = jnp.asarray(self.poses)
                self._images_flat = self.images.reshape(
                    len(self.poses), -1, self.images.shape[-1])
                self._dev_cache_ids = src_ids
            rays_o, rays_d, inds, imgs = self._fast_collate_fn(B)(
                self._poses_dev, self._images_flat,
                jnp.asarray(np.asarray(index, dtype=np.int32)), key)
            return {"H": self.H, "W": self.W, "rays_o": rays_o,
                    "rays_d": rays_d, "images": imgs}

        k_pose, k_rays = jax.random.split(key)

        if self.rand_pose == 0 or index[0] >= len(self.poses):
            poses = rand_poses(k_pose, B, radius=self.radius)
            s = np.sqrt(self.H * self.W / self.num_rays)
            rH, rW = int(self.H / s), int(self.W / s)
            rays = get_rays(poses, self.intrinsics / s, rH, rW, -1)
            return {"H": rH, "W": rW, "rays_o": rays["rays_o"],
                    "rays_d": rays["rays_d"]}

        poses = jnp.asarray(self.poses[index])
        error_map = None if self.error_map is None else \
            jnp.asarray(self.error_map[index])
        rays = get_rays(poses, self.intrinsics, self.H, self.W,
                        self.num_rays, error_map, key=k_rays)
        results = {"H": self.H, "W": self.W, "rays_o": rays["rays_o"],
                   "rays_d": rays["rays_d"]}
        if self.images is not None:
            # device-resident under preload (one gather, no host transfer);
            # host numpy otherwise
            images = jnp.asarray(self.images[np.asarray(index)])
            if self.training:
                C = images.shape[-1]
                flat = images.reshape(B, -1, C)
                images = jnp.take_along_axis(
                    flat, rays["inds"][..., None].astype(jnp.int32), axis=1)
            results["images"] = images.astype(jnp.float32)
        if error_map is not None:
            results["index"] = index
            results["inds_coarse"] = rays["inds_coarse"]
        return results

    def dataloader(self, key=None):
        """Iterator over per-image ray batches; reshuffles each epoch when
        training (provider.py:325-332)."""
        size = len(self.poses)
        if self.training and self.rand_pose > 0:
            size += size // self.rand_pose
        return _Loader(self, size, key)

    def __len__(self):
        return len(self.poses)


class _Loader:
    def __init__(self, dataset: NeRFDataset, size: int, key):
        self._data = dataset
        self.size = size
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.has_gt = dataset.images is not None
        self.epoch = 0

    def __len__(self):
        return self.size

    def iter_indices(self):
        """The pre-collate (index, key) stream of one epoch — advances the
        epoch/shuffle/key state exactly as __iter__ does. Used by the
        trainer's fused multi-step path so its training trajectory is
        bit-identical to the stepwise loop."""
        self.epoch += 1
        order = np.arange(self.size)
        if self._data.training:
            rng = np.random.default_rng(self.epoch)
            rng.shuffle(order)
        for idx in order:
            self.key, sub = jax.random.split(self.key)
            yield int(idx), sub

    def __iter__(self):
        for idx, sub in self.iter_indices():
            yield self._data.collate([idx], sub)
