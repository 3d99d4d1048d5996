"""Camera backends behind one interface.

The reference hard-wires an external Blender subprocess as the agent's camera
(nav/agent_helpers.py:150-184: write pose JSON -> run blender -P viz_func.py
-> read PNG). Here that sits behind `CameraBackend` with three
implementations, so the full validation loop can run hermetically on TPU
(SURVEY.md §4 test-strategy requirement):

  BlenderCamera  — the real subprocess protocol, byte-compatible JSON/PNG
  NerfCamera     — renders the observation from the NeRF itself (pure-TPU)
  CannedCamera   — fixed image, for tests
"""

import json
import os
import subprocess

import numpy as np


class CameraBackend:
    def capture(self, data: dict, iteration: int) -> np.ndarray:
        """data: the camera-config dict incl. 'pose' (4x4 nested list).
        Returns an RGB(A) uint8 image [H, W, 3]."""
        raise NotImplementedError


class BlenderCamera(CameraBackend):
    """agent_helpers.py:150-184 protocol."""

    def __init__(self, path, blend_file, script_path, half_res=False,
                 white_bg=True):
        self.path = path
        self.blend = blend_file
        self.blend_script = script_path
        self.half_res = half_res
        self.white_bg = white_bg

    def capture(self, data, iteration):
        import imageio
        try:
            import cv2
        except ImportError:
            cv2 = None
        os.makedirs(self.path, exist_ok=True)
        pose_path = os.path.join(self.path, f"{iteration}.json")
        img_path = os.path.join(self.path, f"{iteration}.png")
        with open(pose_path, "w+") as f:
            json.dump(data, f, indent=4)
        subprocess.run(["blender", "-b", self.blend, "-P", self.blend_script,
                        "--", pose_path, img_path], check=False)
        img = imageio.imread(img_path)
        img = (np.array(img) / 255.0).astype(np.float32)
        if self.half_res and cv2 is not None:
            w, h = img.shape[1] // 2, img.shape[0] // 2
            img = cv2.resize(img, (w, h))
        if self.white_bg and img.shape[-1] == 4:
            img = img[..., :3] * img[..., -1:] + (1.0 - img[..., -1:])
        return (img * 255.0).astype(np.uint8)


class NerfCamera(CameraBackend):
    """Pure-TPU observation: the NeRF is the camera. Uses the same
    pose convention as Estimator.render_from_pose
    (estimator_helpers.py:227-243)."""

    def __init__(self, render_from_pose_fn, res_x=800, res_y=800):
        self.render_from_pose = render_from_pose_fn
        self.res_x = res_x
        self.res_y = res_y

    def capture(self, data, iteration):
        pose = np.asarray(data["pose"], dtype=np.float32)
        rgb = np.asarray(self.render_from_pose(pose))
        img = rgb.reshape(self.res_y, self.res_x, -1)[..., :3]
        return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


class CannedCamera(CameraBackend):
    def __init__(self, image=None, res_x=64, res_y=64):
        if image is None:
            image = np.full((res_y, res_x, 3), 128, dtype=np.uint8)
        self.image = np.asarray(image, dtype=np.uint8)
        self.poses = []

    def capture(self, data, iteration):
        self.poses.append(np.asarray(data["pose"]))
        return self.image.copy()
