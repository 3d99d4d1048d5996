"""Interactive viewer: orbit camera + dearpygui train/render panel.

Parity target: reference nerf/gui.py — `OrbitCamera` (:10-60: pose from
radius/rotation with look-at center, intrinsics from fovy) and `NeRFGUI`
(:62-421: live render loop with progressive supersampling, train-steps
button wiring, camera drag/scroll callbacks).

OrbitCamera is dependency-free (numpy + scipy rotations) and fully tested;
NeRFGUI requires the optional dearpygui package and degrades to a clear
ImportError message otherwise (the package is not part of the hermetic
TPU environment).
"""

import numpy as np

try:
    from scipy.spatial.transform import Rotation
except ImportError:  # pragma: no cover
    Rotation = None


class OrbitCamera:
    def __init__(self, W, H, r=2.0, fovy=60.0):
        self.W = W
        self.H = H
        self.radius = r
        self.fovy = fovy
        self.center = np.array([0, 0, 0], dtype=np.float32)
        self.rot = Rotation.from_quat([1, 0, 0, 0]) if Rotation else None
        self.up = np.array([0, 1, 0], dtype=np.float32)

    @property
    def pose(self):
        """c2w [4,4] (gui.py:19-27)."""
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot.as_matrix()
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    @property
    def intrinsics(self):
        focal = self.H / (2 * np.tan(np.radians(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2])

    def orbit(self, dx, dy):
        """Rotate along camera up/side axes (gui.py:36-43)."""
        side = self.rot.as_matrix()[:3, 0]
        rotvec_x = self.up * np.radians(-0.1 * dx)
        rotvec_y = side * np.radians(-0.1 * dy)
        self.rot = Rotation.from_rotvec(rotvec_x) * \
            Rotation.from_rotvec(rotvec_y) * self.rot

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 1e-4 * self.rot.as_matrix()[:3, :3] @ \
            np.array([dx, dy, dz])


class NeRFGUI:
    """Live viewer (gui.py:62-421); requires dearpygui."""

    def __init__(self, opt, trainer, train_loader=None, debug=True):
        try:
            import dearpygui.dearpygui as dpg  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "NeRFGUI requires the optional 'dearpygui' package, which is "
                "not installed in this environment") from e
        self.dpg = __import__("dearpygui.dearpygui", fromlist=["dearpygui"])
        self.opt = opt
        self.W = opt.W
        self.H = opt.H
        self.cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.trainer = trainer
        self.train_loader = train_loader
        self.training = False
        self.step = 0
        self.render_buffer = np.zeros((self.W, self.H, 3), dtype=np.float32)
        self.need_update = True
        self.spp = 1
        self.mode = "image"
        self._register_ui()

    # -- rendering -----------------------------------------------------
    def test_step(self):
        import jax.numpy as jnp
        from .data.rays import get_rays
        from .models import renderer as R
        pose = jnp.asarray(self.cam.pose[None])
        rays = get_rays(pose, self.cam.intrinsics, self.H, self.W)
        out = R.render(self.trainer.net, self.trainer.eval_params(),
                       rays["rays_o"], rays["rays_d"], staged=True,
                       max_ray_batch=self.opt.max_ray_batch,
                       num_steps=getattr(self.opt, "num_steps", 128),
                       upsample_steps=0, bg_color=1.0)
        key = "image" if self.mode == "image" else "depth"
        img = np.asarray(out[key]).reshape(self.H, self.W, -1)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
        self.render_buffer = img.astype(np.float32)
        self.need_update = False

    def train_step(self):
        for data in self.train_loader:
            self.trainer.global_step += 1
            self.trainer.train_step(data)
            self.step += 1
            break
        self.need_update = True

    # -- UI -------------------------------------------------------------
    def _register_ui(self):
        dpg = self.dpg
        dpg.create_context()
        with dpg.texture_registry(show=False):
            dpg.add_raw_texture(self.W, self.H, self.render_buffer,
                                format=dpg.mvFormat_Float_rgb,
                                tag="_texture")
        with dpg.window(tag="_primary_window", width=self.W, height=self.H):
            dpg.add_image("_texture")
        dpg.set_primary_window("_primary_window", True)

        with dpg.window(label="Control", width=300, height=200):
            def toggle_train(sender, app_data):
                self.training = not self.training
            dpg.add_button(label="start/stop training", callback=toggle_train)

        def drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])
            self.need_update = True

        def wheel(sender, app_data):
            self.cam.scale(app_data)
            self.need_update = True

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                       callback=drag)
            dpg.add_mouse_wheel_handler(callback=wheel)

        dpg.create_viewport(title="nerfsafetyvalidation-tpu",
                            width=self.W, height=self.H, resizable=False)
        dpg.setup_dearpygui()
        dpg.show_viewport()

    def render(self):
        dpg = self.dpg
        while dpg.is_dearpygui_running():
            if self.training and self.train_loader is not None:
                self.train_step()
            if self.need_update:
                self.test_step()
                dpg.set_value("_texture", self.render_buffer)
            dpg.render_dearpygui_frame()
        dpg.destroy_context()
