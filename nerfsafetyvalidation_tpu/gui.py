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
    """Live viewer (reference nerf/gui.py:62-421) with the full control
    panel: train start/stop + reset + checkpoint/mesh buttons, image/depth
    mode combo, progressive supersampling (spp accumulation, gui.py:141-147),
    dynamic resolution (:137-141) and dynamic train-steps (:113-117)
    adaptation, background color, FoV, dt_gamma and per-axis aabb_infer
    sliders (:281-324).

    The panel logic is headless (pass headless=True): every widget callback
    is a plain method, so the whole state machine runs and is tested without
    a display; dearpygui (optional, absent from the hermetic TPU image) is
    only the thin binding layer created in _register_ui.
    """

    MAX_TRAIN_MS = 500.0   # per-frame training budget (gui.py:114)
    MAX_INFER_MS = 200.0   # per-frame render budget (gui.py:138)

    def __init__(self, opt, trainer, train_loader=None, debug=True,
                 headless=False):
        self.opt = opt
        self.W = opt.W
        self.H = opt.H
        self.cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.trainer = trainer
        self.train_loader = train_loader
        self.training = False
        self.step = 0
        self.train_steps = 16
        self.render_buffer = np.zeros((self.H, self.W, 3), dtype=np.float32)
        self.need_update = True
        self.spp = 1
        self.max_spp = getattr(opt, "max_spp", 64)
        self.mode = "image"
        self.bg_color = np.ones(3, dtype=np.float32)
        self.dynamic_resolution = True
        self.downscale = 1.0
        self.dt_gamma = getattr(opt, "dt_gamma", 0.0)
        b = float(trainer.net.cfg.bound)
        self.aabb = np.array([-b, -b, -b, b, b, b], dtype=np.float32)
        self.infer_ms = 0.0
        self.train_ms = 0.0
        self._render_jit = None
        self.dpg = None
        if not headless:
            try:
                import dearpygui.dearpygui as dpg  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "NeRFGUI requires the optional 'dearpygui' package; "
                    "pass headless=True to drive the panel logic without a "
                    "display") from e
            self.dpg = __import__("dearpygui.dearpygui",
                                  fromlist=["dearpygui"])
            self._register_ui()

    # -- widget callbacks (gui.py:207-324) ------------------------------
    def toggle_train(self):
        self.training = not self.training

    def set_mode(self, mode):
        """image/depth combo (gui.py mode selector)."""
        assert mode in ("image", "depth")
        self.mode = mode
        self.need_update = True

    def set_bg_color(self, rgb):
        self.bg_color = np.asarray(rgb, dtype=np.float32)[:3]
        self.need_update = True

    def set_fovy(self, fovy):
        self.cam.fovy = float(fovy)
        self.need_update = True

    def set_dt_gamma(self, v):
        self.dt_gamma = float(v)
        self.need_update = True

    def set_aabb(self, index, value):
        """aabb_infer slider (gui.py:304)."""
        self.aabb[index] = float(value)
        self.need_update = True

    def set_dynamic_resolution(self, flag):
        self.dynamic_resolution = bool(flag)
        if not flag:
            self.downscale = 1.0
        self.need_update = True

    def reset_model(self):
        """Re-init parameters + occupancy state (gui.py:218-228)."""
        import jax
        from .models import renderer as R
        tr = self.trainer
        tr.params = tr.net.init(jax.random.PRNGKey(
            getattr(tr.opt, "seed", 0)))
        tr.opt_state = tr.tx.init(tr.params)
        if tr.renderer_state is not None:
            tr.renderer_state = R.RendererState.create(
                tr.net.cfg.cascade, tr.net.cfg.grid_size)
        tr.global_step = 0
        self.step = 0
        self.need_update = True

    def save_checkpoint(self):
        return self.trainer.save_checkpoint(full=True)

    def save_mesh(self):
        self.trainer.save_mesh()

    # -- rendering -------------------------------------------------------
    def _render_fn(self):
        if self._render_jit is None:
            import jax
            from .models import renderer as R
            net = self.trainer.net

            @jax.jit
            def f(params, ro, rd, bg, aabb):
                out = R.run(net, params, ro, rd,
                            num_steps=getattr(self.opt, "num_steps", 128),
                            upsample_steps=0, bg_color=bg, aabb=aabb)
                return out["image"], out["depth"]

            self._render_jit = f
        return self._render_jit

    def test_step(self):
        """Progressive render (gui.py:120-153): re-render on update at the
        adapted resolution, otherwise accumulate supersampling up to
        max_spp; adapt downscale to the frame budget."""
        if not (self.need_update or self.spp < self.max_spp):
            return
        import time as _time
        import jax.numpy as jnp
        from .data.rays import get_rays

        ds = self.downscale if self.dynamic_resolution else 1.0
        rh = max(int(self.H * ds), 8)
        rw = max(int(self.W * ds), 8)
        focal = rh / (2 * np.tan(np.radians(self.cam.fovy) / 2))
        # sub-pixel golden-ratio jitter for the supersampling accumulation
        # (the reference perturbs sampling when spp > 1, gui.py:141-147)
        jx = jy = 0.0
        if not self.need_update:
            jx = ((self.spp * 0.618034) % 1.0) - 0.5
            jy = ((self.spp * 0.381966) % 1.0) - 0.5
        intr = (focal, focal, rw / 2 + jx, rh / 2 + jy)
        t0 = _time.perf_counter()
        pose = jnp.asarray(self.cam.pose[None])
        rays = get_rays(pose, intr, rh, rw)
        img, depth = self._render_fn()(
            self.trainer.eval_params(),
            rays["rays_o"].reshape(-1, 3), rays["rays_d"].reshape(-1, 3),
            jnp.asarray(self.bg_color), jnp.asarray(self.aabb))
        out = img if self.mode == "image" else \
            jnp.repeat(depth[:, None], 3, axis=1)
        frame = np.asarray(out, dtype=np.float32).reshape(rh, rw, 3)
        if (rh, rw) != (self.H, self.W):
            reps_h = int(np.ceil(self.H / rh))
            reps_w = int(np.ceil(self.W / rw))
            frame = np.repeat(np.repeat(frame, reps_h, 0), reps_w, 1)
            frame = frame[:self.H, :self.W]
        self.infer_ms = (_time.perf_counter() - t0) * 1000.0

        if self.dynamic_resolution:
            full_t = self.infer_ms / (ds ** 2)
            new_ds = min(1.0, max(1.0 / 4,
                                  np.sqrt(self.MAX_INFER_MS / max(full_t,
                                                                  1e-3))))
            if new_ds > self.downscale * 1.2 or new_ds < self.downscale * 0.8:
                self.downscale = float(new_ds)

        if self.need_update:
            self.render_buffer = frame
            self.spp = 1
            self.need_update = False
        else:
            self.render_buffer = (self.render_buffer * self.spp + frame) \
                / (self.spp + 1)
            self.spp += 1

    def train_step(self):
        """Run train_steps iterations and adapt the count to the frame
        budget (gui.py:95-117)."""
        import time as _time
        t0 = _time.perf_counter()
        it = iter(self.train_loader)
        for _ in range(self.train_steps):
            try:
                data = next(it)
            except StopIteration:
                it = iter(self.train_loader)
                data = next(it)
            self.trainer.global_step += 1
            self.trainer.train_step(data)
            self.step += 1
        self.train_ms = (_time.perf_counter() - t0) * 1000.0
        full_t = self.train_ms / self.train_steps * 16
        new_steps = min(16, max(4, int(16 * self.MAX_TRAIN_MS
                                       / max(full_t, 1e-3))))
        if new_steps > self.train_steps * 1.2 or \
                new_steps < self.train_steps * 0.8:
            self.train_steps = new_steps
        self.need_update = True

    def status(self):
        """The panel's readouts (gui.py _log_* fields)."""
        return {
            "train_time": f"{self.train_ms:.4f}ms",
            "infer_time": f"{self.infer_ms:.4f}ms",
            "spp": self.spp,
            "resolution": f"{int(self.downscale * self.W)}x"
                          f"{int(self.downscale * self.H)}",
            "step": self.step,
            "mode": self.mode,
        }

    # -- dearpygui binding ----------------------------------------------
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

        with dpg.window(label="Control", tag="_control_window", width=400,
                        height=350):
            with dpg.group(horizontal=True):
                dpg.add_text("Train time: ")
                dpg.add_text("no data", tag="_log_train_time")
            with dpg.group(horizontal=True):
                dpg.add_text("Infer time: ")
                dpg.add_text("no data", tag="_log_infer_time")
            with dpg.group(horizontal=True):
                dpg.add_text("SPP: ")
                dpg.add_text("1", tag="_log_spp")
            dpg.add_text(f"{self.W}x{self.H}", tag="_log_resolution")

            with dpg.group(horizontal=True):
                dpg.add_button(label="start/stop", tag="_button_train",
                               callback=lambda s, a: self.toggle_train())
                dpg.add_button(label="reset",
                               callback=lambda s, a: self.reset_model())
                dpg.add_button(label="save ckpt",
                               callback=lambda s, a: self.save_checkpoint())
                dpg.add_button(label="mesh",
                               callback=lambda s, a: self.save_mesh())
            dpg.add_text("", tag="_log_train_log")

            dpg.add_combo(("image", "depth"), label="mode",
                          default_value=self.mode,
                          callback=lambda s, a: self.set_mode(a))
            dpg.add_checkbox(label="dynamic resolution",
                             default_value=self.dynamic_resolution,
                             callback=lambda s, a:
                                 self.set_dynamic_resolution(a))
            dpg.add_color_edit((255, 255, 255), label="Background Color",
                               no_alpha=True,
                               callback=lambda s, a:
                                   self.set_bg_color(np.asarray(a[:3])))
            dpg.add_slider_int(label="FoV (vertical)", min_value=1,
                               max_value=120, default_value=int(self.cam.fovy),
                               callback=lambda s, a: self.set_fovy(a))
            dpg.add_slider_float(label="dt_gamma", min_value=0.0,
                                 max_value=0.1, default_value=self.dt_gamma,
                                 callback=lambda s, a: self.set_dt_gamma(a))
            for i, name in enumerate(("x-", "y-", "z-", "x+", "y+", "z+")):
                dpg.add_slider_float(
                    label=f"aabb {name}", min_value=-abs(self.aabb[3]),
                    max_value=abs(self.aabb[3]),
                    default_value=float(self.aabb[i]),
                    callback=lambda s, a, u=i: self.set_aabb(u, a))

        def drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])
            self.need_update = True

        def wheel(sender, app_data):
            self.cam.scale(app_data)
            self.need_update = True

        def pan(sender, app_data):
            self.cam.pan(app_data[1], app_data[2])
            self.need_update = True

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                       callback=drag)
            dpg.add_mouse_wheel_handler(callback=wheel)
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                       callback=pan)

        dpg.create_viewport(title="nerfsafetyvalidation-tpu",
                            width=self.W, height=self.H, resizable=False)
        dpg.setup_dearpygui()
        dpg.show_viewport()

    def render(self):
        dpg = self.dpg
        while dpg.is_dearpygui_running():
            if self.training and self.train_loader is not None:
                self.train_step()
                st = self.status()
                dpg.set_value("_log_train_time", st["train_time"])
                dpg.set_value("_log_train_log",
                              f"step = {self.step:5d} "
                              f"(+{self.train_steps:2d})")
            self.test_step()
            st = self.status()
            dpg.set_value("_log_infer_time", st["infer_time"])
            dpg.set_value("_log_resolution", st["resolution"])
            dpg.set_value("_log_spp", st["spp"])
            dpg.set_value("_texture", self.render_buffer)
            dpg.render_dearpygui_frame()
        dpg.destroy_context()
