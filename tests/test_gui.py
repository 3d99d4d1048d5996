"""NeRFGUI panel state machine (headless) — reference nerf/gui.py:62-421."""
import numpy as np
import jax
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig, TrainConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.train.trainer import Trainer
from nerfsafetyvalidation_tpu.gui import NeRFGUI, OrbitCamera


class Opt:
    W = 32
    H = 32
    radius = 2.0
    fovy = 60.0
    max_ray_batch = 1024
    num_steps = 8
    dt_gamma = 0.0
    max_spp = 4
    seed = 0


@pytest.fixture(scope="module")
def gui():
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0)
    net = NeRFNetwork(cfg)
    opt = TrainConfig(num_steps=8, upsample_steps=0, workspace=None)
    tr = Trainer("gui", opt, net, workspace=None)
    return NeRFGUI(Opt(), tr, headless=True)


def test_initial_render_and_spp_accumulation(gui):
    gui.test_step()
    assert gui.spp == 1 and not gui.need_update
    first = gui.render_buffer.copy()
    assert np.isfinite(first).all() and first.shape == (32, 32, 3)
    gui.test_step()   # accumulate supersample
    assert gui.spp == 2
    gui.test_step()
    gui.test_step()
    assert gui.spp == 4
    gui.test_step()   # at max_spp: no further work
    assert gui.spp == 4


def test_mode_toggle_renders_depth(gui):
    gui.set_mode("depth")
    assert gui.need_update
    gui.test_step()
    img = gui.render_buffer
    # depth is replicated to 3 channels -> grayscale
    np.testing.assert_allclose(img[..., 0], img[..., 1])
    gui.set_mode("image")
    gui.test_step()


def test_sliders_mark_dirty(gui):
    gui.test_step()
    for call in (lambda: gui.set_fovy(70),
                 lambda: gui.set_dt_gamma(0.01),
                 lambda: gui.set_bg_color([0.0, 0.0, 0.0]),
                 lambda: gui.set_aabb(0, -0.5)):
        gui.need_update = False
        call()
        assert gui.need_update
    assert gui.aabb[0] == -0.5
    gui.test_step()
    assert np.isfinite(gui.render_buffer).all()


def test_dynamic_resolution_adapts(gui):
    gui.set_dynamic_resolution(True)
    gui.infer_ms = 0.0
    gui.downscale = 1.0
    # simulate a slow frame: force adaptation path via test_step timing
    gui.MAX_INFER_MS = 1e-6   # everything is "too slow"
    gui.need_update = True
    gui.test_step()
    assert gui.downscale < 1.0
    gui.MAX_INFER_MS = 1e9    # everything is fast again
    gui.need_update = True
    gui.test_step()
    gui.need_update = True
    gui.test_step()
    assert gui.downscale == 1.0
    gui.MAX_INFER_MS = NeRFGUI.MAX_INFER_MS


def test_reset_and_status(gui):
    p_before = jax.tree_util.tree_leaves(gui.trainer.params)[0]
    gui.step = 123
    gui.reset_model()
    assert gui.step == 0
    st = gui.status()
    assert set(st) >= {"train_time", "infer_time", "spp", "resolution",
                       "step", "mode"}


def test_orbit_camera_controls():
    cam = OrbitCamera(64, 64, r=2.0, fovy=60.0)
    p0 = cam.pose.copy()
    cam.orbit(30, 10)
    assert not np.allclose(cam.pose, p0)
    cam.scale(1)
    assert cam.radius < 2.0
    cam.pan(5, 5)
    assert not np.allclose(cam.center, 0)
