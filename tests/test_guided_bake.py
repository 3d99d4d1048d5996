"""Depth-guided frame render (march only at prepass) and teacher->student
distillation (models/bake.py) — the round-3 gather-wall attack paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.config import NetworkConfig
from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.ops.ray_ops import (packbits, morton3d,
                                                  occupancy_to_skip_grid)


class _SphereMaskedNet:
    """Random net whose density is confined to the sphere the occupancy
    grid marks — the trained-scene consistency (field ~0 in free space)
    the guided fine pass relies on."""

    def __init__(self, net, radius=0.4):
        self.net = net
        self.cfg = net.cfg
        self.radius = radius

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, x, d):
        sigma, rgb = self.net.apply(params, x, d)
        inside = jnp.linalg.norm(x, axis=-1) < self.radius
        return jnp.where(inside, sigma, 0.0), rgb


@pytest.fixture(scope="module")
def frame_scene():
    """Sphere occupancy + an orthographic H x W frame of rays marching +z."""
    # density_scale makes the random-init field render as a SOLID surface
    # (trained-scene regime) — the guided prepass keys off weights_sum>0.1
    cfg = NetworkConfig(num_levels=2, desired_resolution=32, bound=1.0,
                        grid_ray=True, density_scale=50.0)
    net = _SphereMaskedNet(NeRFNetwork(cfg))
    params = net.init(jax.random.PRNGKey(0))
    G = cfg.grid_size
    g = np.arange(G)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * (np.stack([xx, yy, zz], -1) + 0.5) / G - 1.0
    occ = (np.linalg.norm(c, axis=-1) < 0.4).astype(np.float32) * 100
    grid = np.zeros((cfg.cascade, G ** 3), np.float32)
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    idx = np.asarray(morton3d(jnp.asarray(coords)))
    grid[0, idx] = occ.ravel()
    gridj = jnp.asarray(grid)
    state = R.RendererState(gridj, packbits(gridj, 0.5), jnp.asarray(1.0),
                            jnp.asarray(1),
                            occupancy_to_skip_grid(gridj > 0.5, G))
    H = W = 32
    ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, H),
                         np.linspace(-0.9, 0.9, W), indexing="ij")
    ro = np.stack([xs.ravel(), ys.ravel(), np.full(H * W, -2.5)], -1)
    rd = np.broadcast_to(np.asarray([0.0, 0.0, 1.0]), (H * W, 3))
    return (net, params, state, jnp.asarray(ro, jnp.float32),
            jnp.asarray(rd, jnp.float32), H, W)


def test_guided_matches_fast(frame_scene):
    """Guided (prepass-windowed uniform sampling) must agree with the
    marched fast path at PSNR > 30 dB — the windows bracket the same
    geometry the march finds."""
    net, params, state, ro, rd, H, W = frame_scene
    fast = R.render_frame_fast(net, params, state, ro, rd, tile=256,
                               max_samples=32, max_steps=128, march_tile=256)
    guided = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                   prepass_factor=4, max_samples=32,
                                   tile=256, max_steps=128, margin_cells=6.0,
                                   prepass_tile=1024, prepass_march_tile=1024)
    a = np.asarray(fast["image"])
    b = np.asarray(guided["image"])
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, f"guided vs fast PSNR {psnr:.1f} dB"
    # opacity masks agree on the bulk of pixels
    m_fast = np.asarray(fast["weights_sum"]) > 0.5
    m_gui = np.asarray(guided["weights_sum"]) > 0.5
    assert (m_fast == m_gui).mean() > 0.97


def test_guided_sky_is_background(frame_scene):
    net, params, state, ro, rd, H, W = frame_scene
    out = R.render_frame_guided(net, params, state, ro, -rd, H, W,
                                prepass_factor=4, max_samples=16,
                                tile=256, max_steps=64,
                                prepass_tile=1024, prepass_march_tile=1024)
    np.testing.assert_allclose(np.asarray(out["image"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 0.0,
                               atol=1e-6)


def test_depth_abs_is_opacity_weighted_t(frame_scene):
    """composite_marched's depth_abs = sum(w * t): for a saturating ray it
    sits inside the geometry's t-range."""
    net, params, state, ro, rd, H, W = frame_scene
    out = R.render_frame_fast(net, params, state, ro, rd, tile=256,
                              max_samples=32, max_steps=128, march_tile=256)
    ws = np.asarray(out["weights_sum"])
    dabs = np.asarray(out["depth_abs"])
    hit = ws > 0.9
    assert hit.any()
    # sphere radius 0.4 at origin; rays start at z=-2.5 -> t in [2.5-r-eps,
    # 2.5+r] for any hit ray (expected t is opacity-weighted)
    assert (dabs[hit] > 1.9).all() and (dabs[hit] < 3.0).all()
    assert np.allclose(dabs[~hit], 0.0, atol=1e-3)


def test_distill_student_tracks_teacher(frame_scene):
    net, params, state, ro, rd, H, W = frame_scene
    from nerfsafetyvalidation_tpu.models.bake import distill, student_config
    scfg = student_config(net.cfg, multires=4, hidden_dim=32, num_layers=2,
                          hidden_dim_color=16)
    student, sparams, loss = distill(net, params, state,
                                     jax.random.PRNGKey(1), steps=60,
                                     batch=512, cfg=scfg)
    assert np.isfinite(loss)
    # the student must beat a fresh random init on the distill objective
    fresh = student.init(jax.random.PRNGKey(99))
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (2048, 3), minval=-1.0, maxval=1.0)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2048, 3))
    sig_t, _ = net.apply(params, x, d)
    err = lambda p: float(jnp.mean(
        (jnp.log1p(student.apply(p, x, d)[0]) - jnp.log1p(sig_t)) ** 2))
    assert err(sparams) < err(fresh)
    # and the student drops into the guided renderer unchanged
    out = R.render_frame_guided(student, sparams, state, ro, rd, H, W,
                                prepass_factor=4, max_samples=16, tile=256,
                                max_steps=64, prepass_tile=1024,
                                prepass_march_tile=1024)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_finetune_render_improves_pixel_loss(frame_scene):
    """Phase-2 pixel-space fine-tune (models/bake.py finetune_render): runs,
    stays finite, and reduces the pixel regression loss vs the phase-1
    student on a held-out ray batch."""
    net, params, state, ro, rd, H, W = frame_scene
    from nerfsafetyvalidation_tpu.models.bake import (distill, student_config,
                                                      finetune_render)
    scfg = student_config(net.cfg, multires=4, hidden_dim=32, num_layers=2,
                          hidden_dim_color=16)
    student, sp0, _ = distill(net, params, state, jax.random.PRNGKey(1),
                              steps=40, batch=512, cfg=scfg)
    sp1, ft_loss = finetune_render(student, sp0, net, params, state,
                                   ro, rd, jax.random.PRNGKey(2),
                                   steps=40, batch=256, K=8,
                                   teacher_K=8, max_steps=64)
    assert np.isfinite(ft_loss)

    # held-out comparison: render both students through the guided path
    # and compare against the teacher's guided render
    ref = np.asarray(R.render_frame_guided(
        net, params, state, ro, rd, H, W, prepass_factor=4, max_samples=8,
        tile=256, max_steps=64, prepass_tile=1024,
        prepass_march_tile=1024)["image"])

    def err(sp):
        img = np.asarray(R.render_frame_guided(
            student, sp, state, ro, rd, H, W, prepass_factor=4,
            max_samples=8, tile=256, max_steps=64, prepass_tile=1024,
            prepass_march_tile=1024)["image"])
        assert np.isfinite(img).all()
        return float(np.mean((img - ref) ** 2))

    assert err(sp1) <= err(sp0) * 1.5   # no catastrophic drift



def test_guided_fine_orders_agree(frame_scene):
    """fine_order='natural' (raster tiles, zero permutation) must be
    BIT-EXACT with fine_order='partition' — same windows, same shading,
    only the tile grouping differs."""
    net, params, state, ro, rd, H, W = frame_scene
    kw = dict(prepass_factor=4, max_samples=32, max_steps=128,
              margin_cells=6.0, prepass_tile=1024, prepass_march_tile=1024)
    a = R.render_frame_guided(net, params, state, ro, rd, H, W, tile=256,
                              fine_order="partition", **kw)
    b = R.render_frame_guided(net, params, state, ro, rd, H, W, tile=256,
                              fine_order="natural", **kw)
    # non-divisor tile exercises the natural-order padding
    c = R.render_frame_guided(net, params, state, ro, rd, H, W, tile=100,
                              fine_order="natural", **kw)
    for k in ("image", "depth", "aggregated_density", "weights_sum"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(c[k]))


def test_guided_scout_prepass_matches_march(frame_scene):
    """prepass_mode='scout' (uniform density scout fused into the fine
    jit, zero occupancy-grid traffic) places windows that agree with the
    marched prepass to > 35 dB on the sphere scene."""
    net, params, state, ro, rd, H, W = frame_scene
    kw = dict(prepass_factor=4, max_samples=32, max_steps=128,
              margin_cells=6.0, prepass_tile=1024,
              prepass_march_tile=1024, tile=256)
    a = R.render_frame_guided(net, params, state, ro, rd, H, W,
                              prepass_mode="march", **kw)
    b = R.render_frame_guided(net, params, state, ro, rd, H, W,
                              prepass_mode="scout", scout_samples=64, **kw)
    mse = float(np.mean((np.asarray(a["image"]) - np.asarray(b["image"])) ** 2))
    assert -10.0 * np.log10(max(mse, 1e-12)) > 35.0
    # scout sky stays background
    sky = R.render_frame_guided(net, params, state, ro, -rd, H, W,
                                prepass_mode="scout", scout_samples=32, **kw)
    np.testing.assert_allclose(np.asarray(sky["image"]), 1.0, atol=1e-6)


def test_scout_occupancy_mask_rejects_uncarved_junk(frame_scene):
    """A really-trained field has unconstrained (junk) density in space
    the marched training never sampled; the occupancy grid hides it from
    the marcher but an UNMASKED scout reads it and drags the windows
    (measured 28.15 -> 18.4 dB at 800^2 on the trained bench scene). The
    scout must mask each sample by its occupancy bit so its windows track
    the marched prepass on such a field."""
    net, params, state, ro, rd, H, W = frame_scene

    class _JunkOutsideNet:
        """Sphere field plus solid junk density OUTSIDE the occupancy
        sphere (where the grid says empty)."""

        def __init__(self, inner):
            self.net = inner
            self.cfg = inner.cfg

        def apply(self, p, x, d):
            sigma, rgb = self.net.apply(p, x, d)
            outside = jnp.linalg.norm(x, axis=-1) >= self.net.radius
            return jnp.where(outside, 5.0, sigma), rgb

    junk = _JunkOutsideNet(net)
    kw = dict(prepass_factor=4, max_samples=32, max_steps=128,
              margin_cells=6.0, prepass_tile=1024,
              prepass_march_tile=1024, tile=256)
    a = R.render_frame_guided(junk, params, state, ro, rd, H, W,
                              prepass_mode="march", **kw)
    b = R.render_frame_guided(junk, params, state, ro, rd, H, W,
                              prepass_mode="scout", scout_samples=64, **kw)
    mse = float(np.mean((np.asarray(a["image"])
                         - np.asarray(b["image"])) ** 2))
    assert -10.0 * np.log10(max(mse, 1e-12)) > 35.0


def test_scout_mask_helper_zeroes_unoccupied(frame_scene):
    """_scout_field(bitfield=...) zeroes opacity for rays whose samples
    all land in unoccupied cells, matching the marcher's view."""
    net, params, state, ro, rd, H, W = frame_scene
    cfg = net.cfg
    aabb = R.aabb_of(cfg)
    # rays aimed AWAY from the sphere: marcher sees empty space
    pre_o = jnp.asarray([[0.9, 0.9, -2.0], [-0.9, 0.8, -2.0]])
    pre_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])

    class _Solid:
        cfg = net.cfg

        @staticmethod
        def apply(p, x, d):
            return jnp.full(x.shape[:-1], 5.0), jnp.zeros_like(x)

    _, ws_unmasked = R._scout_field(_Solid(), params, pre_o, pre_d, 32,
                                    cfg, aabb)
    _, ws_masked = R._scout_field(_Solid(), params, pre_o, pre_d, 32,
                                  cfg, aabb,
                                  bitfield=state.density_bitfield,
                                  grid_size=cfg.grid_size)
    assert float(np.min(np.asarray(ws_unmasked))) > 0.5
    assert float(np.max(np.asarray(ws_masked))) < 1e-6


def test_adaptive_k_same_k_is_identical(frame_scene):
    """adaptive_k with both buckets at the same K must be bit-identical
    to the non-adaptive path regardless of the span threshold."""
    net, params, state, ro, rd, H, W = frame_scene
    base = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                 prepass_factor=4, max_samples=32,
                                 tile=256, max_steps=128, margin_cells=6.0,
                                 prepass_tile=1024, prepass_march_tile=1024)
    for span in (0.0, 12.5, 1e9):
        out = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                    prepass_factor=4, max_samples=32,
                                    tile=256, max_steps=128,
                                    margin_cells=6.0, prepass_tile=1024,
                                    prepass_march_tile=1024,
                                    adaptive_k=32,
                                    adaptive_span_cells=span)
        np.testing.assert_array_equal(np.asarray(base["image"]),
                                      np.asarray(out["image"]))


def test_adaptive_k_narrow_windows_match_full_k(frame_scene):
    """With the sphere scene's narrow windows eligible for the small
    bucket, the adaptive render must stay close to the full-K render
    (the small bucket keeps sampling density at or above full-span K)."""
    net, params, state, ro, rd, H, W = frame_scene
    base = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                 prepass_factor=4, max_samples=32,
                                 tile=256, max_steps=128, margin_cells=6.0,
                                 prepass_tile=1024, prepass_march_tile=1024)
    out = R.render_frame_guided(net, params, state, ro, rd, H, W,
                                prepass_factor=4, max_samples=32,
                                tile=256, max_steps=128, margin_cells=6.0,
                                prepass_tile=1024, prepass_march_tile=1024,
                                adaptive_k=16,
                                adaptive_span_cells=16.0)
    a = np.asarray(base["image"])
    b = np.asarray(out["image"])
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 35.0, f"adaptive-K vs full-K PSNR {psnr:.1f} dB"
