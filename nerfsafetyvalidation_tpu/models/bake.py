"""Bake a trained field into a compute-dense student for inference.

Why this exists (BENCH_NOTES "ceiling proof"): every random-row gather
mechanism on this chip floors at ~15-25 ns/row while the MXU idles, so a
hash/fold-table field — 2 HBM rows per sample — caps single-chip render
throughput at a few M rays/s no matter how the gathers are arranged. A
frequency-encoded MLP evaluates with ZERO gathers: ~30-200k MACs/sample
rides the 200 TFLOPs bf16 MXU instead of the 17 GB/s gather engine.

This module distills the trained flagship (teacher — any backbone with
`apply(params, x, d) -> (sigma, rgb)`) into such a student by direct
function regression: sample points (half uniform in the bound, half
jittered inside occupied grid cells so the surface shell dominates),
regress log1p(sigma) everywhere and rgb where the teacher says matter
(opacity-weighted). The student is a stock NeRFNetwork with
encoding="frequency", so it drops into every renderer path unchanged —
including render_frame_guided, whose full-res pass then runs entirely
gather-free.

This is the TPU analog of the baking step production NeRF systems run
before serving (SNeRG-style); the reference has no equivalent because on
GPU the hash gather is nearly free (gridencoder.cu kernel_grid's coalesced
table reads). The PSNR gate in bench.py keeps the bake honest: the baked
path only counts if the rendered image still clears the fidelity bar.
"""

from dataclasses import replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import NetworkConfig


def student_config(teacher_cfg: NetworkConfig, multires: int = 10,
                   hidden_dim: int = 128, num_layers: int = 4,
                   hidden_dim_color: int = 64) -> NetworkConfig:
    """Frequency-encoded MLP sized for MXU-bound inference (~60k
    MACs/sample at the defaults)."""
    return replace(
        teacher_cfg, encoding="frequency", multires=multires,
        num_layers=num_layers, hidden_dim=hidden_dim,
        hidden_dim_color=hidden_dim_color, fused=False,
        # grid/fold knobs don't apply to the student
        grid_ray=teacher_cfg.grid_ray)


def _occupied_cells(state, grid_size: int):
    """Morton-ordered occupied-cell xyz centers in [-1, 1] (cascade 0),
    host-side, from the density bitfield."""
    from ..ops.ray_ops import morton3d_invert
    bits = np.asarray(state.density_bitfield[: grid_size ** 3 // 8])
    occ_bits = np.unpackbits(bits, bitorder="little")
    idx = np.nonzero(occ_bits)[0].astype(np.int32)
    if idx.size == 0:
        idx = np.zeros((1,), dtype=np.int32)
    coords = np.asarray(morton3d_invert(jnp.asarray(idx)))
    return (2.0 * (coords.astype(np.float32) + 0.5) / grid_size - 1.0)


def distill(teacher_net, teacher_params, state, key, steps: int = 2000,
            batch: int = 32768, lr: float = 2e-3, surface_frac: float = 0.5,
            cfg: NetworkConfig = None, log_every: int = 0,
            sigma_opacity_weight: float = 0.0):
    """Returns (student_net, student_params, final_loss).

    teacher_params should be the fast-inference layout (to_folded) — the
    teacher is queried batch-by-batch inside the jitted distillation step.
    """
    from . import make_network

    tcfg = teacher_net.cfg
    cfg = cfg or student_config(tcfg)
    student = make_network(cfg)
    k_init, key = jax.random.split(key)
    params = student.init(k_init)

    cells = jnp.asarray(_occupied_cells(state, tcfg.grid_size))
    n_cells = cells.shape[0]
    bound = tcfg.bound
    cell_half = bound / tcfg.grid_size
    n_surf = int(batch * surface_frac)

    # adam with cosine decay (negative scale = descent in optax convention)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_schedule(
                         optax.cosine_decay_schedule(-lr, steps)))
    opt_state = tx.init(params)

    # opacity weight for the color loss: one reference-scale march step
    dt_ref = 2.0 * np.sqrt(3.0) / 512.0

    # teacher_params/cells enter as ARGUMENTS: closing over them would
    # inline the multi-MB teacher table as an HLO constant, which blows
    # past the remote-compile request limit on the tunneled TPU
    @jax.jit
    def step(params, opt_state, key, teacher_params, cells):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ci = jax.random.randint(k1, (n_surf,), 0, n_cells)
        x_surf = jnp.take(cells, ci, axis=0) * bound \
            + jax.random.uniform(k2, (n_surf, 3), minval=-1.5, maxval=1.5) \
            * cell_half
        x_uni = jax.random.uniform(k3, (batch - n_surf, 3),
                                   minval=-bound, maxval=bound)
        x = jnp.clip(jnp.concatenate([x_surf, x_uni], axis=0),
                     -bound, bound)
        d = jax.random.normal(k4, (batch, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        sig_t, rgb_t = teacher_net.apply(teacher_params, x, d)
        sig_t = jax.lax.stop_gradient(sig_t)
        rgb_t = jax.lax.stop_gradient(rgb_t)
        w_rgb = 1.0 - jnp.exp(-dt_ref * sig_t)

        def loss_fn(p):
            sig_s, rgb_s = student.apply(p, x, d)
            # optional extra weight on visible-surface samples: the render
            # only ever sees sigma through alpha = 1-exp(-dt sigma), so
            # errors at opaque samples matter most
            w_sig = 1.0 + sigma_opacity_weight * w_rgb
            l_sig = jnp.sum(w_sig * optax.huber_loss(
                jnp.log1p(sig_s), jnp.log1p(sig_t), delta=1.0)) \
                / jnp.sum(w_sig)
            l_rgb = jnp.sum(w_rgb[:, None] * (rgb_s - rgb_t) ** 2) \
                / (3.0 * jnp.sum(w_rgb) + 1e-6)
            return l_sig + l_rgb

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub,
                                       teacher_params, cells)
        if log_every and (i + 1) % log_every == 0:
            print(f"[distill] step {i + 1}/{steps} loss {float(loss):.5f}")
    return student, params, float(loss)


def finetune_render(student, sparams, teacher_net, teacher_params, state,
                    rays_o_pool, rays_d_pool, key, steps: int = 2000,
                    batch: int = 8192, K: int = 16,
                    margin_cells: float = 6.0, lr: float = 5e-4,
                    teacher_K: int = 16, dt_gamma: float = 1.0 / 64,
                    max_steps: int = 512, log_every: int = 0):
    """Phase-2 distillation in PIXEL space: shade the student through the
    exact depth-guided window scheme it deploys under (render_frame_guided's
    fine pass) and regress the composited pixel against the teacher's
    marched render. Point regression (distill) gets the field close; this
    phase optimizes what PSNR actually measures — per-pixel composites —
    including alpha interplay across the K window samples that pointwise
    sigma/rgb losses cannot see.

    The deployed windows come from a 3x3-dilated min/max of a PREPASS
    march with a fixed margin — their widths and centers vary, and
    alpha = 1 - exp(-dtw * sigma) couples sigma to the window width dtw.
    A fine-tune on one fixed window geometry overfits that dtw (measured:
    -0.8 dB at 800^2 despite 4e-4 train MSE), so each step samples a
    RANDOM window geometry per ray: margin scale in [0.7, 2.2], center
    jitter +/- margin/2, and a `fullspan_frac` fraction of hit rays shaded
    over the whole [near, far] segment. A small point-regression anchor
    (`anchor_weight`) keeps the sigma field itself near the teacher so the
    student-driven prepass march stays accurate.

    rays_o_pool/rays_d_pool: [P, 3] ray pool drawn from scene-covering
    poses (the caller samples them from training-like cameras). Returns
    (sparams, final_loss)."""
    from . import renderer as R

    cfg = teacher_net.cfg
    bound = cfg.bound
    cell = 2.0 * bound / cfg.grid_size
    margin = margin_cells * cell
    n_pool = rays_o_pool.shape[0]
    aabb = R.aabb_of(cfg)
    fullspan_frac = 0.2
    anchor_weight = 0.25
    dt_ref = 2.0 * np.sqrt(3.0) / 512.0

    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_schedule(
                         optax.cosine_decay_schedule(-lr, steps)))
    opt_state = tx.init(sparams)

    @jax.jit
    def step_fn(sparams, opt_state, key, teacher_params, ro_pool, rd_pool):
        k_idx, k_m, k_c, k_f = jax.random.split(key, 4)
        idx = jax.random.randint(k_idx, (batch,), 0, n_pool)
        ro = jnp.take(ro_pool, idx, axis=0)
        rd = jnp.take(rd_pool, idx, axis=0)

        t_out = R.run_grid(teacher_net, teacher_params, state, ro, rd,
                           max_samples=teacher_K, max_steps=max_steps,
                           dt_gamma=dt_gamma, bg_color=1.0,
                           samples_per_hit=2)
        target = jax.lax.stop_gradient(t_out["image"])
        ws_t = jax.lax.stop_gradient(t_out["weights_sum"])
        dabs = jax.lax.stop_gradient(t_out["depth_abs"])

        from ..ops.ray_ops import near_far_from_aabb
        nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.min_near)
        hit = ws_t > 0.1
        t_hit = dabs / jnp.clip(ws_t, 0.1, None)
        # randomized window geometry (see docstring)
        mscale = jax.random.uniform(k_m, (batch,), minval=0.7, maxval=2.2)
        cjit = jax.random.uniform(k_c, (batch,), minval=-0.5,
                                  maxval=0.5) * margin
        m_r = margin * mscale
        ctr = t_hit + cjit
        full = jax.random.uniform(k_f, (batch,)) < fullspan_frac
        t0 = jnp.where(hit & ~full, jnp.clip(ctr - m_r, nears, fars), nears)
        t1 = jnp.where(hit & ~full, jnp.clip(ctr + m_r, nears, fars), fars)

        dtw = (t1 - t0) / K
        jj = jnp.arange(K, dtype=jnp.float32) + 0.5
        z = t0[:, None] + dtw[:, None] * jj[None, :]              # [B, K]
        xyz = jnp.clip(ro[:, None, :] + z[..., None] * rd[:, None, :],
                       -bound, bound).reshape(-1, 3)
        dirs = jnp.broadcast_to(rd[:, None, :],
                                (batch, K, 3)).reshape(-1, 3)
        # teacher point targets at the SAME samples (sigma-field anchor)
        sig_a, rgb_a = teacher_net.apply(teacher_params, xyz, dirs)
        sig_a = jax.lax.stop_gradient(sig_a)
        rgb_a = jax.lax.stop_gradient(rgb_a)
        w_a = 1.0 - jnp.exp(-dt_ref * sig_a)

        def loss_fn(p):
            sig, rgb = student.apply(p, xyz, dirs)
            l_anchor = jnp.mean(optax.huber_loss(
                jnp.log1p(sig), jnp.log1p(sig_a), delta=1.0)) \
                + jnp.sum(w_a[:, None] * (rgb - rgb_a) ** 2) \
                / (3.0 * jnp.sum(w_a) + 1e-6)
            sig = sig.reshape(batch, K)
            rgb = rgb.reshape(batch, K, 3)
            alphas = 1.0 - jnp.exp(-dtw[:, None] * cfg.density_scale * sig)
            shifted = jnp.concatenate(
                [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-15],
                axis=-1)
            trans = jnp.cumprod(shifted, axis=-1)[:, :-1]
            wgt = alphas * trans
            ws = jnp.sum(wgt, axis=-1)
            img = jnp.sum(wgt[..., None] * rgb, axis=-2) \
                + (1.0 - ws)[..., None]                          # white bg
            return jnp.mean((img - target) ** 2) \
                + anchor_weight * l_anchor

        loss, grads = jax.value_and_grad(loss_fn)(sparams)
        updates, opt_state = tx.update(grads, opt_state, sparams)
        return optax.apply_updates(sparams, updates), opt_state, loss

    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        sparams, opt_state, loss = step_fn(sparams, opt_state, sub,
                                           teacher_params, rays_o_pool,
                                           rays_d_pool)
        if log_every and (i + 1) % log_every == 0:
            print(f"[finetune] step {i + 1}/{steps} loss {float(loss):.6f}")
    return sparams, float(loss)
