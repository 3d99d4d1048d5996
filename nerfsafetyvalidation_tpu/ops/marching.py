"""Occupancy-grid ray marching, TPU-style.

Parity target: reference raymarching/src/raymarching.cu —
kernel_march_rays_train (:313-495) and the inference marcher (:706-825):
DDA through a multi-cascade 128^3 occupancy bitfield with
  dt = clamp(t * dt_gamma, dt_min, dt_max),
  dt_min = 2*sqrt(3)/max_steps, dt_max = 2*sqrt(3)*2^(C-1)/H,
mip level = max(mip_from_pos, mip_from_dt), and empty-voxel skipping by
jumping to the next cell boundary (:392-403).

TPU design (SURVEY.md §7 hard part #1): the CUDA version compacts a variable
number of samples per ray with atomics. XLA needs static shapes, so marching
runs as a vectorized lax.while_loop over ALL rays at once, each ray carrying
(t, count); emitted samples land in fixed [N, K] slot buffers via one-hot
scatter on the VPU (cheap: N*K adds per step). Rays that exhaust far/slots
go inactive; the loop ends when all rays are done. The result feeds one
dense batched network query + masked composite — MXU-shaped, no divergence.
Replaces the reference's non-deterministic atomicAdd compaction with a
deterministic layout (fidelity improvement).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ray_ops import morton3d

SQRT3 = float(np.sqrt(3.0))


def _mip_from_pos(pos, cascade):
    """Smallest cascade whose [-2^l, 2^l] box contains pos
    (raymarching.cu mip_from_pos)."""
    mx = jnp.max(jnp.abs(pos), axis=-1)
    # level l covers |x| < 2^l; level = ceil(log2(mx)) clamped to [0, C-1]
    lvl = jnp.ceil(jnp.log2(jnp.maximum(mx, 1e-8)))
    return jnp.clip(lvl, 0, cascade - 1).astype(jnp.int32)


def _mip_from_dt(dt, grid_size, cascade):
    """Cascade whose cell size (2*2^l/H) covers dt (raymarching.cu
    mip_from_dt)."""
    lvl = jnp.ceil(jnp.log2(jnp.maximum(dt * grid_size / 2.0, 1e-8)))
    return jnp.clip(lvl, 0, cascade - 1).astype(jnp.int32)


def march_rays(rays_o, rays_d, nears, fars, bitfield, bound: float,
               cascade: int, grid_size: int = 128, max_samples: int = 64,
               max_steps: int = 1024, dt_gamma: float = 0.0, perturb=None,
               skip_grid=None, samples_per_hit: int = 1, fixed_iters=None,
               resume_carry=None, return_carry: bool = False):
    """Generate up to `max_samples` occupied-space samples per ray.

    Returns dict: xyzs [N, K, 3], deltas [N, K] (dt), rs [N, K] (depth step,
    the reference's deltas[...,1]), ts [N, K], mask [N, K] bool, count [N].

    Phased mode (renderer.render_frame_fast): `fixed_iters` runs exactly
    that many body iterations as a lax.scan (no lockstep early exit — the
    body is a no-op for finished rays) and the carry can be handed back via
    return_carry; `resume_carry` continues a previous phase's (t, count,
    ts) — rays may be PERMUTED between phases as long as their carry rows
    travel with them, which is how the sorted phase-2 march lets
    whole-tile while_loops exit at zero iterations."""
    N = rays_o.shape[0]
    K = max_samples
    H = grid_size
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascade - 1)) / H

    t0 = nears
    if perturb is not None:
        t0 = t0 + dt_min * jax.random.uniform(perturb, nears.shape)

    slot_iota = jnp.arange(K)

    # the loop carries ONE [N, K] slot buffer (sample start times); dt per
    # sample is a pure function of t (dt = clamp(t*dt_gamma, ...)) and the
    # reference's depth step rs_i = end_i - end_{i-1} telescopes from the
    # stored ts, so both are recomputed after the loop — this cuts the
    # per-iteration HBM slot-buffer rewrite traffic 4x vs carrying
    # (ts, dts, rs, last_t)
    def cond(carry):
        t, count, ts, it = carry
        active = (t < fars) & (count < K)
        return jnp.any(active) & (it < max_steps)

    def body(carry):
        t, count, ts, it = carry
        pos = jnp.clip(rays_o + t[:, None] * rays_d, -bound, bound)  # [N,3]
        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)                  # [N]
        level = jnp.maximum(_mip_from_pos(pos, cascade),
                            _mip_from_dt(dt, H, cascade))            # [N]
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
        mip_rbound = 1.0 / mip_bound

        nxyz = jnp.clip(0.5 * (pos * mip_rbound[:, None] + 1.0) * H,
                        0.0, H - 1).astype(jnp.int32)                # [N,3]
        index = level * (H ** 3) + morton3d(nxyz)                    # [N]
        if skip_grid is not None:
            # chebyshev skip-distance grid: 0 = occupied, d > 0 allows a
            # safe jump of (d-1) cell widths (ops/ray_ops.py
            # occupancy_to_skip_grid)
            skip = jnp.take(skip_grid.reshape(-1), index, axis=0)
            occ = skip == 0
        else:
            byte = jnp.take(bitfield, index >> 3, axis=0)
            occ = ((byte >> (index & 7).astype(jnp.uint8)) & 1) > 0  # [N]

        active = (t < fars) & (count < K)
        emit = occ & active
        new_t = t + dt

        if samples_per_hit == 2:
            # paired emission: cells span ~2 dt steps, so emit the next dt
            # sample in the same iteration — halves the gather-bound
            # iteration count through occupied regions (the second sample
            # skips the occupancy re-check; a miss only wastes a slot since
            # the network, not the grid, defines the field). Both slots are
            # written in ONE [N, K] pass: slot count gets t, slot count+1
            # gets new_t.
            dt2 = jnp.clip(new_t * dt_gamma, dt_min, dt_max)
            emit2 = emit & (new_t < fars) & (count + 1 < K)
            new_t2 = new_t + dt2
            off = slot_iota[None, :] - count[:, None]                # [N, K]
            write = emit[:, None] & ((off == 0) | (emit2[:, None] & (off == 1)))
            val = jnp.where(off == 0, t[:, None], new_t[:, None])
            ts = jnp.where(write, val, ts)
            count = count + emit.astype(jnp.int32) + emit2.astype(jnp.int32)
            new_t = jnp.where(emit2, new_t2, new_t)
        else:
            onehot = (slot_iota[None, :] == count[:, None]) & emit[:, None]
            ts = jnp.where(onehot, t[:, None], ts)
            count = count + emit.astype(jnp.int32)

        # empty cell: jump to the next voxel boundary (raymarching.cu:392-403)
        cell = (nxyz.astype(jnp.float32) + 0.5
                + 0.5 * jnp.sign(rays_d)) * (2.0 / H) - 1.0
        t_exit = (cell * mip_bound[:, None] - pos) / rays_d          # [N,3]
        tt = t + jnp.maximum(0.0, jnp.min(t_exit, axis=-1))
        if skip_grid is not None:
            # long-range jump: (skip-1) cell widths are guaranteed free
            cell_size = 2.0 * mip_bound / H
            tt = jnp.maximum(
                tt, t + (skip.astype(jnp.float32) - 1.0) * cell_size)
        # at least one dt step, then ceil to reach tt like the do-while
        skip_t = jnp.maximum(new_t, tt)
        t = jnp.where(active, jnp.where(emit, new_t, skip_t), t)
        return (t, count, ts, it + 1)

    if resume_carry is not None:
        t_in, count_in, ts_in = resume_carry
        init = (t_in, count_in, ts_in, jnp.asarray(0, dtype=jnp.int32))
    else:
        init = (t0,
                jnp.zeros((N,), dtype=jnp.int32),
                jnp.zeros((N, K)),
                jnp.asarray(0, dtype=jnp.int32))
    if fixed_iters is not None:
        def scan_body(carry, _):
            return body(carry), None
        (t, count, ts, _), _ = jax.lax.scan(scan_body, init, None,
                                            length=fixed_iters)
    else:
        t, count, ts, _ = jax.lax.while_loop(cond, body, init)

    mask = slot_iota[None, :] < count[:, None]
    dts = jnp.clip(ts * dt_gamma, dt_min, dt_max) * mask
    ends = ts + dts
    # rs telescopes from the PER-RAY march start; under resume the original
    # t0 is nears (phase carries never change a ray's start)
    rs = (ends - jnp.concatenate([t0[:, None], ends[:, :-1]], axis=1)) * mask
    xyzs = jnp.clip(rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                    -bound, bound)
    out = {"xyzs": xyzs, "deltas": dts, "rs": rs, "ts": ts, "mask": mask,
           "count": count}
    if return_carry:
        return out, (t, count, ts)
    return out


def compact_samples(mask, budget: int):
    """Static-shape sample compaction: map the True entries of mask [N, K]
    to slots of a fixed [budget] buffer (drop overflow), replacing the
    reference's atomicAdd compaction (raymarching.cu:409-420) with a
    deterministic prefix-sum layout.

    Returns (flat_idx [N, K] int32 destination slot per sample — `budget`
    for dropped/masked entries, kept [N, K] bool, n_valid []).
    """
    flat = mask.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1          # inclusive -> 0-based
    dest = jnp.where(flat & (pos < budget), pos, budget)
    kept = (dest < budget).reshape(mask.shape)
    return dest.reshape(mask.shape), kept, jnp.sum(flat.astype(jnp.int32))


def gather_compacted(values, dest, budget: int, fill=0.0):
    """Scatter per-sample values [N, K, ...] into the compact [budget, ...]
    buffer (one extra trash row absorbs dropped samples)."""
    v = values.reshape((-1,) + values.shape[2:])
    out = jnp.full((budget + 1,) + v.shape[1:], fill, dtype=values.dtype)
    out = out.at[dest.reshape(-1)].set(v)
    return out[:budget]


def scatter_back(compact, dest, shape):
    """Inverse of gather_compacted: read each sample's compact slot back to
    [N, K, ...] (dropped samples read the zero trash row)."""
    padded = jnp.concatenate(
        [compact, jnp.zeros((1,) + compact.shape[1:], compact.dtype)], axis=0)
    flat = jnp.take(padded, dest.reshape(-1), axis=0)
    return flat.reshape(shape + compact.shape[1:])


def composite_marched(sigmas, rgbs, deltas, rs, ts, mask, nears, fars,
                      density_scale: float = 1.0):
    """Composite marched samples (masked slots contribute nothing), matching
    kernel_composite_rays_train_forward (raymarching.cu:505-593): weights from
    dt-deltas, depth from cumulative rs, T early-exit handled by the
    transmittance product itself.
    """
    sigmas = jnp.where(mask, sigmas, 0.0)
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1)
    trans = jnp.cumprod(shifted, axis=-1)[..., :-1]
    weights = alphas * trans                                    # [N, K]
    weights_sum = jnp.sum(weights, axis=-1)
    depth_t = jnp.cumsum(rs, axis=-1)                           # cum depth
    depth = jnp.sum(weights * depth_t, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    aggregated_density = jnp.sum(weights * sigmas, axis=-1)
    # normalized depth like run_cuda (renderer.py:323): (depth-near)/(far-near)
    depth = jnp.clip(depth - 0.0, 0.0, None)
    # ABSOLUTE expected surface t (sum w * t_sample). The reference's own
    # depth is near-relative at the composite then near-subtracted AGAIN
    # downstream (raymarching.cu:429/465 + renderer.py:313 — a quirk kept
    # verbatim in `depth`); depth_abs is the extra output the depth-guided
    # render path needs, free to be correct.
    depth_abs = jnp.sum(weights * ts * mask, axis=-1)
    return {"weights": weights, "weights_sum": weights_sum, "depth": depth,
            "image": image, "aggregated_density": aggregated_density,
            "depth_abs": depth_abs}
