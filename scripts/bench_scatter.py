"""Scatter-wall micro-benchmark (training-backward shapes).

The mip-fold training backward is scatter-shaped: the fold-row take's
cotangent is 49k wide rows scattered into the [F^3, 8*Cd] fold layout
(then transposed to the dense volume).  scripts/bench_gather.py measured
the GATHER floor at ~15-25 ns/row; this script measures the SCATTER side
and the sorted/unique-hint variants that could beat the naive
`.at[rows].add` (measured ~0.9 us/row, 2026-08-19 — ~40x the gather
floor).  Plays the profiling role of the reference's per-kernel nvprof
sweeps (no file counterpart; the reference's backward is an fp16 atomic
scatter, gridencoder.cu:227-314).

Run on the tunneled TPU:  python scripts/bench_scatter.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

F, Cd, N = 128, 16, 49152
W = 8 * Cd


def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def t(name, fn, *a, iters=10):
    out = fn(*a)
    fetch(out)
    # batched timing: k back-to-back dispatches per completion fetch
    # amortizes the tunnel round trip (bench.py's pipelined discipline)
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(iters)]
    for o in outs:
        fetch(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"name": name, "ms": round(ms, 2)}), flush=True)
    return ms


def main():
    import os
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    row = jax.random.randint(k1, (N,), 0, F ** 3)
    grow = jax.random.normal(k2, (N, W))
    g = jax.random.normal(k2, (N, Cd))
    w8 = jax.random.uniform(k4, (N, 8))
    ci = jnp.stack([row // (F * F), (row // F) % F, row % F],
                   -1).astype(jnp.int32)
    V = jax.random.normal(k3, ((F + 1) ** 3, Cd), dtype=jnp.bfloat16)

    # A. naive wide-row scatter into the fold layout (XLA bwd shape)
    t("A_wide_naive",
      jax.jit(lambda r, gr: jnp.zeros((F ** 3, W), jnp.float32)
              .at[r].add(gr)), row, grow)

    # B. pre-sorted rows + indices_are_sorted hint (dupes remain)
    def sorted_scatter(r, gr):
        order = jnp.argsort(r)
        rs = r[order]
        gs = gr[order]
        return jnp.zeros((F ** 3, W), jnp.float32).at[rs].add(
            gs, indices_are_sorted=True)
    t("B_sorted_hint", jax.jit(sorted_scatter), row, grow)

    # C. sort + segment_sum (sorted + dense-output reduction)
    def segsum(r, gr):
        order = jnp.argsort(r)
        return jax.ops.segment_sum(gr[order], r[order], num_segments=F ** 3,
                                   indices_are_sorted=True)
    t("C_sort_segsum", jax.jit(segsum), row, grow)

    # C2. segment_sum without the sort (scatter with unsorted ids)
    t("C2_segsum_unsorted",
      jax.jit(lambda r, gr: jax.ops.segment_sum(gr, r, num_segments=F ** 3)),
      row, grow)

    # D. cube-slice scatter into the dense volume: 1 (2,2,2,Cd) slice/sample
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2))

    def cube_scatter(c, w, gg):
        upd = (w.reshape(N, 2, 2, 2)[..., None].astype(jnp.float32)
               * gg[:, None, None, None, :])              # [N,2,2,2,Cd]
        z = jnp.zeros((F + 1, F + 1, F + 1, Cd), jnp.float32)
        return lax.scatter_add(
            z, c, upd, dnums,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # w8 is x-fastest (_corner_bits) = index bits (x,y,z) minor-to-major;
    # reshape(2,2,2) is z-minor — permutation does not matter for timing
    t("D_cube_slice", jax.jit(cube_scatter), ci, w8, g)

    # E. per-corner narrow scatter into V via segment_sum (8N keys, sorted)
    bits = jnp.asarray(np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                            indexing="ij"),
                                -1).reshape(8, 3), jnp.int32)

    def corner_segsum(c, w, gg):
        corner = c[:, None, :] + bits[None]               # [N,8,3]
        keys = ((corner[..., 0] * (F + 1) + corner[..., 1]) * (F + 1)
                + corner[..., 2]).reshape(-1)             # [8N]
        upd = (w[..., None].astype(jnp.float32)
               * gg[:, None, :]).reshape(-1, Cd)          # [8N,Cd]
        order = jnp.argsort(keys)
        return jax.ops.segment_sum(upd[order], keys[order],
                                   num_segments=(F + 1) ** 3,
                                   indices_are_sorted=True)
    t("E_corner_segsum", jax.jit(corner_segsum), ci, w8, g)

    # F. the sort alone (is argsort the cost?)
    t("F_sort_only", jax.jit(lambda r, gr: (jnp.sort(r),
                                            gr[jnp.argsort(r)])), row, grow)

    # G. fwd fold build: strided-slice stack (current) vs conv patches
    def fold_slices(v):
        v4 = v.reshape(F + 1, F + 1, F + 1, Cd)
        corners = [v4[bx:bx + F, by:by + F, bz:bz + F]
                   for bx, by, bz in np.ndindex(2, 2, 2)]
        return jnp.stack(corners, axis=3).reshape(F ** 3, W)
    t("G_fold_slices_bf16", jax.jit(fold_slices), V)
    t("G_fold_slices_f32", jax.jit(fold_slices), V.astype(jnp.float32))

    def fold_patches(v):
        v4 = v.reshape(F + 1, F + 1, F + 1, Cd)
        p = lax.conv_general_dilated_patches(
            v4.transpose(3, 0, 1, 2)[None],               # [1,Cd,D,H,W]
            filter_shape=(2, 2, 2), window_strides=(1, 1, 1),
            padding="VALID")                              # [1,Cd*8,F,F,F]
        return p[0].transpose(1, 2, 3, 0).reshape(F ** 3, W)
    t("G2_fold_patches_bf16", jax.jit(fold_patches), V)

    # H. fwd+bwd of the CURRENT XLA path at the real dtypes (reference line)
    def foldtake_loss(v, r):
        return jnp.sum(fold_slices(v)[r] ** 2)
    t("H_xla_foldtake_bwd", jax.jit(jax.grad(foldtake_loss)),
      V.astype(jnp.float32), row)

    # I. fwd+bwd of the cube-gather alternative (no fold at all)
    gd = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))

    def cube_loss(v, c, w):
        v4 = v.reshape(F + 1, F + 1, F + 1, Cd)
        feats = lax.gather(v4, c, gd, (2, 2, 2, Cd),
                           mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        out = jnp.sum(w.reshape(N, 2, 2, 2)[..., None] * feats,
                      axis=(1, 2, 3))
        return jnp.sum(out ** 2)
    t("I_cube_gather_fwd_bwd", jax.jit(jax.grad(cube_loss)),
      V.astype(jnp.float32), ci, w8)


if __name__ == "__main__":
    main()
