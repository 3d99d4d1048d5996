"""Microbenchmark: the HBM random-row gather wall.

BENCH_NOTES round 2 measured XLA `jnp.take` at ~25 ns/row (~40 M rows/s),
independent of row width (64..256 B) and table size (2^19..2^21 rows), and
identified it as the render-path ceiling (rows-per-sample math). This script
answers the round-3 question: is that a hardware bound or an XLA-gather
artifact?  It measures, on the real chip:

  A. `jnp.take` issue rate vs row WIDTH from 1 B to 4 KB — if the per-row
     cost is a fixed issue cost, fat rows amortize it and the design answer
     is brick-granularity tables (gather 2 KB bricks, not 128 B cells).
  B. `jnp.take` vs index PATTERN (random / sorted / run-length-2/4 /
     all-same) — does the gather engine exploit locality or repeats?
  C. `jnp.take` vs table SIZE down to VMEM-sized tables.
  D. scatter (`.at[idx].set`) rates — the cost of compaction designs.
  E. a Pallas kernel gathering from a VMEM-RESIDENT table with an
     in-kernel row loop.
  F. a Pallas kernel issuing per-row HBM->VMEM DMAs with NSLOT outstanding
     copies — the "can DMA pipelining beat the wall" test.
  G. sequential-row take (iota indices) — the bandwidth sanity bound.

Prints one JSON line per measurement; summary table at the end.
Run: python scripts/bench_gather.py [--quick]

Timing: on the tunneled TPU platform block_until_ready() does not
synchronize; every measurement device-slices one element and fetches it
(BENCH_NOTES.md timing note).
"""

import argparse
import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch1(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch1(out)
    return (time.perf_counter() - t0) / iters


def make_idx(key, pattern, M, R):
    if pattern == "random":
        return jax.random.randint(key, (M,), 0, R, dtype=jnp.int32)
    if pattern == "sorted":
        i = jax.random.randint(key, (M,), 0, R, dtype=jnp.int32)
        return jnp.sort(i)
    if pattern.startswith("runs"):
        k = int(pattern[4:])
        base = jax.random.randint(key, (M // k,), 0, R, dtype=jnp.int32)
        return jnp.repeat(base, k)
    if pattern == "same":
        return jnp.zeros((M,), dtype=jnp.int32)
    if pattern == "iota":
        return (jnp.arange(M, dtype=jnp.int32) % R)
    raise ValueError(pattern)


RESULTS = []


def record(name, rows, dt, bytes_per_row, note=""):
    rate = rows / dt
    rec = {
        "name": name, "rows_per_s": round(rate), "ns_per_row": round(1e9 * dt / rows, 2),
        "GB_per_s": round(rate * bytes_per_row / 1e9, 2), "row_bytes": bytes_per_row,
        "note": note,
    }
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


# --------------------------------------------------------------------------
# A/B/C/G: XLA take
# --------------------------------------------------------------------------

def bench_take(key, R, width_bytes, pattern, M, dtype=jnp.float32,
               sorted_flag=False, label=None):
    if dtype == jnp.uint8:
        C = width_bytes
        table = jax.random.randint(key, (R, C), 0, 255, dtype=jnp.int32
                                   ).astype(jnp.uint8)
        if C == 1:
            table = table.reshape(R)
    else:
        esz = jnp.dtype(dtype).itemsize
        C = max(1, width_bytes // esz)
        table = jax.random.normal(key, (R, C), dtype=jnp.float32).astype(dtype)
    idx = make_idx(jax.random.fold_in(key, 7), pattern, M, R)

    @jax.jit
    def f(t, i):
        g = jnp.take(t, i, axis=0, indices_are_sorted=sorted_flag,
                     unique_indices=False)
        # reduce so the fetch is tiny
        return jnp.sum(g.astype(jnp.float32) if g.dtype == jnp.uint8 else g)

    dt = timeit(f, table, idx)
    record(label or f"take R=2^{int(np.log2(R))} w={width_bytes}B {pattern}"
           + (" sortedflag" if sorted_flag else ""),
           M, dt, width_bytes)


# --------------------------------------------------------------------------
# D: scatter
# --------------------------------------------------------------------------

def bench_scatter(key, B, width_bytes, M, mode="set"):
    esz = 4
    C = max(1, width_bytes // esz)
    vals = jax.random.normal(key, (M, C), dtype=jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 3), (M,), 0, B,
                             dtype=jnp.int32)

    @jax.jit
    def f(v, i):
        out = jnp.zeros((B, C), dtype=jnp.float32)
        if mode == "set":
            out = out.at[i].set(v, mode="drop")
        else:
            out = out.at[i].add(v, mode="drop")
        return jnp.sum(out)

    dt = timeit(f, vals, idx)
    record(f"scatter-{mode} B=2^{int(np.log2(B))} w={width_bytes}B", M, dt,
           width_bytes)


# --------------------------------------------------------------------------
# E: Pallas VMEM-table gather
# --------------------------------------------------------------------------

def pallas_vmem_gather(table, idx, tile_m=2048):
    """table [R, C] (small enough for VMEM), idx [M]. Gathers row-by-row
    from the VMEM-resident table inside the kernel."""
    M = idx.shape[0]
    R, C = table.shape
    grid = (M // tile_m,)

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, tile_m, body, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
    )(idx, table)


def bench_pallas_vmem(key, R, C, M):
    table = jax.random.normal(key, (R, C), dtype=jnp.float32)
    idx = make_idx(jax.random.fold_in(key, 7), "random", M, R)
    f = jax.jit(lambda t, i: jnp.sum(pallas_vmem_gather(t, i)))
    dt = timeit(f, table, idx)
    record(f"pallas-vmem-gather R=2^{int(np.log2(R))} w={C * 4}B", M, dt, C * 4)


# --------------------------------------------------------------------------
# F: Pallas HBM per-row DMA gather with NSLOT outstanding
# --------------------------------------------------------------------------

def pallas_dma_gather(table, idx, tile_m=2048, nslot=16):
    """table [R, C] stays in HBM; each output row is its own async DMA,
    nslot copies in flight."""
    M = idx.shape[0]
    R, C = table.shape
    grid = (M // tile_m,)

    def kernel(idx_ref, table_ref, out_ref, sem):
        def dma(j):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sem.at[j % nslot])

        def warm(j, _):
            dma(j).start()
            return 0
        jax.lax.fori_loop(0, min(nslot, tile_m), warm, 0)

        def body(j, _):
            dma(j).wait()

            @pl.when(j + nslot < tile_m)
            def _():
                dma(j + nslot).start()
            return 0
        jax.lax.fori_loop(0, tile_m, body, 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nslot,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def bench_pallas_dma(key, R, C, M, nslot):
    table = jax.random.normal(key, (R, C), dtype=jnp.float32)
    idx = make_idx(jax.random.fold_in(key, 7), "random", M, R)
    f = jax.jit(lambda t, i: jnp.sum(pallas_dma_gather(t, i, nslot=nslot)))
    dt = timeit(f, table, idx)
    record(f"pallas-dma-gather R=2^{int(np.log2(R))} w={C * 4}B nslot={nslot}",
           M, dt, C * 4)


# --------------------------------------------------------------------------
# H: trilinear corner-fetch strategies (the mip-fold TRAIN path question)
# --------------------------------------------------------------------------
# The training dense encode fetches the 8 trilinear corners of each sample
# from a [(F+1)^3, C] grid-point table (ops/mip_encoding.py corner path).
# z-adjacent corners are CONTIGUOUS rows, so lax.gather with multi-element
# slice_sizes can fetch 2 (pair), 4 (quad) or 8 (cube) corners per issued
# gather row. This section measures fwd and VJP(scatter-add) cost per
# SAMPLE (= 8 corners) for each strategy, vs the 8x-take baseline and the
# 1-wide-row differentiable fold table.

def _corner_strategies(F, C, M, key):
    from jax import lax
    kt, ki = jax.random.split(key)
    table = jax.random.normal(kt, ((F + 1) ** 3, C), dtype=jnp.float32)
    ci = jax.random.randint(ki, (M, 3), 0, F, dtype=jnp.int32)

    def take8(t, ci):
        bits = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing="ij"), -1).reshape(8, 3)
        corner = ci[:, None, :] + jnp.asarray(bits, jnp.int32)[None]
        rows = (corner[..., 0] * (F + 1) + corner[..., 1]) * (F + 1) \
            + corner[..., 2]
        return jnp.take(t, rows.reshape(-1), axis=0).reshape(M, 8, C)

    def slice_gather(slice_shape):
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        sizes = tuple(slice_shape) + (C,)

        def f(t, starts):
            t4 = t.reshape(F + 1, F + 1, F + 1, C)
            return lax.gather(t4, starts, dnums, sizes,
                              mode=lax.GatherScatterMode.CLIP)
        return f

    bits2 = np.stack(np.meshgrid([0, 1], [0, 1], indexing="ij"),
                     -1).reshape(4, 2)

    def pairs(t, ci):      # 4 gathers of (1,1,2,C): the xy corners
        starts = (ci[:, None, :] + jnp.pad(jnp.asarray(bits2, jnp.int32),
                                           ((0, 0), (0, 1)))[None]
                  ).reshape(M * 4, 3)
        g = slice_gather((1, 1, 2))(t, starts)
        return g.reshape(M, 8, C)

    def quads(t, ci):      # 2 gathers of (1,2,2,C): the x corners
        off = jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32)
        starts = (ci[:, None, :] + off[None]).reshape(M * 2, 3)
        g = slice_gather((1, 2, 2))(t, starts)
        return g.reshape(M, 8, C)

    def cube(t, ci):       # 1 gather of (2,2,2,C)
        g = slice_gather((2, 2, 2))(t, ci)
        return g.reshape(M, 8, C)

    return table, ci, {"take8": take8, "pairs": pairs, "quads": quads,
                       "cube": cube}


def bench_corner_strategies(key, F, C, M):
    table, ci, strats = _corner_strategies(F, C, M, key)
    # fold baseline: one [F^3, 8C] row per sample (render-path layout)
    kf = jax.random.fold_in(key, 5)
    fold = jax.random.normal(kf, (F ** 3, 8 * C), dtype=jnp.float32)
    cif = jax.random.randint(kf, (M,), 0, F ** 3, dtype=jnp.int32)

    def fold_fetch(t, i):
        return jnp.take(t, i, axis=0).reshape(M, 8, C)

    w = jax.random.normal(jax.random.fold_in(key, 9), (M, 8, C))

    for name, fn in list(strats.items()) + [("fold-row", None)]:
        if name == "fold-row":
            t_in, i_in, fn = fold, cif, fold_fetch
        else:
            t_in, i_in = table, ci
        fwd = jax.jit(lambda t, i, fn=fn: jnp.sum(fn(t, i) * w))
        vjp = jax.jit(jax.grad(lambda t, i, fn=fn: jnp.sum(fn(t, i) * w)))
        try:
            dt_f = timeit(fwd, t_in, i_in)
            record(f"corners8-{name} F={F} C={C} fwd", M, dt_f, 8 * C * 4,
                   note="per 8-corner sample")
            dt_b = timeit(vjp, t_in, i_in)
            record(f"corners8-{name} F={F} C={C} fwd+vjp", M, dt_b, 8 * C * 4,
                   note="includes the scatter-add bwd")
        except Exception as e:                              # noqa: BLE001
            print(json.dumps({"name": f"corners8-{name}",
                              "error": str(e)[:200]}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list of sections to run, e.g. H")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None

    key = jax.random.PRNGKey(0)
    M = 2 ** 20 if args.quick else 2 ** 21

    def want(sec):
        return only is None or sec in only

    if want("H"):
        print("# H. trilinear corner-fetch strategies (train path)",
              flush=True)
        bench_corner_strategies(key, 128, 16, 2 ** 16)
        if not args.quick:
            bench_corner_strategies(key, 128, 16, 2 ** 18)
    if only is not None and set(only) == {"H"}:
        print("\n# ---- summary (rows/s) ----")
        for r in RESULTS:
            print(f"{r['name']:55s} {r['rows_per_s'] / 1e6:9.1f} M rows/s  "
                  f"{r['ns_per_row']:8.1f} ns/row  {r['GB_per_s']:8.2f} GB/s")
        return

    print("# G. bandwidth sanity: sequential rows (iota idx)", flush=True)
    bench_take(key, 2 ** 19, 256, "iota", M)
    bench_take(key, 2 ** 19, 1024, "iota", M // 4)

    print("# A. width sweep (random idx, R=2^19)", flush=True)
    for w, m_scale in [(1, 1), (4, 1), (32, 1), (128, 1), (256, 1),
                       (512, 2), (1024, 4), (2048, 8), (4096, 16)]:
        dtype = jnp.uint8 if w == 1 else jnp.float32
        R = 2 ** 19 if w <= 512 else 2 ** 17   # cap table at ~512 MB
        bench_take(key, R, w, "random", M // m_scale, dtype=dtype)

    print("# B. pattern sweep (w=256B, R=2^19)", flush=True)
    for pat in ["random", "sorted", "runs2", "runs4", "same"]:
        bench_take(key, 2 ** 19, 256, pat, M)
    bench_take(key, 2 ** 19, 256, "sorted", M, sorted_flag=True)

    print("# C. table-size sweep (w=256B, random)", flush=True)
    for lr in [13, 15, 17, 21]:
        bench_take(key, 2 ** lr, 256, "random", M)

    print("# D. scatter", flush=True)
    for w in [4, 64, 256]:
        bench_scatter(key, 2 ** 19, w, M)
    bench_scatter(key, 2 ** 19, 256, M, mode="add")

    print("# E. pallas VMEM-table gather", flush=True)
    for R, C in [(2 ** 13, 64), (2 ** 14, 64), (2 ** 13, 32)]:
        try:
            bench_pallas_vmem(key, R, C, 2 ** 19)
        except Exception as e:
            print(json.dumps({"name": f"pallas-vmem R=2^{int(np.log2(R))} "
                              f"C={C}", "error": str(e)[:200]}), flush=True)

    print("# F. pallas HBM-DMA gather", flush=True)
    for nslot in [4, 16, 32]:
        try:
            bench_pallas_dma(key, 2 ** 19, 64, 2 ** 18, nslot)
        except Exception as e:
            print(json.dumps({"name": f"pallas-dma nslot={nslot}",
                              "error": str(e)[:200]}), flush=True)
    # fat-row DMA variant: brick-sized transfers
    for C in [256, 512]:
        try:
            bench_pallas_dma(key, 2 ** 15, C, 2 ** 17, 16)
        except Exception as e:
            print(json.dumps({"name": f"pallas-dma w={C*4}B",
                              "error": str(e)[:200]}), flush=True)

    print("\n# ---- summary (rows/s) ----")
    for r in RESULTS:
        print(f"{r['name']:55s} {r['rows_per_s'] / 1e6:9.1f} M rows/s  "
              f"{r['ns_per_row']:8.1f} ns/row  {r['GB_per_s']:8.2f} GB/s")


if __name__ == "__main__":
    main()
