"""Measure the copy-shaped Pallas fold-build kernel vs XLA's slice-stack
(VERDICT r4 item 4a — the named-but-unmeasured training route).

Rows (F=128, Cd=16, bf16 — the training shapes; see BENCH_NOTES
"Round-4 step attribution"):
  fwd        fold build alone: XLA slice-stack vs conv-patches vs Pallas,
             against the ~1.5 ms HBM streaming bound (0.6 GB write +
             0.55 GB read at ~0.8 TB/s)
  fwd+bwd    autodiff through (fold -> take 49,152 rows -> weighted sum):
             XLA's fused backward vs the Pallas custom VJP (the backward
             also pays the unavoidable 49k wide-row scatter into the
             fold-layout cotangent — the measured scatter wall)
Then run scripts/bench_train.py --gather-modes foldrow,foldrow_pallas
for the full-train-step A/B.

Usage: python scripts/bench_fold_pallas.py [--iters 5] [--n-rows 49152]
Prints one JSON line per row.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fetch1(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def timeit(fn, iters=5, batch=4):
    fetch1(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(batch):
            out = fn()
        fetch1(out)
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n-rows", type=int, default=49152)
    ap.add_argument("--F", type=int, default=128)
    ap.add_argument("--Cd", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nerfsafetyvalidation_tpu.ops.pallas.fold_build import (
        fold_build_pallas)

    F, Cd = args.F, args.Cd
    key = jax.random.PRNGKey(0)
    V = jax.random.normal(key, ((F + 1) ** 3, Cd), jnp.bfloat16)
    bits = [(k & 1, (k >> 1) & 1, (k >> 2) & 1) for k in range(8)]

    gb_write = F ** 3 * 8 * Cd * 2 / 1e9
    gb_read = (F + 1) ** 3 * Cd * 2 * 8 / 1e9   # 8 shifted views
    print(json.dumps({"row": "bound", "gb_write": round(gb_write, 2),
                      "gb_read": round(gb_read, 2),
                      "ms_at_0.8TBps": round(
                          (gb_write + gb_read) / 0.8, 2)}), flush=True)

    def xla_fold(v):
        V4 = v.reshape(F + 1, F + 1, F + 1, Cd)
        corners = [V4[bx:bx + F, by:by + F, bz:bz + F]
                   for bx, by, bz in bits]
        return jnp.stack(corners, axis=3).reshape(F ** 3, 8 * Cd)

    def conv_fold(v):
        from jax import lax
        V4 = v.reshape(1, F + 1, F + 1, F + 1, Cd)
        p = lax.conv_general_dilated_patches(
            V4.transpose(0, 4, 1, 2, 3), (2, 2, 2), (1, 1, 1), "VALID")
        # [1, Cd*8, F, F, F] with patch dim (c, dz, dy, dx)? — layout
        # differs; this row is a THROUGHPUT comparator only (bench_scatter
        # measured it at 43.3 ms), not a semantics-parity path
        return p.reshape(-1)[: F ** 3 * 8 * Cd]

    fwd_rows = [("xla_slice_stack", jax.jit(xla_fold)),
                ("xla_conv_patches", jax.jit(conv_fold)),
                ("pallas", jax.jit(lambda v: fold_build_pallas(v, F, Cd)))]
    for name, f in fwd_rows:
        try:
            dt = timeit(lambda: f(V), args.iters)
            print(json.dumps({"row": "fwd", "impl": name,
                              "ms": round(dt * 1e3, 2),
                              "gbps": round((gb_write + gb_read) / dt, 0)}),
                  flush=True)
        except Exception as e:                              # noqa: BLE001
            print(json.dumps({"row": "fwd", "impl": name,
                              "error": str(e)[:200]}), flush=True)

    # ---- fwd+bwd through the trainer-shaped consumer
    N = args.n_rows
    rows = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, F ** 3)
    w = jax.random.normal(jax.random.PRNGKey(2), (N, 8 * Cd), jnp.bfloat16)
    Vf = V.astype(jnp.float32)   # params are f32; fold casts to bf16

    def loss_of(fold_fn):
        def loss(v):
            t = fold_fn(v.astype(jnp.bfloat16))
            return jnp.sum((jnp.take(t, rows, axis=0) * w)
                           .astype(jnp.float32))
        return jax.jit(jax.grad(loss))

    for name, fold_fn in [("xla_slice_stack", xla_fold),
                          ("pallas",
                           lambda v: fold_build_pallas(v, F, Cd))]:
        try:
            g = loss_of(fold_fn)
            dt = timeit(lambda: g(Vf), args.iters)
            print(json.dumps({"row": "fwd+bwd", "impl": name,
                              "n_rows": N,
                              "ms": round(dt * 1e3, 2)}), flush=True)
        except Exception as e:                              # noqa: BLE001
            print(json.dumps({"row": "fwd+bwd", "impl": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
