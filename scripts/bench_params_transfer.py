"""A/B: trained-student frame render with HOST-NUMPY params vs
DEVICE-RESIDENT params (round 5).

The bench student pkls store `jax.device_get` numpy pytrees; passing a
numpy pytree to a jitted render re-uploads every leaf through the tunnel
on EVERY dispatch. scripts/bench_mxu.py's chain rows first exposed the
cost (trained 192x6 standalone apply 46 ms vs untrained-on-device 160x6
at 7 ms — FLOP-poorer yet 6x slower). This script pins the per-frame
cost on the exact headline path: render_frame_guided, trained h192
student, 800^2, pipelined batched timing.

Usage: python scripts/bench_params_transfer.py [--variant 192x6]
"""

import argparse
import json
import os
import pickle
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
    ap.add_argument("--variant", default="192x6")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as B
    from nerfsafetyvalidation_tpu.models import make_network, renderer as R
    from nerfsafetyvalidation_tpu.models.bake import student_config
    from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)

    hd, nl = (int(v) for v in args.variant.split("x"))
    net, params, state = B._train_flagship()
    scfg = student_config(net.cfg, multires=12, hidden_dim=hd,
                          num_layers=nl)
    student = make_network(scfg)
    tag = "" if (hd, nl) == (256, 6) else f"_h{hd}x{nl}"
    with open(os.path.join(B._CACHE, f"bench_student{tag}.pkl"), "rb") as f:
        blob = pickle.load(f)
    host_params = blob["params"] if isinstance(blob, dict) \
        and "params" in blob else blob
    host_params = jax.device_get(host_params)          # ensure numpy
    dev_params = jax.device_put(host_params)
    n_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(host_params))

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    pose = orbit_pose(*B.HOLDOUT[0], 2.4)
    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), (fx, fx, W / 2, H / 2),
                    H, W)
    ro = rays["rays_o"].reshape(-1, 3)
    rd = rays["rays_d"].reshape(-1, 3)

    def frame(sp):
        return R.render_frame_guided(
            student, sp, state, ro, rd, H, W, prepass_factor=8,
            max_samples=B.MAX_SAMPLES, tile=16384, max_steps=512,
            dt_gamma=1.0 / 64, prepass_mode="scout", scout_samples=64,
            natural_tile_cap=16384)["image"]

    for name, sp in [("host_numpy", host_params), ("device", dev_params)]:
        dt = timeit(lambda: frame(sp), args.iters)
        print(json.dumps({"params": name, "variant": args.variant,
                          "param_bytes": int(n_bytes),
                          "ms_frame": round(dt * 1e3, 1),
                          "rays_per_s": round(H * W / dt)}), flush=True)


if __name__ == "__main__":
    main()
