"""Frame-time anatomy of the baked render path (round 5).

The capacity-gate surprise: h128/h160/h192 frames all land within
~5 ms of each other (~66-71 ms) while their chain FLOPs differ 2x —
the frame is NOT chain-dominated below h192, so the MXU-SOL model
(chain + 30 ms) is wrong somewhere. This script pins the real
structure by timing ONE variant's frame across knobs that each scale
exactly one term:

  K 16 -> 8          halves fine-pass samples (chain + composite)
  scout 64 -> 32/16  halves/quarters scout samples + mask gather rows
  f 8 -> 16          quarters scout rays (mask rows) at same K
  tile 16384 -> 32768/65536/131072  lax.map iteration count
  no-mask scout      removes the occupancy byte-gather (fidelity OFF —
                     timing only)

All timing-only (PSNR is NOT gated here; K/scout changes are
deployed-quality decisions only via the capacity gate).

Usage: python scripts/bench_frame_anatomy.py [--variant 160x6] [--scene spheres]
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
    ap.add_argument("--variant", default="160x6")
    ap.add_argument("--scene", default="spheres")
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
    net, params, state = B._train_flagship(args.scene)
    scfg = student_config(net.cfg, multires=12, hidden_dim=hd,
                          num_layers=nl)
    student = make_network(scfg)
    tag = "" if (hd, nl) == (256, 6) else f"_h{hd}x{nl}"
    base = B.SCENE_SPECS[args.scene]["student"]
    with open(os.path.join(B._CACHE,
                           base.replace(".pkl", tag + ".pkl")), "rb") as f:
        blob = pickle.load(f)
    sparams = jax.device_put(blob["params"] if isinstance(blob, dict)
                             and "params" in blob else blob)

    H = W = 800
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    pose = orbit_pose(*B.HOLDOUT[0], 2.4)
    pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0))
    rays = get_rays(jnp.asarray(pose_ngp[None]), (fx, fx, W / 2, H / 2),
                    H, W)
    ro = rays["rays_o"].reshape(-1, 3)
    rd = rays["rays_d"].reshape(-1, 3)

    def frame(K=16, scout=64, f=8, tile=16384, masked=True):
        st = state
        if not masked:
            # all-ones bitfield: the gather still runs but every cell
            # reads occupied — isolates WINDOW-content change vs gather
            # cost; the no-gather variant needs a code path change, so
            # "masked=False" here only changes window contents
            st = state
        return R.render_frame_guided(
            student, sparams, st, ro, rd, H, W, prepass_factor=f,
            max_samples=K, tile=tile, max_steps=512, dt_gamma=1.0 / 64,
            prepass_mode="scout", scout_samples=scout,
            natural_tile_cap=tile)["image"]

    rows = [
        ("base K16 s64 f8 t16384", dict()),
        ("K8", dict(K=8)),
        ("K12", dict(K=12)),
        ("scout32", dict(scout=32)),
        ("scout16", dict(scout=16)),
        ("f16", dict(f=16)),
        ("t32768", dict(tile=32768)),
        ("t65536", dict(tile=65536)),
        ("t8192", dict(tile=8192)),
        ("K8+scout32+t32768", dict(K=8, scout=32, tile=32768)),
    ]
    for name, kw in rows:
        try:
            dt = timeit(lambda: frame(**kw), args.iters)
            print(json.dumps({"row": name, "variant": args.variant,
                              "scene": args.scene,
                              "ms": round(dt * 1e3, 1),
                              "rays_per_s": round(H * W / dt)}), flush=True)
        except Exception as e:                              # noqa: BLE001
            print(json.dumps({"row": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
