"""Freeze the trained bench artifacts into the repo (bench_assets/).

Bench hosts are wiped between rounds; the cold bench.py run pays ~40 min
of training + distill on the tunnel before it can measure anything
(ROADMAP #11). This script copies the trained flagship checkpoint, the
reference-backbone checkpoint and the distilled student out of
.bench_cache into bench_assets/ so they can be committed; bench.py seeds
its cache from there (_seed_cache_from_assets) and goes straight to the
render measurement. BENCH_NO_ASSETS=1 restores the full cold run.

The frozen checkpoints are SLIM: the Adam moments (2/3 of the full-ckpt
bytes) are dropped — training is finished, the bench only renders — and
every float32 array is stored as bfloat16. The render path computes in
bfloat16 anyway (NetworkConfig.compute_dtype), so the bf16-stored weights
produce bit-identical frames after the seeder upcasts them to float32.

Run after a completed `python bench.py`:
    python scripts/freeze_bench_assets.py
"""

import dataclasses
import os
import pickle
import shutil
import sys

import numpy as np
import ml_dtypes

# the pickles hold package classes (RendererState); keep jax off the TPU
# in case a bench run owns it while we freeze
os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")
ASSETS = os.path.join(ROOT, "bench_assets")


def latest_ckpt(ws):
    d = os.path.join(CACHE, ws, "checkpoints")
    if not os.path.isdir(d):
        return None
    cks = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
    return os.path.join(d, cks[-1]) if cks else None


def _downcast(x):
    if isinstance(x, dict):
        return {k: _downcast(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(_downcast(v) for v in x)
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return dataclasses.replace(x, **{
            f.name: _downcast(getattr(x, f.name))
            for f in dataclasses.fields(x)})
    if isinstance(x, np.ndarray) and x.dtype == np.float32:
        return x.astype(ml_dtypes.bfloat16)
    return x


def slim(src, dst):
    with open(src, "rb") as f:
        state = pickle.load(f)
    state.pop("optimizer", None)
    state.pop("ema", None)
    state = _downcast(state)
    with open(dst, "wb") as f:
        pickle.dump(state, f)


def main():
    os.makedirs(ASSETS, exist_ok=True)
    frozen = []
    # per-scene flagships (bench.SCENE_SPECS names) + the ref backbone
    for ws, name in [("ws", "flagship"), ("ws_gauntlet", "flagship_gauntlet"),
                     ("ws_ref", "refbb"),
                     ("ws_ref_gauntlet", "refbb_gauntlet")]:
        src = latest_ckpt(ws)
        if src is None:
            print(f"[WARN] no checkpoint under {ws}/checkpoints — skipped")
            continue
        dst = os.path.join(ASSETS, f"{name}.ckpt")
        slim(src, dst)
        frozen.append((dst, os.path.getsize(dst)))
    import glob
    import re
    students = sorted(
        p for p in glob.glob(os.path.join(CACHE, "bench_student*.pkl"))
        # skip env-schedule probe artifacts (_d<steps>f<steps> cache tags):
        # only variants trained at their ENCODED schedule are assets
        if not re.search(r"_d\d+f\d+\.pkl$", p))
    if not students:
        print("[WARN] no bench_student*.pkl — skipped")
    for src in students:
        dst = os.path.join(ASSETS, os.path.basename(src))
        shutil.copy(src, dst)
        frozen.append((dst, os.path.getsize(dst)))
    if not frozen:
        sys.exit("nothing to freeze — run `python bench.py` first")
    for path, size in frozen:
        print(f"froze {os.path.relpath(path, ROOT)}  {size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
