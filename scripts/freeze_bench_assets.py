"""Freeze the trained bench artifacts into the repo (bench_assets/).

Bench hosts are wiped between rounds; the cold bench.py run pays ~40 min
of training + distill on the tunnel before it can measure anything
(ROADMAP #11). This script copies the trained flagship checkpoint, the
reference-backbone checkpoint and the distilled student out of
.bench_cache into bench_assets/ so they can be committed; bench.py seeds
its cache from there (_seed_cache_from_assets) and goes straight to the
render measurement. BENCH_NO_ASSETS=1 restores the full cold run.

Run after a completed `python bench.py`:
    python scripts/freeze_bench_assets.py
"""

import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".bench_cache")
ASSETS = os.path.join(ROOT, "bench_assets")


def latest_ckpt(ws):
    d = os.path.join(CACHE, ws, "checkpoints")
    if not os.path.isdir(d):
        return None
    cks = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
    return os.path.join(d, cks[-1]) if cks else None


def main():
    os.makedirs(ASSETS, exist_ok=True)
    frozen = []
    for ws, name in [("ws", "flagship"), ("ws_ref", "refbb")]:
        src = latest_ckpt(ws)
        if src is None:
            print(f"[WARN] no checkpoint under {ws}/checkpoints — skipped")
            continue
        dst = os.path.join(ASSETS, f"{name}.ckpt")
        shutil.copy(src, dst)
        frozen.append((dst, os.path.getsize(dst)))
    src = os.path.join(CACHE, "bench_student.pkl")
    if os.path.exists(src):
        dst = os.path.join(ASSETS, "bench_student.pkl")
        shutil.copy(src, dst)
        frozen.append((dst, os.path.getsize(dst)))
    else:
        print("[WARN] no bench_student.pkl — skipped")
    if not frozen:
        sys.exit("nothing to freeze — run `python bench.py` first")
    for path, size in frozen:
        print(f"froze {os.path.relpath(path, ROOT)}  {size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
