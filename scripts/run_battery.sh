#!/bin/bash
# Round-3 measurement battery (BENCH_NOTES.md round-3 staged capture).
# Requires the trained bench cache (.bench_cache) — `python bench.py` or
# the committed bench_assets seed it. Each step appends to $OUT.
# Usage: bash scripts/run_battery.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/battery}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "--- exit=$? tail:"; tail -4 "$OUT/$name.log"
}

# A0/A2: pallas reality probe + render-mode timings (scout/natural/fused)
run render_modes 3000 python scripts/bench_render_modes.py \
  --modes fast,guided,baked --distill-steps 8000 --distill-hidden 256 \
  --distill-layers 6 --multires 12 --finetune-steps 4000 \
  --prepass-mode scout --fine-order natural
# A2: points-in pallas megakernel A/B on the finetuned student
run render_modes_fused 1500 python scripts/bench_render_modes.py \
  --modes baked --distill-steps 8000 --distill-hidden 256 \
  --distill-layers 6 --multires 12 --finetune-steps 4000 \
  --prepass-mode scout --fine-order natural --fused-student
# H: corner-fetch strategy microbench (train-path gather decision)
run gather_H 1800 python scripts/bench_gather.py --quick --only H
# D: training throughput (steady-state step + amortized refresh),
# sweeping the corner-fetch strategies and the post-carve budget
# the 5-strategy sweep ran 2026-08-18 (BENCH_NOTES "Training throughput"
# — foldrow won); keep the battery bounded: winner + the corner8 baseline
run train 2400 python scripts/bench_train.py --steps 64 --interval 16 \
  --gather-modes foldrow,corner8 --budgets 16
# B: batched rollout sweeps at reference obs sizes
run batched_obs 3500 python scripts/bench_batched_obs.py \
  --res 100,200,400,800 --sims 2 --steps 12 --obs-render guided
# S: slice-ready aggregate (single real chip here; unchanged on a slice)
run scaling 2400 python scripts/measure_scaling.py --tpu
echo "battery done: $OUT"
