#!/bin/bash
# train + test the hash-grid NeRF on a scene (reference scripts/run_nerf.sh recipe)
set -e
SCENE=${1:-data/nerf_synthetic/lego}
python main_nerf.py "$SCENE" --workspace trial_nerf -O --bound 1.0 --scale 0.8 --dt_gamma 0
python main_nerf.py "$SCENE" --workspace trial_nerf -O --bound 1.0 --scale 0.8 --dt_gamma 0 --test
