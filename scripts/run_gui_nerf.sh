#!/bin/bash
# interactive viewer (requires the optional dearpygui package)
SCENE=${1:-data/nerf_synthetic/lego}
python main_nerf.py "$SCENE" --workspace trial_nerf -O --bound 1.0 --scale 0.8 --gui
