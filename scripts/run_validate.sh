#!/bin/bash
# safety-validation sweep (reference validate.py recipe); --camera nerf runs
# hermetically on TPU without Blender
set -e
SCENE=${1:-data/stonehenge}
python validate.py "$SCENE" --workspace stonehenge -O --bound 2.0 --scale 1.0 --camera "${2:-nerf}"
