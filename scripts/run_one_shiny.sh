#!/bin/bash
# Shiny dense scene, two-plane + z-planes (reference analog:
# scripts/run_one_shiny_dense.sh)
# Usage: bash scripts/run_one_shiny.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/shiny}
SCENE=${2:-cd}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=shiny \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=shiny_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="shiny_$SCENE"
