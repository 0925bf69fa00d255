#!/bin/bash
# Shiny dense scene with learned-normal deformable planes (reference
# analog: conf/experiment/model/shiny_z_deformable.yaml)
# Usage: bash scripts/run_one_shiny_deformable.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/shiny}
SCENE=${2:-cd}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=shiny \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=shiny_z_deformable \
    training.num_epochs="$EPOCHS" \
    params.name="shiny_${SCENE}_deformable"
