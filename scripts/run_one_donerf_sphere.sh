#!/bin/bash
# DoNeRF static scene with sphere primitives (reference analog:
# scripts/run_one_donerf_sphere.sh)
# Usage: bash scripts/run_one_donerf_sphere.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/donerf}
SCENE=${2:-barbershop}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=donerf \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=donerf_sphere \
    training.num_epochs="$EPOCHS" \
    params.name="donerf_${SCENE}_sphere"
