#!/bin/bash
# DoNeRF static scene with cylinder primitives (reference analog:
# conf/experiment/model/donerf_cylinder.yaml)
# Usage: bash scripts/run_one_donerf_cylinder.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/donerf}
SCENE=${2:-barbershop}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=donerf \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=donerf_cylinder \
    training.num_epochs="$EPOCHS" \
    params.name="donerf_${SCENE}_cylinder"
