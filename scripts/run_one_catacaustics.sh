#!/bin/bash
# Catacaustics capture with direct-distance primitives (reference analog:
# conf/experiment/model/catacaustics_distance.yaml)
# Usage: bash scripts/run_one_catacaustics.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/catacaustics}
SCENE=${2:-}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=catacaustics \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=catacaustics_distance \
    training.num_epochs="$EPOCHS" \
    params.name="catacaustics_${SCENE}_distance"
