#!/bin/bash
# Technicolor 50-frame dynamic scene
# (reference analog: scripts/run_one_technicolor.sh)
# Usage: bash scripts/run_one_technicolor.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/technicolor}
SCENE=${2:-painter}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=technicolor \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    dataset.collection="$SCENE" \
    model=technicolor_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="technicolor_$SCENE"
