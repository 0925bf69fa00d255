#!/bin/bash
# Static LLFF scene (reference analog: scripts/run_one_llff.sh)
# Usage: bash scripts/run_one_llff.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/nerf_llff_data}
SCENE=${2:-fern}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=llff \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=llff_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="llff_$SCENE"
