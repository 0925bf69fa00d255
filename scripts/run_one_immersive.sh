#!/bin/bash
# Google Immersive 50-frame dynamic scene
# (reference analog: scripts/run_one_immersive.sh)
DATA_DIR=${1:-/data/immersive}
SCENE=${2:-02_Flames}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=immersive \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    dataset.collection="$SCENE" \
    model=technicolor_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="immersive_$SCENE"
