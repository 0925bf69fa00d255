#!/bin/bash
# Neural 3D Video 50-frame dynamic scene
# (reference analog: scripts/run_one_n3d.sh)
DATA_DIR=${1:-/data/neural_3d}
SCENE=${2:-flame_steak}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=neural_3d \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=neural_3d_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="n3d_$SCENE"
