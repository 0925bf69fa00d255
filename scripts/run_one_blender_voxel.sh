#!/bin/bash
# Synthetic Blender scene with voxel-grid primitives (reference analog:
# conf/experiment/model/blender_voxel.yaml)
# Usage: bash scripts/run_one_blender_voxel.sh <data_dir> <scene> [epochs]
DATA_DIR=${1:-/data/nerf_synthetic}
SCENE=${2:-lego}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=blender \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    model=blender_voxel \
    training.num_epochs="$EPOCHS" \
    params.name="blender_${SCENE}_voxel"
