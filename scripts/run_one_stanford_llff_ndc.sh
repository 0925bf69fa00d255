#!/bin/bash
# Stanford light field, two-plane param + NDC (reference analog:
# scripts/run_one_stanford_llff_ndc.sh)
# Usage: bash scripts/run_one_stanford_llff_ndc.sh <data_dir> <scene> [step] [epochs]
DATA_DIR=${1:-/data/stanford_half}
SCENE=${2:-tarot}
STEP=${3:-4}
EPOCHS=${4:-100}

python -m hyperreel_tpu.main \
    dataset.name=stanford_llff \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    dataset.use_ndc=true \
    dataset.lightfield_step="$STEP" \
    model=stanford_llff_z_plane \
    training.num_epochs="$EPOCHS" \
    params.name="stanford_llff_${SCENE}_step_${STEP}"
