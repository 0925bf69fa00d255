#!/bin/bash
# Google Immersive 50-frame dynamic scene with the immersive-specific
# sphere model (reference analog: scripts/run_one_immersive.sh +
# conf/experiment/model/immersive_sphere_new.yaml)
DATA_DIR=${1:-/data/immersive}
SCENE=${2:-02_Flames}
EPOCHS=${3:-40}

python -m hyperreel_tpu.main \
    dataset.name=immersive \
    dataset.root_dir="$DATA_DIR/$SCENE" \
    dataset.collection="$SCENE" \
    model=immersive_sphere_new \
    training.num_epochs="$EPOCHS" \
    params.name="immersive_$SCENE"
