#!/bin/bash
# Offline spiral render from a checkpoint
# (reference analog: scripts/render_one_*.sh with render_only=True)
# Usage: bash scripts/render_one.sh <run_dir> <dataset.name> <root_dir> <model>
RUN_DIR=${1:-runs/experiment}
DS=${2:-synthetic_blobs}
ROOT=${3:-}
MODEL=${4:-tiny_static}

EXTRA=""
if [ -n "$ROOT" ]; then EXTRA="dataset.root_dir=$ROOT"; fi

python -m hyperreel_tpu.main --render-only --resume "$RUN_DIR/last" \
    dataset.name="$DS" $EXTRA model="$MODEL"
