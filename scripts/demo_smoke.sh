#!/bin/bash
# End-to-end smoke demo without downloads (synthetic analytic scene):
# trains a tiny model for 2 epochs and renders a spiral.
set -e
python -m hyperreel_tpu.main \
    dataset.name=synthetic_blobs 'dataset.wh=[32,32]' dataset.n_views=4 \
    model=tiny_static \
    training.num_iters=200 training.num_epochs=2 training.batch_size=1024 \
    training.val_every=1 training.log_every=50 \
    params.name=smoke
python -m hyperreel_tpu.main --render-only --resume runs/smoke/last \
    dataset.name=synthetic_blobs 'dataset.wh=[32,32]' dataset.n_views=4 \
    model=tiny_static params.name=smoke
