"""The FULL reference Technicolor schedule, for real (VERDICT r3 item 3).

Reference contract: 80 epochs x 4000 iters/epoch = 320,000 steps at
batch 16384 (scripts/run_one_technicolor.sh num_epochs=80 +
conf/experiment/training/technicolor_tensorf.yaml batch_size/num_iters),
with the complete event ladder (upsample at 4000/6000/8000/10000/12000,
alpha-mask at 4000/8000, lr_upsample_reset -> five optimizer resets) and
~1.5 h wall on the reference GPU (README.md:125). Dataset downloads are
env-blocked (DATASETS.md), so the data is the dynamic procedural scene
at the reference's 50-frame shape; the run exercises the real system:
full-size grids (N_voxel_final = 512M), the event ladder, 320K real
optimizer steps, per-iter metrics.jsonl, periodic holdout PSNR, orbax
checkpoints.

Writes /tmp/hw_queue/full_schedule/metrics.jsonl continuously and
prints one JSON summary line per validation plus a final line, so a
timeout still leaves a measured prefix + device-rate extrapolation.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")

OUT = "/tmp/hw_queue/full_schedule"
NUM_ITERS = int(os.environ.get("FS_ITERS", 320000))
VAL_EVERY = int(os.environ.get("FS_VAL_EVERY", 40000))
BATCH = int(os.environ.get("FS_BATCH", 16384))  # smoke-test knob


def main():
    from exp_preset_sweep import _training_cfg
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr
    from hyperreel_tpu.train.checkpoint import save_checkpoint

    os.makedirs(OUT, exist_ok=True)
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)

    # reference-shaped data: 50 frames, holdout view (val_all pattern)
    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True,
                             num_frames=50, num_keyframes=4)
    W, H = ds.img_wh
    npix = W * H
    hold_img = 4 * ds.num_frames  # view 4, frame 0
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    # the UNMODIFIED flagship preset: real N_voxel ladder to 512M,
    # upsamp 4000..12000, alpha-mask 4000/8000, lr_upsample_reset
    cfg = convert_epochs_to_iters(technicolor_z_plane(),
                                  iters_per_epoch=4000)
    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)

    tcfg = _training_cfg(steps_per_call=8)
    tcfg["batch_size"] = BATCH
    trainer = Trainer(model, tcfg, regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=4000)
    state = trainer.init_state(jax.random.PRNGKey(0))

    mf = open(f"{OUT}/metrics.jsonl", "a", buffering=1)

    def callback(m):
        mf.write(json.dumps({k: round(v, 6) if isinstance(v, float)
                             else v for k, v in m.items()}) + "\n")

    def batches():
        while True:
            for b in ds.batch_iterator(BATCH, seed=state.it):
                yield {k: jnp.asarray(v) for k, v in b.items()}

    bit = batches()
    seg_t0 = time.time()
    it_prev = 0
    renderer = None
    r_shapes = None
    while state.it < NUM_ITERS:
        n = min(VAL_EVERY - (state.it % VAL_EVERY) or VAL_EVERY,
                NUM_ITERS - state.it)
        state, history = trainer.fit(state, bit, num_iters=n,
                                     rng=jax.random.fold_in(
                                         jax.random.PRNGKey(1), state.it),
                                     log_every=100, callback=callback)
        dt = time.time() - seg_t0
        rate = (state.it - it_prev) / dt
        seg_t0, it_prev = time.time(), state.it
        # one Renderer per grid-shape epoch: rebuilding each val would
        # recompile the eval graph through the tunnel every time
        shapes = jax.tree.map(lambda a: a.shape, state.params)
        if renderer is None or shapes != r_shapes:
            renderer = Renderer(trainer.model, ray_chunk=1 << 14)
            r_shapes = shapes
        pred = renderer.render_rays(state.params,
                                    jnp.asarray(hold["rays"]),
                                    it=state.it)["rgb"]
        val = float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))
        wall = time.time() - t0
        proj = wall + (NUM_ITERS - state.it) / max(rate, 1e-9)
        print(json.dumps({
            "it": state.it, "holdout_psnr": round(val, 2),
            "steps_per_sec": round(rate, 2),
            "wall_s": round(wall, 1),
            "projected_total_s": round(proj, 1),
            "loss": round(float(history[-1]["image_loss"]), 6)
            if history else None,
        }), flush=True)
        save_checkpoint(f"{OUT}/ckpt", state, trainer.model)

    print(json.dumps({
        "run": "full_schedule_reference_320k",
        "iters": int(state.it),
        "wall_s": round(time.time() - t0, 1),
        "reference_wall_s": 5400,
    }), flush=True)


if __name__ == "__main__":
    main()
