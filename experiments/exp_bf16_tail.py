"""bf16 embedding-tail A/B (VERDICT r3 item 7 / CLAUDE.md round-4 #4).

The CF MLP already runs bf16; the open question is the TAIL — the
[S, B] rows (z offsets, point coords, field-act inputs) consumed by
the pack-build kernel. Upside bound from the round-4 trace: the
pack-build kernel is the rows' only consumer at 2.65 ms of a 23.4 ms
chunk, and gathers/tables are bf16 already, so a full bf16 tail saves
<= ~1.3 ms (5%). This measures the PRECISION side on a trained model:
HYPERREEL_BF16_TAIL=sim rounds the MLP output rows through bf16
(fused_eval._mlp_cf), which is the exact information loss a bf16 tail
would introduce at its entry point (z/dist/sort math downstream would
only lose more).

Rows: holdout PSNR + max|rgb delta| vs the f32 tail, blob scene,
600-iter mid-scale training (the Pareto-ladder methodology).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")


def log(*a):
    print(*a, flush=True)


def main():
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    log("devices:", jax.devices())
    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True,
                             num_frames=8, num_keyframes=4)
    W, H = ds.img_wh
    npix = W * H
    hold_img = 4 * ds.num_frames
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    cfg = _mid_scale(convert_epochs_to_iters(technicolor_z_plane(),
                                             iters_per_epoch=200))
    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches():
        for b in ds.batch_iterator(8192, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"trained 600 iters in {time.time() - t0:.0f}s")

    preds = {}
    for tag, env in (("f32_tail", None), ("bf16_tail", "sim")):
        if env:
            os.environ["HYPERREEL_BF16_TAIL"] = env
        else:
            os.environ.pop("HYPERREEL_BF16_TAIL", None)
        # env is read at TRACE time: rebuild the model so the fused
        # eval re-traces with the flag
        m = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
        renderer = Renderer(m, ray_chunk=1 << 15)
        pred = np.asarray(renderer.render_rays(
            state.params, jnp.asarray(hold["rays"]), it=state.it)["rgb"])
        preds[tag] = pred
        val = float(psnr(pred, np.asarray(hold["rgb"])))
        log(json.dumps({"mode": tag, "holdout_psnr": round(val, 2)}))
    os.environ.pop("HYPERREEL_BF16_TAIL", None)
    delta = float(np.abs(preds["bf16_tail"] - preds["f32_tail"]).max())
    log(json.dumps({"max_rgb_delta": round(delta, 6)}))
    log("DONE")


if __name__ == "__main__":
    sys.exit(main())
