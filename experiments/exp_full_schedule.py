"""Full-schedule hardware validation of the flagship dynamic preset with
its REAL event pipeline (alpha-mask + shrink + upsample at iter 4000,
lr_upsample_reset), 5000 iters on one chip — the round-2 re-run of the
round-1 validation (PERFORMANCE.md "Full-schedule stability"), now with
the fused eval path, threaded host batch prep, and the einsum coordinate
extraction in place. Prints one JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import sys
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    t0 = time.time()
    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True)
    W, H = ds.img_wh
    npix = W * H
    hold_img = 4 * ds.num_frames
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    cfg = convert_epochs_to_iters(technicolor_z_plane(),
                                  iters_per_epoch=1000)
    net = cfg["color"]["net"]
    net["N_voxel_init"] = 128 ** 3
    net["N_voxel_final"] = 160 ** 3
    net["upsamp_list"] = [4000]
    net["update_AlphaMask_list"] = [4000]

    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    tcfg = _training_cfg()
    tcfg["batch_size"] = 16384
    trainer = Trainer(model, tcfg, regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches():
        for b in ds.batch_iterator(16384, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    state, history = trainer.fit(state, batches(), num_iters=5000,
                                 rng=jax.random.PRNGKey(1), log_every=500)
    # trainer.fit mutates grid shapes at events; rebuild the renderer's
    # model view from the trainer's current model
    renderer = Renderer(trainer.model, ray_chunk=1 << 15)
    pred = renderer.render_rays(state.params, jnp.asarray(hold["rays"]),
                                it=state.it)["rgb"]
    val = float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))
    print(json.dumps({
        "run": "full_schedule_5000",
        "holdout_psnr": round(val, 2),
        "final_loss": round(float(history[-1]["image_loss"]), 6),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
