"""Quality-calibrated fast render modes: train the flagship once at mid
scale, then measure holdout PSNR AND streaming render throughput at
inference_samples = 32 (full) / 16 / 8 (reference inference-time sample
control, nlf/embedding/point.py:402-480). Prints one JSON line per mode.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    import sys
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters,
        with_inference_samples)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True)
    W, H = ds.img_wh
    npix = W * H
    hold_img = 4 * ds.num_frames
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    base_cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(), iters_per_epoch=200))
    model = build_model(base_cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches():
        for b in ds.batch_iterator(8192, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    log("training flagship 600 iters...")
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))

    # streaming-throughput frame (bench.py geometry, 2^20 rays)
    n = 1 << 20
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    frame_np = np.concatenate(
        [o, d, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), 0.3, np.float32)], -1)

    for samples in (None, 16, 8):
        cfg = (base_cfg if samples is None
               else with_inference_samples(base_cfg, samples))
        m = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
        # graft trained params into the (possibly larger) new param tree
        params = m.init(jax.random.PRNGKey(0))
        for k, v in state.params.items():
            if isinstance(v, dict) and k in params:
                params[k] = {**params[k], **v}
            else:
                params[k] = v

        renderer = Renderer(m, ray_chunk=1 << 15)
        pred = renderer.render_rays(params, jnp.asarray(hold["rays"]),
                                    it=state.it)["rgb"]
        val = float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))

        def fn(params, rays, it, rng):
            ctx = StepCtx(it=it, rng=rng, training=False)
            return m.apply(params, rays, ctx)["rgb"]

        chunk = 1 << 18
        frame = jnp.asarray(frame_np).reshape(n // chunk, chunk, -1)

        def render_frame(params, chunks, it, rng):
            return jax.lax.map(lambda r: fn(params, r, it, rng), chunks)

        jitted = jax.jit(render_frame)
        it_dev = jnp.asarray(state.it, jnp.int32)
        rng = jax.random.PRNGKey(0)
        out = jitted(params, frame, it_dev, rng)
        out.block_until_ready()
        n_timed = 6
        variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1))
                    for i in range(n_timed)]
        for v in variants:
            float(v[0, 0, 0])
        t0 = time.perf_counter()
        outs = [jitted(params, v, it_dev, rng) for v in variants]
        float(outs[-1][0, 0, 0])
        dt = (time.perf_counter() - t0) / n_timed
        print(json.dumps({
            "inference_samples": samples or 32,
            "holdout_psnr": round(val, 2),
            "rays_per_sec": round(n / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
