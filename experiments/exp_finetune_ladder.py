"""Fine-tuned reduced-sample render modes (VERDICT r2 item 3): train the
flagship at 32 samples, then for each reduced count k fine-tune ~500
iters WITH the k-sample slicing active in training (select_points
always_slice), and measure holdout PSNR + streaming throughput.

The round-2 ladder (exp_inference_ladder.py) showed the quality collapse
without fine-tuning (50.6 -> 28.1 dB at k=16); the reference treats
inference_samples as a usable knob because its models train with
randomized sample counts (nlf/embedding/point.py:402-449) — fine-tuning
at the target count is the equivalent calibration here.
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

    def batches(seed=0):
        for b in ds.batch_iterator(8192, seed=seed):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    log("training flagship 600 iters @ 32 samples...")
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))

    # streaming-throughput frame (bench.py geometry)
    n = 1 << 20
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    dd = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    oo = np.zeros_like(dd)
    oo[:, 2] = -1.5
    frame_np = np.concatenate(
        [oo, dd, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), 0.3, np.float32)], -1)

    def measure(m, params, it):
        renderer = Renderer(m, ray_chunk=1 << 15)
        pred = renderer.render_rays(params, jnp.asarray(hold["rays"]),
                                    it=it)["rgb"]
        val = float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))

        def fn(params, rays, itv, rng):
            ctx = StepCtx(it=itv, rng=rng, training=False)
            return m.apply(params, rays, ctx)["rgb"]

        chunk = 1 << 18
        frame = jnp.asarray(frame_np).reshape(n // chunk, chunk, -1)
        jitted = jax.jit(lambda p, c, i, r: jax.lax.map(
            lambda rr: fn(p, rr, i, r), c))
        it_dev = jnp.asarray(it, jnp.int32)
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
        return val, n / dt

    val, rps = measure(model, state.params, state.it)
    log(json.dumps({"inference_samples": 32, "finetune_iters": 0,
                    "holdout_psnr": round(val, 2),
                    "rays_per_sec": round(rps, 1)}))

    for k in (16, 8):
        cfg_k = with_inference_samples(base_cfg, k)
        sel = cfg_k["embedding"]["embeddings"]["select_points_inference"]
        sel["always_slice"] = True
        m_k = build_model(cfg_k, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        # params tree is identical (select_points is parameter-free)
        tr_k = Trainer(m_k, _training_cfg(),
                       regularizer_cfgs=tv_4000_defaults(),
                       iters_per_epoch=200)
        st_k = tr_k.init_state(jax.random.PRNGKey(0), it=state.it)
        st_k = st_k.__class__(params=jax.tree.map(lambda a: a,
                                                  state.params),
                              opt_state=st_k.opt_state, it=state.it)
        # raw (no fine-tune) quality at k
        val0, rps0 = measure(m_k, st_k.params, st_k.it)
        log("fine-tuning 500 iters @ %d samples..." % k)
        st_k, _ = tr_k.fit(st_k, batches(seed=k), num_iters=500,
                           rng=jax.random.PRNGKey(2 + k))
        val1, rps1 = measure(m_k, st_k.params, st_k.it)
        log(json.dumps({"inference_samples": k, "finetune_iters": 0,
                        "holdout_psnr": round(val0, 2),
                        "rays_per_sec": round(rps0, 1)}))
        log(json.dumps({"inference_samples": k, "finetune_iters": 500,
                        "holdout_psnr": round(val1, 2),
                        "rays_per_sec": round(rps1, 1)}))


if __name__ == "__main__":
    main()
