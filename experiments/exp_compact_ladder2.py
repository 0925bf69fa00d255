"""Extended compact-k Pareto ladder (round-3b):

Part A — flagship (technicolor_z_plane, 32 samples): compact raw
quality + streaming throughput at k in {28, 24, 20, 16} (k=16/8 were
measured in exp_finetune_ladder; k=16 repeats here as the anchor).
Question: is there a quality-neutral (<= 0.05 dB) compact point above
k=16?

Part B — multi-axis DYNAMIC family (neural_3d_z_plane, 64 samples,
[8, 4, 4] grids): first compact-k measurements for the 3-gather
family — full 64, compact 32 and 16.

All raw (no fine-tune; PERFORMANCE.md ladder showed compact needs none
at k=16: -0.18 dB). Usage:
  python experiments/exp_compact_ladder2.py A|B
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def make_frame():
    n = 1 << 20
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    dd = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    oo = np.zeros_like(dd)
    oo[:, 2] = -1.5
    return np.concatenate(
        [oo, dd, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), 0.3, np.float32)], -1), n


def run_family(base_preset, z_channels, ks, label):
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        convert_epochs_to_iters, with_compact_samples)
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
        convert_epochs_to_iters(base_preset(), iters_per_epoch=200))
    base_cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
        "invalid_sort_far"] = True
    model = build_model(base_cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches(seed=0):
        for b in ds.batch_iterator(8192, seed=seed):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    log(f"[{label}] training 600 iters @ {z_channels} samples...")
    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"[{label}] trained in {time.time() - t0:.0f}s")

    frame_np, n = make_frame()

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
    log(json.dumps({"family": label, "mode": "full",
                    "k": z_channels, "holdout_psnr": round(val, 2),
                    "rays_per_sec": round(rps, 1)}))

    for k in ks:
        cfg_k = with_compact_samples(base_cfg, k)
        m_k = build_model(cfg_k, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        init_p = m_k.init(jax.random.PRNGKey(0))
        emb = dict(init_p["embedding"])
        emb.update(state.params["embedding"])
        params_k = dict(state.params, embedding=emb)
        val0, rps0 = measure(m_k, params_k, state.it)
        log(json.dumps({"family": label, "mode": "compact", "k": k,
                        "holdout_psnr": round(val0, 2),
                        "rays_per_sec": round(rps0, 1)}))


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "A"
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, neural_3d_z_plane)
    if part == "A":
        run_family(technicolor_z_plane, 32, (28, 24, 20, 16),
                   "flagship")
    else:
        run_family(neural_3d_z_plane, 64, (32, 16), "neural3d")


if __name__ == "__main__":
    main()
