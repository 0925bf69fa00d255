"""Hostile-scene Pareto ladder (VERDICT r3 item 4, real TPU).

Every quality-vs-speed claim so far rests on the smooth gaussian-blob
scene; this reruns the compact/stride ladder on the HOSTILE procedural
scene (thin near-opaque occluders, high-frequency texture, a specular
sphere — hyperreel_tpu/data/synthetic.py hostile_scene): first-k
compaction keeps NEAR samples, so a scene with hard occluders is
exactly where the blob's "-0.18 dB @ k=16" could invert. If compact
k=16 loses > ~0.5 dB here, the viewer's auto fast-mode default needs a
quality gate (VERDICT item 4 contract).

Rows: full 32 / compact k16 / stride k16 / stride k8, trained 600
iters at mid scale like the blob ladder (PERFORMANCE.md) for a
same-methodology comparison, on BOTH scenes back to back.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")


def log(*a):
    print(*a, flush=True)


def run_scene(scene_name, make_scene):
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters,
        with_compact_samples, with_inference_samples)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    ds = make_scene()
    W, H = ds.img_wh
    npix = W * H
    hold_img = 4 * ds.num_frames
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    base_cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(),
                                iters_per_epoch=200))
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

    log(f"[{scene_name}] training 600 iters...")
    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"[{scene_name}] trained in {time.time() - t0:.0f}s")

    def measure_psnr(m, params, it):
        renderer = Renderer(m, ray_chunk=1 << 15)
        pred = renderer.render_rays(params, jnp.asarray(hold["rays"]),
                                    it=it)["rgb"]
        return float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))

    def variant(mk):
        cfg_k = mk(base_cfg)
        m_k = build_model(cfg_k, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        init_p = m_k.init(jax.random.PRNGKey(0))
        emb = dict(init_p["embedding"])
        emb.update(state.params["embedding"])
        return m_k, dict(state.params, embedding=emb)

    rows = [("full32", model, state.params)]
    for tag, mk in (
            ("compact16", lambda c: with_compact_samples(c, 16)),
            ("stride16", lambda c: with_inference_samples(c, 16)),
            ("stride8", lambda c: with_inference_samples(c, 8))):
        m_k, p_k = variant(mk)
        rows.append((tag, m_k, p_k))

    for tag, m_k, p_k in rows:
        val = measure_psnr(m_k, p_k, state.it)
        log(json.dumps({"scene": scene_name, "mode": tag,
                        "holdout_psnr": round(val, 2)}))


def main():
    from hyperreel_tpu.data.synthetic import (
        gaussian_blob_scene, hostile_scene)
    log("devices:", jax.devices())
    run_scene("hostile", lambda: hostile_scene(
        n_views=8, wh=(96, 96), dynamic=True, num_frames=8,
        num_keyframes=4))
    run_scene("blob", lambda: gaussian_blob_scene(
        n_views=8, wh=(96, 96), dynamic=True, num_frames=8,
        num_keyframes=4))


if __name__ == "__main__":
    sys.exit(main())
