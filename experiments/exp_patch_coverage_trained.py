"""Patch coverage with TRAINED weights (CPU).

exp_patch_coverage.py measured block spreads at init; trained
point-offset / advection / z-prediction weights could widen them (the
open quality risk for the coherent patch-gather). This trains the
mid-scale flagship on the synthetic blob (the repo's standard quality
harness) for 600 iters on CPU, then reports the same spread/violation
table on scanline rays from a held-out view's actual camera, plus the
per-slot worst offenders.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults

    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True)
    cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(), iters_per_epoch=200))
    model = build_model(cfg, dataset_info=ds.info())
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches(seed=0):
        for b in ds.batch_iterator(4096, seed=seed):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    import time
    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"trained 600 iters in {time.time() - t0:.0f}s")

    # scanline rays from the holdout view's real camera
    hold = ds.image(4 * ds.num_frames)
    rays_np = np.asarray(hold["rays"])          # [H*W, 8] frame order
    W, H = ds.img_wh
    rows = rays_np.reshape(H, W, -1)[8:-8:6]    # every 6th scanline
    rays = jnp.asarray(rows.reshape(-1, rays_np.shape[-1]))

    ctx = StepCtx(it=jnp.asarray(state.it, jnp.int32),
                  rng=jax.random.PRNGKey(2), training=False)
    x = model.embed(state.params, rays, ctx)
    pts = np.asarray(x["points"])               # [B, S, 3]
    B, S, _ = pts.shape
    aabb = np.asarray(
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"]
        .get("aabb", [[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]), np.float32)
    norm = (pts - aabb[0]) / (aabb[1] - aabb[0]) * 2 - 1
    log(f"trained model: B={B}, S={S}, coord range "
        f"{norm.min():.2f}..{norm.max():.2f}")
    for res in (128, 256, 512):
        tex = (norm + 1) / 2 * (res - 1)
        for R in (4, 8):
            t = tex[: B - B % R].reshape(-1, R, S, 3)
            spread = (t.max(1) - t.min(1)).reshape(-1, 3)
            q = np.percentile(spread, [50, 99, 99.9], axis=0)
            # exact floor-span coverage checks (patch budget = p - 2)
            fs = (np.floor(t).max(1) - np.floor(t).min(1)).reshape(-1, 3)
            v42 = ((fs[:, 0] > 2) | (fs[:, 1] > 0)).mean()
            v44 = (fs[:, :2] > 2).any(-1).mean()
            v88 = (fs[:, :2] > 6).any(-1).mean()
            log(f"res={res:3d} R={R}: p50 {q[0].round(2)} p99 "
                f"{q[1].round(2)} p99.9 {q[2].round(2)} | viol "
                f"4x2 {v42:.3%} 4x4 {v44:.3%} 8x8 {v88:.3%}")


if __name__ == "__main__":
    sys.exit(main())
