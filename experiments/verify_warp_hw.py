"""Drive the round-4 warp/warp_level machinery on the real TPU.

New pieces: embed_params field routing (model.py), no_param re-render,
WarpRegularizer/WarpLevelSetRegularizer (regularizers_extra.py) with
jnp.linalg.svd forward AND grad — SVD VJPs are a known TPU risk when
singular values repeat (the near-identity LocalAffine init is exactly
that regime), so this probes init params and a perturbed set.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_static, \
    convert_epochs_to_iters
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.train.regularizers_extra import (
    WarpRegularizer, WarpLevelSetRegularizer)
from hyperreel_tpu.train.trainer import StepCtx


def main():
    print("devices:", jax.devices(), flush=True)
    ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
    cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
    emb = cfg["embedding"]["embeddings"]
    cfg["embedding"]["embeddings"] = {
        "local_affine_0": {
            "type": "local_affine", "param_channels": 6,
            "tform_out_channels": 6,
            "net": {"type": "base", "depth": 2,
                    "hidden_channels": 32, "skips": []},
        }, **emb,
    }
    model = build_model(cfg, dataset_info=ds.info())
    params = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in next(ds.batch_iterator(4096, seed=0)).items()}
    warp = WarpRegularizer(cfg={"weight": 1.0, "param": {"n_dims": 6}})
    level = WarpLevelSetRegularizer(
        cfg={"weight": 1.0, "param": {"n_dims": 6},
             "jitter": {"pos": 0.05, "bundle_size": 3}})

    def total(p, it):
        ctx = StepCtx(it=it, rng=jax.random.PRNGKey(it), training=True)
        return (warp.loss(model, p, batch, ctx)
                + level.loss(model, p, batch, ctx))

    vg = jax.jit(jax.value_and_grad(total), static_argnums=())
    for tag, p in (
        ("init(near-identity tform: repeated singular values)", params),
        ("perturbed", jax.tree.map(
            lambda a: a + 0.01 * np.random.default_rng(1).standard_normal(
                a.shape).astype(a.dtype), params)),
    ):
        t0 = time.time()
        val, grads = vg(p, 100)
        val = float(val)
        finite = all(bool(jnp.all(jnp.isfinite(g)))
                     for g in jax.tree.leaves(grads))
        gnorm = float(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
        print(f"{tag}: loss {val:.6e} grads finite {finite} "
              f"gnorm {gnorm:.3e}  ({time.time()-t0:.1f}s)", flush=True)
        assert np.isfinite(val) and finite, tag
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
