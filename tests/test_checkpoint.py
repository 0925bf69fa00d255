"""Checkpoint/resume tests incl. grid-shape metadata after grid events
(reference: grid-aware load_state_dict, nlf/__init__.py:433-479)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_static, convert_epochs_to_iters
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.train.trainer import Trainer
from hyperreel_tpu.train.checkpoint import save_checkpoint, restore_checkpoint


def _training_cfg():
    group = {"optimizer": "adam", "lr": 0.02, "lr_scheduler": "exp",
             "decay_epoch": 100, "decay_gamma": 0.125}
    return {"loss": {"type": "mse"},
            "optimizers": {"color": dict(group),
                           "color_impl": dict(group, lr=0.001),
                           "embedding": dict(group, lr=0.01),
                           "embedding_impl": dict(group, lr=0.00075)}}


def test_roundtrip_after_upsample_event(tmp_path):
    ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
    cfg = convert_epochs_to_iters(tiny_static(), 50)
    cfg["color"]["net"]["upsamp_list"] = [10]
    cfg["color"]["net"]["N_voxel_init"] = 12 ** 3
    cfg["color"]["net"]["N_voxel_final"] = 20 ** 3
    model = build_model(cfg, dataset_info=ds.info())
    trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches():
        for b in ds.batch_iterator(64, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    state, _ = trainer.fit(state, batches(), num_iters=15,
                           rng=jax.random.PRNGKey(1))
    grid_after = list(model.color_net.grid_size)
    assert state.it == 15

    path = save_checkpoint(str(tmp_path / "ckpt"), state, model)

    # fresh model/trainer with the ORIGINAL (pre-upsample) grid config:
    # restore must rebuild the upsampled shapes from metadata
    model2 = build_model(convert_epochs_to_iters(
        dict(cfg), 50), dataset_info=ds.info())
    trainer2 = Trainer(model2, _training_cfg(), iters_per_epoch=50)
    state2 = restore_checkpoint(path, trainer2)

    assert state2.it == 15
    assert list(model2.color_net.grid_size) == grid_after
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # restored model renders identically
    rays = jnp.asarray(ds.all_coords[:16])
    ctx = make_ctx(it=15, training=False)
    out1 = model.apply(state.params, rays, ctx)["rgb"]
    out2 = model2.apply(state2.params, rays, ctx)["rgb"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # and training can continue from the restored state
    state3, _ = trainer2.fit(state2, batches(), num_iters=3,
                             rng=jax.random.PRNGKey(2))
    assert state3.it == 18


def test_weights_only_checkpoint(tmp_path):
    ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
    cfg = convert_epochs_to_iters(tiny_static(), 50)
    model = build_model(cfg, dataset_info=ds.info())
    trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
    state = trainer.init_state(jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path / "w"), state, model,
                           weights_only=True)
    state2 = restore_checkpoint(path, trainer)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)