"""Hostile procedural scene (data/synthetic.py hostile_scene): the
quality-ladder stress scene demanded by the round-3 verdict — thin
occluders, high-frequency texture, specular view-dependent content.
The reference's quality contract is per-scene PSNR on real captures
(reference nlf/__init__.py:1015-1028); real downloads are env-blocked
(DATASETS.md), so this scene is the in-env hard substitute for the
smooth gaussian blob."""

import numpy as np
import pytest

from hyperreel_tpu.data.synthetic import (
    _hostile_field, hostile_scene)


class TestHostileScene:
    def test_gt_properties(self):
        ds = hostile_scene(n_views=2, wh=(32, 32), n_steps=192)
        rgb = ds.all_rgb
        assert rgb.shape == (2 * 32 * 32, 3)
        assert np.isfinite(rgb).all()
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        # content, not a flat field
        assert rgb.std() > 0.1
        # hard occlusion edges: adjacent-pixel jumps near saturation
        im = rgb.reshape(2, 32, 32, 3)
        assert np.abs(np.diff(im[0], axis=1)).max() > 0.5

    def test_view_dependent_specular(self):
        c = np.array([0.1, -0.05, -0.2], np.float32)
        n = np.array([0.35, 0.6, 0.72], np.float32)
        n /= np.linalg.norm(n)
        p = (c + 0.2 * n)[None]
        rgbs = []
        for d in ([0.0, 0.0, -1.0], [-0.5, -0.5, -1.0]):
            d = np.asarray(d, np.float32)
            d /= np.linalg.norm(d)
            sigma, rgb = _hostile_field(p, d[None])
            assert sigma[0] > 10.0  # on the sphere
            rgbs.append(rgb[0])
        # the Blinn lobe must move the color substantially with view
        assert np.abs(rgbs[0] - rgbs[1]).max() > 0.2

    def test_dynamic_moves_occluder(self):
        ds = hostile_scene(n_views=1, wh=(32, 32), dynamic=True,
                           num_frames=3, num_keyframes=1, n_steps=192)
        im = ds.all_rgb.reshape(3, 32, 32, 3)
        # middle bar sweeps: first and last frames differ on many pixels
        moved = (np.abs(im[0] - im[2]).max(-1) > 0.1).mean()
        assert moved > 0.01, moved

    def test_trains_with_loss_decrease(self):
        import jax
        import jax.numpy as jnp

        from hyperreel_tpu.configs.presets import (
            technicolor_z_plane, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.train.trainer import Trainer

        ds = hostile_scene(n_views=2, wh=(24, 24), dynamic=True,
                           num_frames=3, num_keyframes=2, n_steps=128)
        cfg = convert_epochs_to_iters(technicolor_z_plane(),
                                      iters_per_epoch=50)
        net = cfg["color"]["net"]
        net["N_voxel_init"] = 16 ** 3
        net["N_voxel_final"] = 16 ** 3
        net["upsamp_list"] = []
        net["update_AlphaMask_list"] = []
        model = build_model(cfg, dataset_info=ds.info())
        group = {
            "optimizer": "adam", "lr": 0.02, "lr_scheduler": "exp",
            "decay_epoch": 100, "decay_gamma": 0.125,
            "warmup_epochs": 0,
        }
        tcfg = {
            "loss": {"type": "mse"},
            "batch_size": 512,
            "optimizers": {
                "color": dict(group),
                "color_impl": dict(group, lr=0.001),
                "embedding": dict(group, lr=0.01),
                "embedding_impl": dict(group, lr=0.00075),
            },
        }
        trainer = Trainer(model, tcfg, iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))

        def batches():
            for batch in ds.batch_iterator(512, seed=0):
                yield {k: jnp.asarray(v) for k, v in batch.items()}

        state, history = trainer.fit(
            state, batches(), num_iters=300,
            rng=jax.random.PRNGKey(1), log_every=10)
        first = np.mean([h["image_loss"] for h in history[:3]])
        last = np.mean([h["image_loss"] for h in history[-3:]])
        assert np.isfinite(last)
        assert last < first * 0.8, (first, last)
