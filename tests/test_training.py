"""Training-loop integration tests: loss decreases / PSNR climbs on the
synthetic blob scene; optimizer groups and schedules behave; grid-event
segmenting works (SURVEY.md §4 item 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import (
    tiny_static, tiny_dynamic, convert_epochs_to_iters)
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.train.trainer import Trainer, params_fingerprint
from hyperreel_tpu.train.regularizers import tv_4000_defaults
from hyperreel_tpu.train.optim import make_lr_schedule
from hyperreel_tpu.train.metrics import psnr, ssim


def _training_cfg():
    group = {
        "optimizer": "adam", "lr": 0.02, "lr_scheduler": "exp",
        "decay_epoch": 100, "decay_gamma": 0.125, "warmup_epochs": 0,
    }
    return {
        "loss": {"type": "mse"},
        "batch_size": 512,
        "optimizers": {
            "color": dict(group),
            "color_impl": dict(group, lr=0.001),
            "embedding": dict(group, lr=0.01),
            "embedding_impl": dict(group, lr=0.00075),
        },
    }


def _jnp_batches(ds, batch_size, seed=0):
    it = ds.batch_iterator(batch_size, seed=seed)
    for batch in it:
        yield {k: jnp.asarray(v) for k, v in batch.items()}


class TestLrSchedule:
    def test_exp_decay_steps_per_epoch(self):
        sched = make_lr_schedule(
            {"lr": 0.02, "lr_scheduler": "exp", "decay_epoch": 100,
             "decay_gamma": 0.125}, iters_per_epoch=10)
        lr0 = float(sched(jnp.asarray(0)))
        lr_half = float(sched(jnp.asarray(500 * 10)))
        assert lr0 == pytest.approx(0.02)
        # epoch 500, decay_epoch 100 -> gamma^5
        assert lr_half == pytest.approx(0.02 * 0.125 ** 5, rel=1e-4)
        # stepped per epoch: constant within an epoch
        assert float(sched(jnp.asarray(5))) == pytest.approx(lr0)

    def test_steplr(self):
        sched = make_lr_schedule(
            {"lr": 1.0, "lr_scheduler": "steplr", "decay_epoch": 3,
             "decay_gamma": 0.1}, iters_per_epoch=1)
        assert float(sched(jnp.asarray(2))) == pytest.approx(1.0)
        assert float(sched(jnp.asarray(3))) == pytest.approx(0.1)


class TestStaticTraining:
    def test_loss_decreases(self):
        ds = gaussian_blob_scene(n_views=4, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, _training_cfg(),
                          regularizer_cfgs=tv_4000_defaults(),
                          iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = _jnp_batches(ds, 512)
        state, history = trainer.fit(
            state, batches, num_iters=150, rng=jax.random.PRNGKey(1),
            log_every=10)
        first = np.mean([h["image_loss"] for h in history[:3]])
        last = np.mean([h["image_loss"] for h in history[-3:]])
        assert last < first * 0.7, (first, last)
        assert np.isfinite(last)

    def test_grid_event_upsample_mid_training(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        # enable one upsample event at iter 20
        cfg["color"]["net"]["upsamp_list"] = [20]
        cfg["color"]["net"]["N_voxel_init"] = 16 ** 3
        cfg["color"]["net"]["N_voxel_final"] = 24 ** 3
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        gs_before = list(model.color_net.grid_size)
        batches = _jnp_batches(ds, 128)
        state, history = trainer.fit(
            state, batches, num_iters=30, rng=jax.random.PRNGKey(1),
            log_every=5)
        gs_after = list(model.color_net.grid_size)
        assert state.it == 30
        assert gs_after != gs_before
        assert all(a >= b for a, b in zip(gs_after, gs_before))
        # training continued after the event with finite loss
        assert np.isfinite(history[-1]["loss"])


class TestScanTraining:
    def test_scan_matches_single_step_loop(self):
        """steps_per_call>1 advances the same schedules/events and reaches
        comparable loss (rng split order differs, so trajectories are not
        bit-identical)."""
        ds = gaussian_blob_scene(n_views=4, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        tcfg = dict(_training_cfg(), steps_per_call=5)
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, tcfg, iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = _jnp_batches(ds, 512)
        state, history = trainer.fit(
            state, batches, num_iters=100, rng=jax.random.PRNGKey(1),
            log_every=10)
        assert state.it == 100
        # log granularity preserved: entries at every multiple of 10
        assert [h["it"] for h in history] == list(range(10, 101, 10))
        first = history[0]["image_loss"]
        last = history[-1]["image_loss"]
        assert last < first * 0.7, (first, last)

    def test_scan_crosses_grid_event_with_remainder(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"]["upsamp_list"] = [23]  # not a multiple of 5
        cfg["color"]["net"]["N_voxel_init"] = 16 ** 3
        cfg["color"]["net"]["N_voxel_final"] = 24 ** 3
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, dict(_training_cfg(), steps_per_call=5),
                          iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        gs_before = list(model.color_net.grid_size)
        batches = _jnp_batches(ds, 128)
        state, history = trainer.fit(
            state, batches, num_iters=33, rng=jax.random.PRNGKey(1),
            log_every=1)
        assert state.it == 33
        assert list(model.color_net.grid_size) != gs_before
        assert [h["it"] for h in history] == list(range(1, 34))
        assert np.isfinite(history[-1]["loss"])


class TestDynamicTraining:
    def test_loss_decreases_dynamic(self):
        ds = gaussian_blob_scene(n_views=2, wh=(12, 12), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, _training_cfg(),
                          regularizer_cfgs=tv_4000_defaults(),
                          iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = _jnp_batches(ds, 256)
        state, history = trainer.fit(
            state, batches, num_iters=120, rng=jax.random.PRNGKey(1),
            log_every=10)
        first = np.mean([h["image_loss"] for h in history[:3]])
        last = np.mean([h["image_loss"] for h in history[-3:]])
        assert last < first * 0.8, (first, last)


class TestMetrics:
    def test_psnr_identity(self):
        img = jnp.ones((16, 16, 3)) * 0.5
        assert float(psnr(img, img)) > 100

    def test_psnr_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.ones((8, 8, 3)) * 0.1
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)

    def test_ssim_bounds(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        noisy = jnp.clip(
            img + rng.normal(0, 0.3, img.shape).astype(np.float32), 0, 1)
        s = float(ssim(img, noisy))
        assert 0.0 < s < 0.9

    def test_ssim_matches_skimage(self):
        skimage = pytest.importorskip("skimage.metrics")
        if getattr(skimage, "_is_hyperreel_stub", False):
            pytest.skip("only the reference_shim skimage stub is present")
        structural_similarity = skimage.structural_similarity
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ref = structural_similarity(
            a, b, data_range=1.0, channel_axis=-1, gaussian_weights=True,
            sigma=1.5, use_sample_covariance=False)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(ref, abs=2e-3)


class TestStepCache:
    """Shape-preserving grid events must reuse the compiled train step
    (a recompile via the remote AOT helper costs 5-20 min per segment;
    reference alpha-mask-only events change no shapes,
    tensorf_base.py:509-553)."""

    def test_same_shapes_reuse_compiled_step(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))
        s1 = trainer.get_train_step(state.params)
        s2 = trainer.get_train_step(state.params)
        assert s1[0] is s2[0]
        sc1 = trainer.get_train_step_scan(state.params, 4)
        sc2 = trainer.get_train_step_scan(state.params, 4)
        assert sc1[0] is sc2[0]
        assert sc1[0] is not s1[0]

    def test_alpha_only_event_does_not_rebuild_step(self, monkeypatch):
        """Second alpha-mask event (no shrink, no upsample) preserves all
        shapes: fit must cross it without calling make_train_step again."""
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"]["upsamp_list"] = []
        cfg["color"]["net"]["update_AlphaMask_list"] = [10, 20]
        model = build_model(cfg, dataset_info=ds.info())
        trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
        state = trainer.init_state(jax.random.PRNGKey(0))

        calls = []
        orig = Trainer.make_train_step

        def counted(self, params_example):
            calls.append(params_fingerprint(params_example))
            return orig(self, params_example)

        monkeypatch.setattr(Trainer, "make_train_step", counted)
        batches = _jnp_batches(ds, 128)
        state, _ = trainer.fit(state, batches, num_iters=30,
                               rng=jax.random.PRNGKey(1))
        assert state.it == 30
        # one compile per distinct shape signature: the iter-10 event may
        # shrink (shape change -> second compile), but iter-20 (alpha-only)
        # must NOT add a third
        assert len(calls) == len(set(calls))
        assert len(calls) <= 2, calls
