"""Parity tests for the fused Pallas render core (ops/pallas/shade.py)
against the reference XLA eval path on the flagship dynamic model.

On CPU the kernel runs in interpret mode; the TPU compile path is
validated separately (experiments/ + bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import (
    technicolor_z_plane, convert_epochs_to_iters)
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.models.ctx import StepCtx


def _flagship(z_channels=8, fused=None):
    cfg = convert_epochs_to_iters(technicolor_z_plane(z_channels), 100)
    net = cfg["color"]["net"]
    net["N_voxel_init"] = 24 ** 3
    net["N_voxel_final"] = 24 ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    if fused is not None:
        net["fused_render"] = fused
    info = {"num_keyframes": 3, "num_frames": 12, "num_views": 4}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _rays(n, seed=0, t=0.3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    o[:, 2] -= 1.5
    d = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    cam = rng.integers(0, 4, (n, 1)).astype(np.float32)
    tt = np.full((n, 1), t, np.float32)
    return jnp.asarray(np.concatenate([o, d, cam, tt], -1))


class TestFusedShade:
    def test_eligibility(self):
        model, _ = _flagship(fused=True)
        net = model.color_net
        assert net._fused_eligible
        ctx_eval = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(0),
                           training=False)
        ctx_train = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(0),
                            training=True)
        assert net._fused_ok({}, ctx_eval, {})
        assert not net._fused_ok({}, ctx_train, {})
        assert not net._fused_ok({}, ctx_eval, {"fields": ["points"]})
        assert net._fused_ok({}, ctx_eval, {"fields": ["distances"]})

    def test_parity_with_reference_path(self):
        model_f, params = _flagship(fused=True)
        model_r, _ = _flagship(fused=False)
        # boost density so acc_map is substantial — with raw random init
        # the composite output is near zero and parity is vacuous (this
        # masked a color-scale semantics bug once)
        params["color"]["density"] = jax.tree.map(
            lambda a: a * 6.0, params["color"]["density"])
        rays = _rays(64)
        ctx = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(1),
                      training=False)
        out_f = model_f.apply(params, rays, ctx)["rgb"]
        out_r = model_r.apply(params, rays, ctx)["rgb"]
        assert out_f.shape == out_r.shape == (64, 3)
        assert np.all(np.isfinite(np.asarray(out_f)))
        assert float(np.asarray(out_r).mean()) > 0.05  # non-vacuous
        # bf16 four-hot weights vs f32 interpolation: small tolerance
        err = np.abs(np.asarray(out_f) - np.asarray(out_r)).max()
        assert err < 5e-3, err

    def test_depth_field(self):
        model_f, params = _flagship(fused=True)
        model_r, _ = _flagship(fused=False)
        rays = _rays(32, seed=3)
        ctx = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(1),
                      training=False)
        kw = {"fields": ["distances"]}
        d_f = model_f.apply(params, rays, ctx, kw)["distances"]
        d_r = model_r.apply(params, rays, ctx, kw)["distances"]
        assert d_f.shape == (32, 1) and d_r.shape == (32, 1)
        assert np.abs(np.asarray(d_f) - np.asarray(d_r)).max() < 2e-2

    def test_training_unaffected(self):
        """Training path must not route through the fused kernel (it has
        no VJP)."""
        model_f, params = _flagship(fused=True)
        rays = _rays(32, seed=4)
        ctx = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(2),
                      training=True)

        def loss(p):
            return jnp.mean(model_f.apply(p, rays, ctx)["rgb"] ** 2)

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


class TestFusedShadeShapes:
    """Parity at non-flagship shapes: more z samples, more keyframes, and
    the inference_samples-reduced eval path."""

    def _model_pair(self, z_channels, info):
        import copy
        cfg_f = convert_epochs_to_iters(
            technicolor_z_plane(z_channels), 100)
        net = cfg_f["color"]["net"]
        net["N_voxel_init"] = 24 ** 3
        net["N_voxel_final"] = 24 ** 3
        net["upsamp_list"] = []
        net["update_AlphaMask_list"] = []
        cfg_r = copy.deepcopy(cfg_f)
        cfg_f["color"]["net"]["fused_render"] = True
        cfg_r["color"]["net"]["fused_render"] = False
        model_f = build_model(cfg_f, dataset_info=info)
        model_r = build_model(cfg_r, dataset_info=info)
        params = model_f.init(jax.random.PRNGKey(0))
        params["color"]["density"] = jax.tree.map(
            lambda a: a * 6.0, params["color"]["density"])
        return model_f, model_r, params

    def test_parity_z64_k6(self):
        info = {"num_keyframes": 6, "num_frames": 18, "num_views": 4}
        model_f, model_r, params = self._model_pair(64, info)
        rays = _rays(32, seed=11)
        ctx = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(1),
                      training=False)
        out_f = model_f.apply(params, rays, ctx)["rgb"]
        out_r = model_r.apply(params, rays, ctx)["rgb"]
        assert np.all(np.isfinite(np.asarray(out_f)))
        err = np.abs(np.asarray(out_f) - np.asarray(out_r)).max()
        assert err < 5e-3, err

    def test_parity_with_inference_samples(self):
        from hyperreel_tpu.configs.presets import with_inference_samples
        info = {"num_keyframes": 3, "num_frames": 12, "num_views": 4}
        cfg = convert_epochs_to_iters(technicolor_z_plane(16), 100)
        net = cfg["color"]["net"]
        net["N_voxel_init"] = 24 ** 3
        net["N_voxel_final"] = 24 ** 3
        net["upsamp_list"] = []
        net["update_AlphaMask_list"] = []
        cfg = with_inference_samples(cfg, 8)
        import copy
        cfg_r = copy.deepcopy(cfg)
        cfg["color"]["net"]["fused_render"] = True
        cfg_r["color"]["net"]["fused_render"] = False
        model_f = build_model(cfg, dataset_info=info)
        model_r = build_model(cfg_r, dataset_info=info)
        params = model_f.init(jax.random.PRNGKey(2))
        params["color"]["density"] = jax.tree.map(
            lambda a: a * 6.0, params["color"]["density"])
        rays = _rays(32, seed=12)
        ctx = StepCtx(it=jnp.asarray(0), rng=jax.random.PRNGKey(3),
                      training=False)
        out_f = model_f.apply(params, rays, ctx)["rgb"]
        out_r = model_r.apply(params, rays, ctx)["rgb"]
        assert out_f.shape == (32, 3)
        assert np.all(np.isfinite(np.asarray(out_f)))
        err = np.abs(np.asarray(out_f) - np.asarray(out_r)).max()
        assert err < 5e-3, err
