"""End-to-end model forward tests: the full HyperReel pipeline
(ray-prediction MLP -> z-plane intersect -> TensorVM render) on static and
dynamic configs (SURVEY.md §7 minimum slice)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import (
    tiny_static,
    tiny_dynamic,
    convert_epochs_to_iters,
)
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.models.model import build_model


def _static_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    o[:, 2] -= 1.5
    d = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    return jnp.asarray(np.concatenate([o, d], -1))


def _dynamic_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    rays6 = np.asarray(_static_rays(n, seed))
    cam = rng.integers(0, 4, (n, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([rays6, cam, t], -1))


@pytest.fixture(scope="module")
def static_model():
    cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=100)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def dynamic_model():
    cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=100)
    info = {"num_keyframes": 4, "num_frames": 12, "num_views": 4}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestStaticForward:
    def test_shapes_and_finiteness(self, static_model):
        model, params = static_model
        rays = _static_rays(64)
        out = model.apply(params, rays, make_ctx(it=1000, training=False))
        assert out["rgb"].shape == (64, 3)
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))
        assert float(out["rgb"].min()) >= 0.0
        assert float(out["rgb"].max()) <= 1.0

    def test_embed_fields(self, static_model):
        model, params = static_model
        rays = _static_rays(16)
        x = model.embed(params, rays, make_ctx(it=1000, training=False))
        assert x["points"].shape == (16, 8, 3)
        assert x["distances"].shape == (16, 8, 1)
        # sorted distances must be non-decreasing
        d = np.asarray(x["distances"])[..., 0]
        assert np.all(np.diff(d, axis=-1) >= 0)
        # mipnerf-contracted points bounded by radius 2
        assert float(jnp.linalg.norm(x["points"], axis=-1).max()) <= 2.0 + 1e-3

    def test_iteration_zero_uses_ease_start(self, static_model):
        """At it=0 the sigma ease-value (start 1.0) should zero the z offsets:
        sample distances equal the anchor distances exactly."""
        model, params = static_model
        rays = _static_rays(8)
        x0 = model.embed(params, rays, make_ctx(it=0, training=False))
        x1 = model.embed(params, rays, make_ctx(it=10**6, training=False))
        d0 = np.asarray(x0["distances"])
        d1 = np.asarray(x1["distances"])
        assert not np.allclose(d0, d1)

    def test_grad_flows(self, static_model):
        model, params = static_model
        rays = _static_rays(32)
        target = jnp.ones((32, 3)) * 0.5
        ctx = make_ctx(it=500, training=True)

        def loss(p):
            out = model.apply(p, rays, ctx)
            return jnp.mean((out["rgb"] - target) ** 2)

        g = jax.grad(loss)(params)
        flat, _ = jax.tree.flatten(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
        # gradient must reach the ray MLP and the grids
        gnorm = jnp.linalg.norm(
            g["embedding"]["ray_prediction_0"]["net"]["layer_0"]["w"])
        assert float(gnorm) > 0
        assert float(jnp.linalg.norm(g["color"]["density"]["plane_0"])) > 0

    def test_jit_consistency(self, static_model):
        model, params = static_model
        rays = _static_rays(16)
        ctx = make_ctx(it=100, training=False)
        eager = model.apply(params, rays, ctx)["rgb"]
        jitted = jax.jit(
            lambda p, r, c: model.apply(p, r, c)["rgb"])(params, rays, ctx)
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                                   rtol=1e-4, atol=1e-5)

    def test_render_fields(self, static_model):
        model, params = static_model
        rays = _static_rays(8)
        out = model.apply(
            params, rays, make_ctx(it=100, training=False),
            {"fields": ["points", "distances", "render_weights"],
             "no_over_fields": ["distances"]})
        # composited fields are weight-reduced over samples (reference
        # tensorf_no_sample.py:275-278); no_over fields stay flat per-sample
        assert out["points"].shape == (8, 3)
        assert out["distances"].shape == (8, 8)
        assert out["render_weights"].shape == (8, 8)

    def test_param_groups_cover_all_leaves(self, static_model):
        model, params = static_model
        groups = model.param_groups(params)
        p_flat = jax.tree.flatten(params)[0]
        g_flat = jax.tree.flatten(groups)[0]
        assert len(p_flat) == len(g_flat)
        assert set(jax.tree.leaves(groups)) <= {
            "embedding", "embedding_impl", "color", "color_impl",
            "calibration"}


class TestDynamicForward:
    def test_shapes_and_finiteness(self, dynamic_model):
        model, params = dynamic_model
        rays = _dynamic_rays(64)
        out = model.apply(params, rays, make_ctx(it=1000, training=False))
        assert out["rgb"].shape == (64, 3)
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))

    def test_time_fields(self, dynamic_model):
        model, params = dynamic_model
        rays = _dynamic_rays(16)
        x = model.embed(params, rays, make_ctx(it=1000, training=False))
        assert "base_times" in x and "time_offset" in x
        bt = np.asarray(x["base_times"])[:, 0, 0]
        t = np.asarray(rays)[:, -1]
        # base times snap to keyframe times: base = round(clamp(t*fac)-eps)/fac
        K, F = 4, 12
        fac = K * (F - 1) / F
        expected = np.round(np.clip(t * fac, 0, K - 1) - 1e-5) / fac
        np.testing.assert_allclose(bt, expected, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(x["time_offset"])[:, 0, 0], t - expected, atol=1e-5)

    def test_flow_advection_moves_points(self, dynamic_model):
        model, params = dynamic_model
        rays = _dynamic_rays(16)
        x = model.embed(params, rays, make_ctx(it=10**6, training=False),
                        {"fields": ["raw_points"]})
        raw = np.asarray(x["raw_points"])
        # points = raw + flow*dt + offset; with nonzero time offsets the
        # two should differ for most rays
        assert not np.allclose(raw, np.asarray(x["points"]))

    def test_grad_flows_dynamic(self, dynamic_model):
        model, params = dynamic_model
        rays = _dynamic_rays(32)
        ctx = make_ctx(it=500, training=True)

        def loss(p):
            out = model.apply(p, rays, ctx)
            return jnp.mean(out["rgb"] ** 2)

        g = jax.grad(loss)(params)
        flat, _ = jax.tree.flatten(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
        assert float(jnp.linalg.norm(g["color"]["density"]["space_0"])) > 0
        assert float(jnp.linalg.norm(g["color"]["density"]["time_0"])) > 0

    def test_training_vs_eval_rng(self, dynamic_model):
        """White-background coin flip only in training; eval deterministic."""
        model, params = dynamic_model
        rays = _dynamic_rays(16)
        a = model.apply(params, rays, make_ctx(it=9, training=False))["rgb"]
        b = model.apply(params, rays, make_ctx(it=9, training=False))["rgb"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGridEvents:
    def test_upsample_static(self, static_model):
        model, params = static_model
        net = model.color_net
        old_gs = list(net.grid_size)
        new_gs = [g * 2 for g in old_gs]
        new_color = net.upsample(params["color"], new_gs)
        assert new_color["density"]["plane_0"].shape[0] == new_gs[1]
        assert new_color["density"]["line_0"].shape[0] == new_gs[2]
        # restore host state for other tests
        net.grid_size = old_gs

    def test_upsample_preserves_function(self):
        """align_corners upsample is exact at original sample sites for
        bilinear functions; check values change smoothly (interpolation)."""
        cfg = convert_epochs_to_iters(tiny_static(), 100)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(1))
        rays = _static_rays(32)
        ctx = make_ctx(it=1000, training=False)
        out0 = model.apply(params, rays, ctx)["rgb"]
        new_gs = [g * 2 - 1 for g in model.color_net.grid_size]
        params2 = dict(params)
        params2["color"] = model.color_net.upsample(params["color"], new_gs)
        out1 = model.apply(params2, rays, ctx)["rgb"]
        # doubling-minus-one keeps original grid nodes -> near-identical output
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                   rtol=1e-3, atol=1e-3)

    def test_alpha_grid_and_shrink(self):
        cfg = convert_epochs_to_iters(tiny_static(), 100)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(2))
        net = model.color_net
        binary, new_aabb = net.compute_alpha_grid(params["color"],
                                                  (16, 16, 16))
        assert binary.shape == (16, 16, 16)
        new_aabb = np.asarray(new_aabb)
        if np.all(np.isfinite(new_aabb)):
            old_gs = list(net.grid_size)
            old_aabb = np.asarray(net.aabb).copy()
            shrunk = net.shrink(params["color"], new_aabb)
            assert shrunk["density"]["plane_0"].shape[0] <= \
                params["color"]["density"]["plane_0"].shape[0]
            rays = _static_rays(8)
            out = model.apply(dict(params, color=shrunk), rays,
                              make_ctx(it=100, training=False))
            assert bool(jnp.all(jnp.isfinite(out["rgb"])))
            net.grid_size = old_gs
            net.aabb = old_aabb


class TestInferenceSamples:
    """Eval-time static sample-count reduction (reference
    nlf/embedding/point.py:402-480 inference_samples control)."""

    def test_eval_slices_and_train_unchanged(self):
        from hyperreel_tpu.configs.presets import with_inference_samples

        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=100)
        cfg8 = with_inference_samples(cfg, 4)  # 8 z-channels -> every 2nd
        info = {"num_keyframes": 4, "num_frames": 12, "num_views": 4}
        model_full = build_model(cfg, dataset_info=info)
        model_fast = build_model(cfg8, dataset_info=info)
        params = model_full.init(jax.random.PRNGKey(0))
        # select_points has no params; reuse full params with an empty slot
        params_fast = model_fast.init(jax.random.PRNGKey(0))
        emb = dict(params["embedding"])
        emb["select_points_inference"] = params_fast["embedding"][
            "select_points_inference"]
        params_fast = dict(params, embedding=emb)

        rays = _dynamic_rays(32)
        ctx_eval = make_ctx(it=1000, training=False)
        out_full = model_full.apply(params, rays, ctx_eval)
        out_fast = model_fast.apply(params_fast, rays, ctx_eval)
        assert out_fast["rgb"].shape == (32, 3)
        assert bool(jnp.all(jnp.isfinite(out_fast["rgb"])))
        # the fast render composites a subset of the same samples: close to
        # but not identical with the full render on a smooth scene
        diff = float(jnp.max(jnp.abs(out_fast["rgb"] - out_full["rgb"])))
        assert diff < 0.5

        # training path ignores inference_samples entirely
        ctx_tr = make_ctx(it=1000, training=True,
                          rng=jax.random.PRNGKey(3))
        tr_full = model_full.apply(params, rays, ctx_tr)
        tr_fast = model_fast.apply(params_fast, rays, ctx_tr)
        np.testing.assert_allclose(np.asarray(tr_full["rgb"]),
                                   np.asarray(tr_fast["rgb"]),
                                   rtol=1e-5, atol=1e-5)

    def test_sliced_fields_consistent(self):
        from hyperreel_tpu.configs.presets import with_inference_samples

        cfg = with_inference_samples(
            convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=100), 2)
        info = {"num_keyframes": 4, "num_frames": 12, "num_views": 4}
        model = build_model(cfg, dataset_info=info)
        params = model.init(jax.random.PRNGKey(0))
        rays = _dynamic_rays(16)
        emb = model.embedding.apply(params["embedding"], rays,
                                    make_ctx(it=1000, training=False))
        # 8 z-channels, inference_samples=2 -> stride 4 -> 2 samples
        assert emb["points"].shape[1] == 2
        assert emb["distances"].shape[1] == 2
        assert emb["weights"].shape[1] == 2
