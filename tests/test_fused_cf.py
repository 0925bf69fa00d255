"""Channels-first fused eval parity (models/fused_eval.py): the CF
pipeline must match BOTH the general stage-chain path and the ray-major
fused path on the flagship dynamic pattern, ray for ray."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_dynamic, convert_epochs_to_iters
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.models import fused_eval


def _scene():
    return gaussian_blob_scene(n_views=2, wh=(12, 12), dynamic=True,
                               num_frames=4, num_keyframes=2)


def _models(ds):
    cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
    cfg["color"]["net"]["fused_render"] = True
    # kernel eligibility requires bf16 gather tables (all three paths
    # then quantize the same table values, so cross-path parity is tight)
    cfg["color"]["net"]["bf16_tables"] = True
    m_cf = build_model(cfg, dataset_info=ds.info())

    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2["color"]["net"]["fused_render_cf"] = False
    m_rm = build_model(cfg2, dataset_info=ds.info())  # ray-major fused

    cfg3 = copy.deepcopy(cfg)
    cfg3["color"]["net"]["fused_render"] = False
    cfg3["color"]["net"]["fused_render_cf"] = False
    m_gen = build_model(cfg3, dataset_info=ds.info())  # general path
    return m_cf, m_rm, m_gen


class TestFusedCFParity:
    def test_cf_selected_on_flagship(self):
        ds = _scene()
        m_cf, m_rm, m_gen = _models(ds)
        assert m_cf._cf_eval is not None
        assert m_rm._cf_eval is None
        assert m_gen._cf_eval is None

    def test_eval_parity_all_three_paths(self):
        ds = _scene()
        m_cf, m_rm, m_gen = _models(ds)
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        rgb_cf = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        rgb_rm = np.asarray(m_rm.apply(params, rays, ctx)["rgb"])
        rgb_gen = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(rgb_cf - rgb_rm).max() < 2e-4, \
            np.abs(rgb_cf - rgb_rm).max()
        assert np.abs(rgb_cf - rgb_gen).max() < 2e-4, \
            np.abs(rgb_cf - rgb_gen).max()

    def test_training_path_unaffected(self):
        ds = _scene()
        m_cf, _, m_gen = _models(ds)
        params = m_cf.init(jax.random.PRNGKey(1))
        rays = jnp.asarray(ds.all_coords[:64])
        ctx = make_ctx(it=100, training=True,
                       rng=jax.random.PRNGKey(7))
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 1e-5

    def test_distances_field(self):
        ds = _scene()
        m_cf, m_rm, _ = _models(ds)
        params = m_cf.init(jax.random.PRNGKey(2))
        rays = jnp.asarray(ds.all_coords[:64])
        ctx = make_ctx(it=5000, training=False)
        rk = {"fields": ["distances"]}
        d_cf = np.asarray(
            m_cf.apply(params, rays, ctx, rk)["distances"])
        d_rm = np.asarray(
            m_rm.apply(params, rays, ctx, rk)["distances"])
        assert np.abs(d_cf - d_rm).max() < 2e-4

    def test_compaction_parity_cf_vs_general(self):
        """with_compact_samples: the CF path's first-k row slice must
        match the general path's select_points mode='first' slicing."""
        import copy
        from hyperreel_tpu.configs.presets import with_compact_samples
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        cfg = with_compact_samples(cfg, 4)
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        assert m_cf._cf_eval.compact_k == 4
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_gen = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        rgb_cf = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        rgb_gen = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(rgb_cf - rgb_gen).max() < 2e-4, \
            np.abs(rgb_cf - rgb_gen).max()

    def test_compaction_exact_when_k_covers_valid(self):
        """Rays with <= k valid samples render IDENTICALLY compacted:
        first-k keeps every valid (nearest-first) sample."""
        import copy
        from hyperreel_tpu.configs.presets import with_compact_samples
        ds = _scene()
        base = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        base["color"]["net"]["fused_render"] = False
        base["color"]["net"]["fused_render_cf"] = False
        # full model WITH the far-sorted arrangement (same pairing of
        # prediction slots to sorted positions as the compacted model)
        full_cfg = copy.deepcopy(base)
        emb = full_cfg["embedding"]["embeddings"]
        emb["ray_intersect_0"]["intersect"]["invalid_sort_far"] = True
        comp_cfg = with_compact_samples(copy.deepcopy(base), 4)
        m_full = build_model(full_cfg, dataset_info=ds.info())
        m_comp = build_model(comp_cfg, dataset_info=ds.info())
        params = m_full.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:128])
        ctx = make_ctx(it=5000, training=False)
        # count valid samples per ray on the full model
        x = m_full.embed(params, rays, ctx)
        d = np.asarray(x["distances"]).reshape(128, -1)
        pts = np.asarray(x["points"]).reshape(128, -1, 3)
        aabb = np.asarray(m_full.color_net.aabb)
        valid = (d > 0) & (d < 1e8) & \
            np.all((pts >= aabb[0]) & (pts <= aabb[1]), -1)
        covered = valid.sum(-1) <= 4
        if covered.sum() == 0:
            pytest.skip("no rays with <= k valid samples in fixture")
        rgb_full = np.asarray(m_full.apply(params, rays, ctx)["rgb"])
        rgb_comp = np.asarray(m_comp.apply(params, rays, ctx)["rgb"])
        err = np.abs(rgb_full - rgb_comp)[covered].max()
        assert err < 1e-5, err

    def test_stride_inference_samples_parity(self):
        """with_inference_samples (the reference's stride knob): the CF
        post-sort positional slice must match the general path."""
        import copy
        from hyperreel_tpu.configs.presets import with_inference_samples
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        cfg = with_inference_samples(cfg, 4)
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        assert m_cf._cf_eval.stride_k == 4
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_gen = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        rgb_cf = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        rgb_gen = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(rgb_cf - rgb_gen).max() < 2e-4, \
            np.abs(rgb_cf - rgb_gen).max()

    def test_contracted_parity_cf_vs_general(self):
        """mipnerf-contracted flagship (the *_world / neural_3d family's
        contraction): CF row contraction must match the general path."""
        import copy
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        isect = cfg["embedding"]["embeddings"]["ray_intersect_0"][
            "intersect"]
        isect["initial"] = 0.2
        isect["end"] = 6.0
        isect["contract"] = {"type": "mipnerf", "contract_samples": True,
                             "contract_start_radius": 1.0,
                             "contract_end_radius": 8.0}
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_gen = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        rgb_cf = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        rgb_gen = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(rgb_cf - rgb_gen).max() < 2e-4, \
            np.abs(rgb_cf - rgb_gen).max()

    def test_bbox_contracted_parity(self):
        """bbox-contracted flagship (technicolor_z_plane_world)."""
        import copy
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        isect = cfg["embedding"]["embeddings"]["ray_intersect_0"][
            "intersect"]
        isect["contract"] = {"type": "bbox",
                             "bbox_min": [-1.5, -1.5, -1.5],
                             "bbox_max": [1.5, 1.5, 1.5]}
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_gen = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        rgb_cf = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        rgb_gen = np.asarray(m_gen.apply(params, rays, ctx)["rgb"])
        assert np.abs(rgb_cf - rgb_gen).max() < 2e-4, \
            np.abs(rgb_cf - rgb_gen).max()

    def test_cf_sort_matches_jnp(self):
        rng = np.random.RandomState(0)
        x = rng.randn(16, 33).astype(np.float32)
        got = np.asarray(fused_eval._cf_bitonic_sort(jnp.asarray(x)))
        want = np.sort(x, axis=0)
        assert np.allclose(got, want)


class TestStaticFusedKernel:
    """Single-axis STATIC NoSample through the fused kernel: the z line
    factor as a degenerate TH=1 time table + weights pack row
    (models/tensorf.py TensorVMNoSample.apply_fused)."""

    def _cfg(self, weight_fn=None, z=8):
        from hyperreel_tpu.configs.presets import tiny_static
        cfg = convert_epochs_to_iters(tiny_static(z_channels=z),
                                      iters_per_epoch=50)
        net = cfg["color"]["net"]
        net["n_lamb_sigma"] = [4, 0, 0]
        net["n_lamb_sh"] = [4, 0, 0]
        net["bf16_tables"] = True
        net["fused_render"] = True
        if weight_fn:
            cfg["embedding"]["embeddings"]["ray_intersect_0"][
                "intersect"]["weight_fn"] = weight_fn
        return cfg

    def _parity(self, cfg):
        import copy
        ds = gaussian_blob_scene(n_views=2, wh=(12, 12))
        m_f = build_model(cfg, dataset_info=ds.info())
        assert m_f.color_net._fused_eligible
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_f.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_f.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_static_fused_parity(self):
        self._parity(self._cfg())

    def test_static_fused_parity_with_weight_fn(self):
        # ease_max weights exercise the pack weights row (the stanford
        # family's weight_fn, reference nlf/intersect/base.py:32-43)
        # ease_max tiles per-axis ray weights over z/3 sample groups
        # (reference base.py:36-42) — z must divide by 3
        self._parity(self._cfg(weight_fn={"type": "ease_max",
                                          "weight_start": 1.0,
                                          "weight_end": 0.9}, z=6))


class TestRGBShadingFused:
    """shadingMode RGB (sigmoid app features, reference
    tensorf_utils.py:341-343) through the fused kernel — 24 of the
    shipped yamls use RGB."""

    def test_static_rgb_parity(self):
        import copy
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(12, 12))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        net = cfg["color"]["net"]
        net.update({"n_lamb_sigma": [4, 0, 0], "n_lamb_sh": [4, 0, 0],
                    "bf16_tables": True, "fused_render": True,
                    "shadingMode": "RGB", "data_dim_color": 3})
        m_f = build_model(cfg, dataset_info=ds.info())
        assert m_f.color_net._fused_eligible
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_f.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_f.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_dynamic_rgb_parity_cf(self):
        import copy
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        net = cfg["color"]["net"]
        net.update({"bf16_tables": True, "fused_render": True,
                    "shadingMode": "RGB", "data_dim_color": 3})
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()


class TestMultiAxisStaticFused:
    """FULL VM decomposition (2-3 active axes) through the multi-axis
    fused kernel (fused_shade_composite_multi) — the llff/donerf/shiny
    [8, 4, 4] family."""

    def _parity(self, n_lamb, shading="SH", ddc=27):
        import copy
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(12, 12))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        net = cfg["color"]["net"]
        net.update({"n_lamb_sigma": list(n_lamb),
                    "n_lamb_sh": list(n_lamb),
                    "bf16_tables": True, "fused_render": True,
                    "shadingMode": shading, "data_dim_color": ddc})
        m_f = build_model(cfg, dataset_info=ds.info())
        assert m_f.color_net._fused_eligible
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_f.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_f.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_three_axis_sh(self):
        self._parity([4, 2, 2])

    def test_three_axis_rgb(self):
        self._parity([4, 2, 2], shading="RGB", ddc=3)

    def test_two_axis(self):
        self._parity([4, 2, 0])


class TestStaticCFChain:
    """Channels-first pipeline on the STATIC (no-flow) llff-style chain
    feeding the multi-axis static kernel."""

    def _models(self, n_lamb):
        import copy
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(12, 12))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        net = cfg["color"]["net"]
        net.update({"n_lamb_sigma": list(n_lamb),
                    "n_lamb_sh": list(n_lamb),
                    "bf16_tables": True, "fused_render": True})
        m_cf = build_model(cfg, dataset_info=ds.info())
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        return ds, m_cf, m_g

    def test_static_cf_selected_and_parity(self):
        ds, m_cf, m_g = self._models([4, 2, 2])
        assert m_cf._cf_eval is not None
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_static_cf_single_axis(self):
        ds, m_cf, m_g = self._models([4, 0, 0])
        assert m_cf._cf_eval is not None
        params = m_cf.init(jax.random.PRNGKey(1))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()


class TestPackBuildKernel:
    """The pack-build Pallas kernel (ops/pallas/pack_build.py): the
    whole CF embedding tail in one kernel, triggered when tile == 128
    (B % 128 == 0) and every activation lowers in Mosaic. Parity vs the
    general path AND vs the legacy CF-XLA tail, with a spy asserting
    the kernel branch actually runs (B=192 tests never reach it)."""

    def _spy(self, monkeypatch):
        import hyperreel_tpu.ops.pallas.pack_build as PB
        calls = []
        orig = PB.pack_build

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(PB, "pack_build", spy)
        return calls

    def _parity(self, cfg, ds, monkeypatch, expect_kernel=True):
        import copy
        calls = self._spy(monkeypatch)
        m_cf = build_model(cfg, dataset_info=ds.info())
        assert m_cf._cf_eval is not None
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:256])     # 256 % 128 == 0
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()
        assert bool(calls) == expect_kernel, (len(calls), expect_kernel)

    def _dyn_cfg(self):
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        return cfg

    def test_dynamic_flagship_kernel_parity(self, monkeypatch):
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        self._parity(self._dyn_cfg(), ds, monkeypatch)

    def _bf16_input_run(self, monkeypatch):
        """Shared driver: compute_dtype=bf16 model through the pack
        kernel with a dtype spy; returns (dtypes_seen, max|cf - gen|).
        Forces the XLA MLP/kernel BOUNDARY mode (PK_MLP=0) — these
        tests pin the boundary dtype contract, which only exists when
        the MLP is not fused into the kernel."""
        import copy
        import hyperreel_tpu.ops.pallas.pack_build as PB
        monkeypatch.setenv("HYPERREEL_PK_MLP", "0")
        dtypes = []
        orig = PB.pack_build

        def spy(out_cf_fm, *a, **k):
            dtypes.append(out_cf_fm.dtype)
            return orig(out_cf_fm, *a, **k)

        monkeypatch.setattr(PB, "pack_build", spy)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        # S=16 so P*S % 16 == 0 (the bf16 block gate; S=8 configs fall
        # back to f32 input, flagship S=32 always qualifies)
        cfg = convert_epochs_to_iters(tiny_dynamic(z_channels=16),
                                      iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        m_cf = build_model(cfg, dataset_info=ds.info(),
                           compute_dtype=jnp.bfloat16)
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:256])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        return dtypes, float(np.abs(a - b).max())

    def test_dynamic_pack_input_f32_by_default(self, monkeypatch):
        """The pack kernel's MLP-output input is STORED f32 by default
        even at compute_dtype=bf16: XLA fuses dot(bf16,bf16) +
        convert(f32) into an f32-ACCUMULATED output, so f32 storage
        carries accumulator precision that bf16 storage rounds away
        (HW: |patch-gen| 3.2e-4 > the 2e-4 exact-class gate with bf16
        input on — PERFORMANCE.md round 4b). Parity stays exact-class."""
        monkeypatch.delenv("HYPERREEL_BF16_PACK_INPUT", raising=False)
        dtypes, err = self._bf16_input_run(monkeypatch)
        assert err < 2e-4, err
        assert dtypes and all(d == jnp.float32 for d in dtypes), dtypes

    def test_dynamic_pack_input_bf16_opt_in(self, monkeypatch):
        """HYPERREEL_BF16_PACK_INPUT=1 opts into bf16 row storage at the
        MLP/kernel boundary (pure-bandwidth knob; known to cost ~1e-4 of
        accumulator precision on HW — not exact-class)."""
        monkeypatch.setenv("HYPERREEL_BF16_PACK_INPUT", "1")
        dtypes, err = self._bf16_input_run(monkeypatch)
        assert err < 1e-3, err
        assert dtypes and all(d == jnp.bfloat16 for d in dtypes), dtypes

    def test_pk_mlp_in_kernel_default_and_parity(self, monkeypatch):
        """HYPERREEL_PK_MLP default: the prediction MLP runs INSIDE the
        pack kernel (pack_build mlp=..., out_cf_fm=None) and matches
        the general path at the exact-class gate. The A/B against the
        XLA-boundary MLP (PK_MLP=0) must agree to bf16-rounding order
        (the in-kernel chain differs only in excess-precision rounding
        placement)."""
        import copy
        import hyperreel_tpu.ops.pallas.pack_build as PB
        seen = []
        orig = PB.pack_build

        def spy(out_cf_fm, *a, **k):
            seen.append((out_cf_fm is None, k.get("mlp") is not None))
            return orig(out_cf_fm, *a, **k)

        monkeypatch.setattr(PB, "pack_build", spy)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = convert_epochs_to_iters(tiny_dynamic(z_channels=16),
                                      iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        m_cf = build_model(cfg, dataset_info=ds.info(),
                           compute_dtype=jnp.bfloat16)
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        params = m_cf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:256])
        ctx = make_ctx(it=5000, training=False)
        monkeypatch.delenv("HYPERREEL_PK_MLP", raising=False)
        a = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        assert seen and seen[-1] == (True, True), seen
        g = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - g).max() < 2e-4, np.abs(a - g).max()
        monkeypatch.setenv("HYPERREEL_PK_MLP", "0")
        b = np.asarray(m_cf.apply(params, rays, ctx)["rgb"])
        assert seen[-1] == (False, False), seen
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_dynamic_compact_kernel_parity(self, monkeypatch):
        from hyperreel_tpu.configs.presets import with_compact_samples
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = with_compact_samples(self._dyn_cfg(), 4)
        self._parity(cfg, ds, monkeypatch)

    def test_static_multi_axis_kernel_parity(self, monkeypatch):
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
             "bf16_tables": True, "fused_render": True})
        # the kernel requires identity contraction (tiny_static defaults
        # to mipnerf, which keeps the legacy CF-XLA tail)
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "identity"}
        self._parity(cfg, ds, monkeypatch)

    def test_contracted_kernel_parity(self, monkeypatch):
        # scene contraction runs IN-kernel via Contract.contract_rows
        # (tiny_static defaults to mipnerf contraction)
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
             "bf16_tables": True, "fused_render": True})
        self._parity(cfg, ds, monkeypatch, expect_kernel=True)

    def test_contracted_bbox_kernel_parity(self, monkeypatch):
        # bbox contraction (contract_samples path) also runs in-kernel
        from hyperreel_tpu.configs.presets import tiny_static
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
             "bf16_tables": True, "fused_render": True})
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "bbox", "contract_samples": True,
                           "bbox_min": [-1.5, -1.5, -1.5],
                           "bbox_max": [1.5, 1.5, 1.5]}
        self._parity(cfg, ds, monkeypatch, expect_kernel=True)

    def test_stride2_routes_to_legacy_cf_tail(self, monkeypatch):
        # stride 2 (k = S/2) is HW-measured SLOWER in-kernel than the
        # legacy CF tail (7.98 vs 11.21 Mrays/s at k=16 —
        # experiments/verify_stride_kernel_hw.py), so the routing sends
        # it to the legacy tail; parity must still hold there
        from hyperreel_tpu.configs.presets import with_inference_samples
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = with_inference_samples(self._dyn_cfg(), 4)
        self._parity(cfg, ds, monkeypatch, expect_kernel=False)

    def test_stride4_kernel_parity(self, monkeypatch):
        # stride 4+ rides the kernel via a sublane->lane merge +
        # contiguous lane slice (exp_pallas_probe8.py; HW-measured
        # faster: 22.57 vs 15.79 Mrays/s at k=8)
        from hyperreel_tpu.configs.presets import with_inference_samples
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = with_inference_samples(self._dyn_cfg(), 2)
        self._parity(cfg, ds, monkeypatch, expect_kernel=True)

    def test_stride_plus_compact_falls_to_general_path(self):
        # the degenerate stride+compact combo is ineligible for CF eval
        # altogether (general path serves it)
        from hyperreel_tpu.configs.presets import (
            with_inference_samples, with_compact_samples)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = with_compact_samples(
            with_inference_samples(self._dyn_cfg(), 4), 4)
        m = build_model(cfg, dataset_info=ds.info())
        assert m._cf_eval is None


class TestCoherentGather:
    """Coherent patch-gather (ops/patch_gather.py + pallas/patch_blend):
    one (px x py)-texel row per 4-consecutive-ray block replaces 4 quad
    row gathers. Exact parity vs the general path holds when the rays
    are scanline-coherent at high pixel density (block footprints fit
    the patch) — these tests build such rays directly."""

    @staticmethod
    def _scanline_rays(n=256, side=4096):
        # 2 scanline segments of n/2 consecutive pixels from a high-
        # density pinhole frame: per-pixel texel deltas << 1, so 4-ray
        # block footprints always fit a 4x3 patch
        fov_px = side * 1.2
        seg = n // 2
        rows = []
        for r in (-40.0, 32.0):
            u = (np.arange(seg, dtype=np.float32) - seg / 2) / fov_px
            v = np.full(seg, r / fov_px, np.float32)
            rows.append(np.stack([u, v, np.ones_like(u)], -1))
        d = np.concatenate(rows, 0)
        o = np.zeros_like(d)
        o[:, 2] = -1.5
        cam = np.full((n, 1), 0.0, np.float32)
        t = np.full((n, 1), 0.3, np.float32)
        return jnp.asarray(np.concatenate([o, d, cam, t], -1))

    def _patch_parity(self, cfg, monkeypatch, force_legacy_tail=False):
        import copy
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        calls = []
        orig = PBL.patch_anchor_idx

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)
        # anchors are built on BOTH patch routes (separate blend kernel
        # and the blend+shade fusion), so this spy proves the patch
        # path engaged without pinning which route ran
        monkeypatch.setattr(PBL, "patch_anchor_idx", spy)

        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg_p = with_coherent_gather(cfg, 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        assert m_p._cf_eval is not None
        assert m_p._cf_eval.patch_cfg == (4, 3)
        if force_legacy_tail:
            m_p._cf_eval._pack_ok = False
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()
        assert calls, "patch path never engaged"

    def _dyn_cfg(self):
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        return cfg

    def test_patch_parity_pack_kernel_path(self, monkeypatch):
        self._patch_parity(self._dyn_cfg(), monkeypatch)

    def test_patch_parity_legacy_cf_tail(self, monkeypatch):
        self._patch_parity(self._dyn_cfg(), monkeypatch,
                           force_legacy_tail=True)

    def test_patch_with_compact(self, monkeypatch):
        from hyperreel_tpu.configs.presets import with_compact_samples
        self._patch_parity(with_compact_samples(self._dyn_cfg(), 4),
                           monkeypatch)

    def test_patch_phase_major_rays_contract(self):
        # rays_phase_major: the caller pre-permutes rays to the
        # phase-major order (original ray 4j+p at position p*B/4 + j)
        # and receives outputs in that order — both in-graph
        # permutation copies drop out; values must match the in-graph
        # permute path exactly on the SAME blocks
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg_p = with_coherent_gather(self._dyn_cfg(), 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        B = rays.shape[0]
        perm = np.arange(B).reshape(B // 4, 4).T.reshape(B)
        b_pm = np.asarray(m_p.apply(
            params, rays[perm], ctx, {"rays_phase_major": True})["rgb"])
        # un-permute host-side: output row p*B/4 + j is original 4j + p
        b = np.empty_like(b_pm)
        b[perm] = b_pm
        assert np.abs(a - b).max() < 1e-6, np.abs(a - b).max()

    def test_patch_with_stride(self, monkeypatch):
        from hyperreel_tpu.configs.presets import with_inference_samples
        self._patch_parity(with_inference_samples(self._dyn_cfg(), 4),
                           monkeypatch)

    def test_fused_patch_vs_blend_kernel(self, monkeypatch):
        """Blend+shade fusion (shade.py _shade_kernel_fused_patch) vs
        the separate patch-blend kernel route: same math except the
        fused route keeps the blended features in f32 registers (the
        blend kernel rounds its HBM output to bf16), so the routes
        agree within the feats-rounding envelope and BOTH hold the
        2e-4 gate vs the general path (covered by _patch_parity)."""
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        from hyperreel_tpu.configs.presets import with_coherent_gather
        blend_calls = []
        orig = PBL.patch_blend

        def spy(*a, **k):
            blend_calls.append(1)
            return orig(*a, **k)
        monkeypatch.setattr(PBL, "patch_blend", spy)

        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg_p = with_coherent_gather(self._dyn_cfg(), 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH", "1")
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        assert not blend_calls, "fusion on: blend kernel must not run"
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH", "0")
        b = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        assert blend_calls, "fusion off: blend kernel must run"
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_patch_multi_axis_static(self, monkeypatch):
        # the [8, 4, 4] static family: 3 patch gathers/sample replace
        # 3 quad gathers/sample (the worst gather floor in the repo)
        import copy
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        calls = []
        orig = PBL.patch_anchor_idx

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)
        # anchors are built once per AXIS on both patch routes (blend
        # kernel and blend+shade fusion)
        monkeypatch.setattr(PBL, "patch_anchor_idx", spy)

        from hyperreel_tpu.configs.presets import (
            tiny_static, with_coherent_gather)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [8, 4, 4], "n_lamb_sh": [8, 4, 4],
             "bf16_tables": True, "fused_render": True})
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "identity"}
        cfg_p = with_coherent_gather(cfg, 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        assert m_p._cf_eval is not None
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()[:, :6]   # static: no cam/t cols
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()
        assert len(calls) == 3, len(calls)    # anchors per axis

    def test_patch_multi_axis_dynamic(self, monkeypatch):
        # the [8, 4, 4] dynamic keyframe family (immersive/neural_3d)
        import copy
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        calls = []
        orig = PBL.patch_anchor_idx

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)
        monkeypatch.setattr(PBL, "patch_anchor_idx", spy)

        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = self._dyn_cfg()
        cfg["color"]["net"]["n_lamb_sigma"] = [8, 4, 4]
        cfg["color"]["net"]["n_lamb_sh"] = [8, 4, 4]
        cfg_p = with_coherent_gather(cfg, 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        assert m_p._cf_eval is not None
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()
        assert len(calls) == 3, len(calls)

    def test_patch_multi_axis_structural_gate(self, monkeypatch):
        """STRUCTURAL GATE: the multi-axis fused-patch DEFAULT is the
        two-kernel route (patch_blend + preblended "phase_major"); the
        fused variant is opt-in (HYPERREEL_FUSED_PATCH_MULTI=1) and
        must agree at exact-class. ROOT CAUSE of the round-4/5 HW
        parity failures (llff 9.4e-2, wrongly blamed on Mosaic): the
        fused call used a variant-local tile while the pack's S-major
        lane order was baked at the CHUNK tile — the kernel decodes
        lanes via tile_r = blk // S, so mismatched widths composite
        the wrong lanes (CPU repro: forced mismatch = parity 0.27).
        The fused call now always shares the chunk tile, whose choice
        folds in the fused VMEM demand (fused_eval fp_lane)."""
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        blend_calls = []
        orig = PBL.patch_blend

        def spy(*a, **k):
            blend_calls.append(1)
            return orig(*a, **k)
        monkeypatch.setattr(PBL, "patch_blend", spy)

        from hyperreel_tpu.configs.presets import (
            tiny_static, with_coherent_gather)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [8, 4, 4], "n_lamb_sh": [8, 4, 4],
             "bf16_tables": True, "fused_render": True})
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "identity"}
        cfg_p = with_coherent_gather(cfg, 4, 3)
        m_p = build_model(cfg_p, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()[:, :6]
        ctx = make_ctx(it=5000, training=False)
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH", "1")
        monkeypatch.delenv("HYPERREEL_FUSED_PATCH_MULTI", raising=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        assert len(blend_calls) == 3, \
            "multi-axis default must take the two-kernel route"
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH_MULTI", "1")
        blend_calls.clear()
        b = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        assert not blend_calls, \
            "MULTI=1 opt-in must bypass the blend kernel"
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_patch_coverage_witness(self, monkeypatch):
        """EXACTNESS CONTRACT (round-5, VERDICT item 7): the patch
        route returns an in-graph coverage witness
        (outputs["patch_coverage_viol"]). Scanline rays at high pixel
        density must witness ZERO violations; low-density scattered
        rays (block footprints spanning many texels) must witness a
        POSITIVE fraction — bench reads this scalar and falls back to
        the quad path rather than timing an under-covered shape as
        exact (HW: (2,2) is 2.9e-3-inexact at bench density,
        verify_pm3.log)."""
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(with_coherent_gather(self._dyn_cfg(), 4, 3),
                        dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        ctx = make_ctx(it=5000, training=False)
        out = m.apply(params, self._scanline_rays(), ctx)
        assert "patch_coverage_viol" in out
        assert float(out["patch_coverage_viol"]) == 0.0

        # scattered rays: wide 4-ray block footprints -> violations
        rng = np.random.default_rng(3)
        n = 256
        d = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        d[:, 2] = 1.0
        o = np.zeros_like(d)
        o[:, 2] = -1.5
        cam = np.zeros((n, 1), np.float32)
        t = np.full((n, 1), 0.3, np.float32)
        scattered = jnp.asarray(np.concatenate([o, d, cam, t], -1))
        out2 = m.apply(params, scattered, ctx)
        assert float(out2["patch_coverage_viol"]) > 0.0

    def test_uniform_time_premix_parity_dyn1(self):
        """UNIFORM-TIME PREMIX (round-5): on a frame render (every ray
        shares one t) the keyframe time mix hoists out of the shade
        kernel — the [(TH+2)*C, Rt] time table premixes to [C, Rt]
        in-graph and the kernel runs TH=0, cutting its dominant
        z-two-hot matmul's FLOPs by (TH+2)x. Bilinear time mixing is
        linear in the table rows and the z two-hot is linear, so they
        commute; premix corner math is bit-identical to
        _corner_weights. Must match the per-sample mix at exact-class
        and witness uniform_time_viol == 0."""
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(self._dyn_cfg(), dataset_info=ds.info())
        assert m._cf_eval is not None
        params = m.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = m.apply(params, rays, ctx, {"uniform_time": True})
        b = np.asarray(m.apply(params, rays, ctx)["rgb"])
        assert float(a["uniform_time_viol"]) == 0.0
        d = np.abs(np.asarray(a["rgb"]) - b).max()
        assert d < 2e-4, d

    def test_uniform_time_premix_parity_multi_axis(self):
        """Premix parity on the [8, 4, 4] dynamic keyframe family
        (immersive/neural_3d class): per-axis time planes premix to
        pure 1D line tables, time_hs -> 0."""
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = self._dyn_cfg()
        cfg["color"]["net"]["n_lamb_sigma"] = [4, 2, 2]
        cfg["color"]["net"]["n_lamb_sh"] = [4, 2, 2]
        m = build_model(cfg, dataset_info=ds.info())
        assert m._cf_eval is not None
        params = m.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = m.apply(params, rays, ctx, {"uniform_time": True})
        b = np.asarray(m.apply(params, rays, ctx)["rgb"])
        assert float(a["uniform_time_viol"]) == 0.0
        d = np.abs(np.asarray(a["rgb"]) - b).max()
        assert d < 2e-4, d

    def test_patch_block8_parity(self):
        """R=8 coherent blocks (round-5): ONE patch row serves 8
        consecutive rays on the dyn1 fused blend+shade route — halves
        the per-row gather floor again (flat in row bytes,
        gather_align.log). The (5,2) patch budgets the wider 8-pixel
        footprint. Parity vs the general path AND the R=4 (3,2) route
        at exact-class; witness 0 on scanline rays, > 0 on scattered;
        composes with the uniform-time premix (the bench candidate)."""
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        base = self._dyn_cfg()
        m_g = build_model(
            {**base, "color": {**base["color"], "net": {
                **base["color"]["net"], "fused_render": False,
                "fused_render_cf": False}}}, dataset_info=ds.info())
        m4 = build_model(with_coherent_gather(base, 3, 2),
                         dataset_info=ds.info())
        m8 = build_model(with_coherent_gather(base, 5, 2, block=8),
                         dataset_info=ds.info())
        assert m8._cf_eval is not None
        assert m8._cf_eval.patch_block == 8
        params = m8.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        ref = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        o4 = m4.apply(params, rays, ctx)
        o8 = m8.apply(params, rays, ctx)
        assert float(o8["patch_coverage_viol"]) == 0.0
        d_g = np.abs(np.asarray(o8["rgb"]) - ref).max()
        d_44 = np.abs(np.asarray(o8["rgb"])
                      - np.asarray(o4["rgb"])).max()
        assert d_g < 2e-4, d_g
        assert d_44 < 2e-4, d_44

        # premix composition (the bench-candidate configuration)
        o8u = m8.apply(params, rays, ctx, {"uniform_time": True})
        assert float(o8u["uniform_time_viol"]) == 0.0
        d_u = np.abs(np.asarray(o8u["rgb"]) - ref).max()
        assert d_u < 2e-4, d_u

        # phase-major contract at R=8: pre-permuted rays, host
        # un-permute must match bit-exactly
        n = rays.shape[0]
        perm = np.arange(n).reshape(n // 8, 8).T.reshape(n)
        pm = np.asarray(rays)[perm]
        got_pm = np.asarray(m8.apply(
            params, jnp.asarray(pm), ctx,
            {"rays_phase_major": True})["rgb"])
        un = np.empty_like(got_pm)
        un[perm] = got_pm
        assert np.abs(un - np.asarray(o8["rgb"])).max() < 1e-6

        # scattered rays must witness violations
        rng = np.random.default_rng(3)
        sc = np.array(self._scanline_rays())
        sc[:, 3:5] = rng.uniform(-0.4, 0.4, (n, 2)).astype(np.float32)
        o_sc = m8.apply(params, jnp.asarray(sc), ctx)
        assert float(o_sc["patch_coverage_viol"]) > 0.0

    def test_patch_block8_two_kernel_route(self, monkeypatch):
        """R=8 on the TWO-KERNEL route (HYPERREEL_FUSED_PATCH=0):
        patch_blend emits [8C, J] and the shade kernel reads 8
        phase row-blocks — this route keeps the chunk tile (and the
        pack-build kernel) because the blend's block width is
        decoupled from the pack lane order."""
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        base = self._dyn_cfg()
        m8 = build_model(with_coherent_gather(base, 5, 2, block=8),
                         dataset_info=ds.info())
        params = m8.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m8.apply(params, rays, ctx)["rgb"])  # fused
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH", "0")
        b = np.asarray(m8.apply(params, rays, ctx)["rgb"])  # 2-kernel
        d = np.abs(a - b).max()
        assert d < 2e-4, d

    def test_patch_block8_multi_axis(self, monkeypatch):
        """R=8 coherent blocks on the MULTI-AXIS families (round 5):
        the [8, 4, 4] llff/n3d class gathers one patch row per axis
        per 8-ray block — halving the worst gather floor in the repo
        (3 axes x per-row cost). Parity vs the general path and the
        R=4 route on BOTH multi routes (two-kernel default and the
        opt-in fused variant) at exact-class; dynamic keyframe family
        + premix composition included."""
        import copy
        from hyperreel_tpu.configs.presets import (
            tiny_static, with_coherent_gather)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [8, 4, 4], "n_lamb_sh": [8, 4, 4],
             "bf16_tables": True, "fused_render": True})
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "identity"}
        m8 = build_model(with_coherent_gather(cfg, 5, 3, block=8),
                         dataset_info=ds.info())
        assert m8._cf_eval is not None
        assert m8._cf_eval.patch_block == 8
        m4 = build_model(with_coherent_gather(cfg, 4, 3),
                         dataset_info=ds.info())
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m8.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()[:, :6]
        ctx = make_ctx(it=5000, training=False)
        ref = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        o4 = np.asarray(m4.apply(params, rays, ctx)["rgb"])
        monkeypatch.delenv("HYPERREEL_FUSED_PATCH_MULTI", raising=False)
        o8 = m8.apply(params, rays, ctx)        # two-kernel default
        assert float(o8["patch_coverage_viol"]) == 0.0
        a = np.asarray(o8["rgb"])
        assert np.abs(a - ref).max() < 2e-4, np.abs(a - ref).max()
        assert np.abs(a - o4).max() < 2e-4, np.abs(a - o4).max()
        monkeypatch.setenv("HYPERREEL_FUSED_PATCH_MULTI", "1")
        b = np.asarray(m8.apply(params, rays, ctx)["rgb"])  # fused
        assert np.abs(b - ref).max() < 2e-4, np.abs(b - ref).max()

    def test_patch_block8_multi_axis_dynamic_premix(self):
        """R=8 on the dynamic keyframe multi family composed with the
        uniform-time premix (the n3d bench-candidate configuration)."""
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = self._dyn_cfg()
        cfg["color"]["net"]["n_lamb_sigma"] = [8, 4, 4]
        cfg["color"]["net"]["n_lamb_sh"] = [8, 4, 4]
        m8 = build_model(with_coherent_gather(cfg, 5, 3, block=8),
                         dataset_info=ds.info())
        assert m8._cf_eval is not None
        import copy
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m8.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        ref = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        o8 = m8.apply(params, rays, ctx)
        assert float(o8["patch_coverage_viol"]) == 0.0
        d = np.abs(np.asarray(o8["rgb"]) - ref).max()
        assert d < 2e-4, d
        o8u = m8.apply(params, rays, ctx, {"uniform_time": True})
        assert float(o8u["uniform_time_viol"]) == 0.0
        d_u = np.abs(np.asarray(o8u["rgb"]) - ref).max()
        assert d_u < 2e-4, d_u

    def test_patch_sublane_gate(self, monkeypatch):
        """STRUCTURAL SUBLANE GATE (HW-found, verify_r8_multi2.log):
        the phase_major rows BlockSpec is (C_a, blk) and Pallas TPU
        requires the sublane block dim divisible by 8. Channel counts
        like [4,2,2] (C_a = 8, 4, 4) crash the REMOTE compile while
        passing CPU interpret — so the patch route must structurally
        fall back to the exact quad path for them, never ship a
        non-lowering default."""
        import copy
        import hyperreel_tpu.ops.pallas.patch_blend as PBL
        calls = []
        orig = PBL.patch_anchor_idx

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)
        monkeypatch.setattr(PBL, "patch_anchor_idx", spy)

        from hyperreel_tpu.configs.presets import (
            tiny_static, with_coherent_gather)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
             "bf16_tables": True, "fused_render": True})
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"][
            "contract"] = {"type": "identity"}
        m_p = build_model(with_coherent_gather(cfg, 4, 3),
                          dataset_info=ds.info())
        cfg_g = copy.deepcopy(cfg)
        cfg_g["color"]["net"]["fused_render"] = False
        cfg_g["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg_g, dataset_info=ds.info())
        params = m_p.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()[:, :6]
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        assert not calls, "sub-8 C_a must fall back to the quad path"
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()

    def test_uniform_time_premix_parity_patch(self):
        """Premix composed with the coherent patch route — the BENCH
        configuration (patch (3,2) + fused blend+shade + premix). The
        premixed table changes the fused kernel's time-table BlockSpec
        to [C, TWp] (shade.py), so this pins the full composition to
        the un-premixed patch route AND the general path."""
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        cfg = with_coherent_gather(self._dyn_cfg(), 3, 2)
        m = build_model(cfg, dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = m.apply(params, rays, ctx, {"uniform_time": True})
        b = np.asarray(m.apply(params, rays, ctx)["rgb"])
        assert float(a["uniform_time_viol"]) == 0.0
        d = np.abs(np.asarray(a["rgb"]) - b).max()
        assert d < 2e-4, d

    def test_uniform_time_witness_nonzero_on_mixed_t(self):
        """Rays that disagree on t must witness uniform_time_viol > 0
        (bench reads this and disables the premix rather than render
        frames mixed at the wrong time)."""
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(self._dyn_cfg(), dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        rays = np.array(self._scanline_rays())
        rays[rays.shape[0] // 2:, 7] = 0.7    # second half: t=0.7
        ctx = make_ctx(it=5000, training=False)
        out = m.apply(params, jnp.asarray(rays), ctx,
                      {"uniform_time": True})
        assert float(out["uniform_time_viol"]) > 0.0

    def test_prepared_includes_patch_table(self):
        from hyperreel_tpu.configs.presets import with_coherent_gather
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(with_coherent_gather(self._dyn_cfg(), 4, 3),
                        dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        prepared = m.prepare_eval(params)
        assert len(prepared) == 4
        rays = self._scanline_rays()
        ctx = make_ctx(it=5000, training=False)
        a = m.apply(params, rays, ctx,
                    render_kwargs={"cf_prepared": prepared})["rgb"]
        b = m.apply(params, rays, ctx)["rgb"]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6


class TestPreparedEval:
    """prepare_eval: per-checkpoint prebuilt table arrays shipped into
    apply via render_kwargs["cf_prepared"] (the serving/viewer path)
    must match the default in-trace table build exactly."""

    def test_prepared_matches_in_trace_dynamic(self):
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(cfg, dataset_info=ds.info())
        assert m._cf_eval is not None
        params = m.init(jax.random.PRNGKey(0))
        prep = m.prepare_eval(params)
        assert prep is not None
        rays = jnp.asarray(ds.all_coords[:256])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m.apply(
            params, rays, ctx,
            render_kwargs={"cf_prepared": prep})["rgb"])
        assert np.abs(a - b).max() < 1e-6, np.abs(a - b).max()

    def test_prepared_matches_in_trace_static_multi(self):
        from hyperreel_tpu.configs.presets import tiny_static
        cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
        cfg["color"]["net"].update(
            {"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
             "bf16_tables": True, "fused_render": True})
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
        m = build_model(cfg, dataset_info=ds.info())
        assert m._cf_eval is not None
        params = m.init(jax.random.PRNGKey(0))
        prep = m.prepare_eval(params)
        rays = jnp.asarray(ds.all_coords[:256])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m.apply(
            params, rays, ctx,
            render_kwargs={"cf_prepared": prep})["rgb"])
        assert np.abs(a - b).max() < 1e-6, np.abs(a - b).max()


class TestDynamicMultiAxisFused:
    """Multi-axis DYNAMIC fused render (the immersive/neural_3d
    [8, 4, 4] keyframe family): per-axis space planes x time planes
    through fused_shade_composite_multi time_hs."""

    def test_dynamic_multi_parity(self):
        import copy
        ds = _scene()
        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        net = cfg["color"]["net"]
        net.update({"n_lamb_sigma": [4, 2, 2], "n_lamb_sh": [4, 2, 2],
                    "bf16_tables": True, "fused_render": True})
        m_f = build_model(cfg, dataset_info=ds.info())
        assert m_f.color_net._fused_eligible
        # multi-axis dynamic goes through the ray-major fused path (the
        # CF chain currently routes single-axis dynamic only)
        cfg2 = copy.deepcopy(cfg)
        cfg2["color"]["net"]["fused_render"] = False
        cfg2["color"]["net"]["fused_render_cf"] = False
        m_g = build_model(cfg2, dataset_info=ds.info())
        params = m_f.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(ds.all_coords[:192])
        ctx = make_ctx(it=5000, training=False)
        a = np.asarray(m_f.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 2e-4, np.abs(a - b).max()
