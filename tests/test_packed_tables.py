"""Packed bf16-word gather path vs f32 reference path: numerical agreement
within bf16 quantization tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import (
    tiny_static, tiny_dynamic, convert_epochs_to_iters)
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.ops.grid_sample import (
    grid_sample_2d_cf, grid_sample_2d_cf_packed, grid_sample_2d_cf_quad,
    grid_sample_1d_cf, grid_sample_1d_cf_packed, grid_sample_1d_cf_quad)


def test_quad_2d_matches_unpacked():
    rng = np.random.default_rng(3)
    plane = jnp.asarray(rng.standard_normal((11, 19, 8)).astype(np.float32),
                        jnp.bfloat16)
    # include the 1-texel outside band and far out-of-range coords
    coords = jnp.asarray(rng.uniform(-1.6, 1.6, (513, 2)).astype(np.float32))
    ref = grid_sample_2d_cf(plane, coords)
    got = grid_sample_2d_cf_quad(plane, coords)
    got_flat = jnp.moveaxis(got, 2, 1).reshape(8, -1)
    np.testing.assert_allclose(np.asarray(got_flat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quad_1d_matches_unpacked():
    rng = np.random.default_rng(4)
    line = jnp.asarray(rng.standard_normal((7, 4)).astype(np.float32),
                       jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(-1.8, 1.8, (301,)).astype(np.float32))
    ref = grid_sample_1d_cf(line, coords)
    got = grid_sample_1d_cf_quad(line, coords)
    got_flat = jnp.moveaxis(got, 2, 1).reshape(4, -1)
    np.testing.assert_allclose(np.asarray(got_flat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_2d_matches_unpacked():
    rng = np.random.default_rng(0)
    plane = rng.standard_normal((17, 13, 8)).astype(np.float32)
    plane_bf16 = jnp.asarray(plane, jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (257, 2)).astype(np.float32))
    ref = grid_sample_2d_cf(plane_bf16, coords)            # [8, N] (f32 out)
    got = grid_sample_2d_cf_packed(plane_bf16, coords)     # [4, N, 2]
    got_flat = jnp.moveaxis(got, 2, 1).reshape(8, -1)
    np.testing.assert_allclose(np.asarray(got_flat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_1d_matches_unpacked():
    rng = np.random.default_rng(1)
    line = jnp.asarray(rng.standard_normal((9, 6)).astype(np.float32),
                       jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (100,)).astype(np.float32))
    ref = grid_sample_1d_cf(line, coords)
    got = grid_sample_1d_cf_packed(line, coords)
    got_flat = jnp.moveaxis(got, 2, 1).reshape(6, -1)
    np.testing.assert_allclose(np.asarray(got_flat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quad_2d_backward_matches_reference_vjp():
    """The packed-scatter backward must equal the autodiff of the unpacked
    sampler (up to bf16 forward quantization of the corner values)."""
    from hyperreel_tpu.ops.grid_sample import _quad2d_ref
    rng = np.random.default_rng(5)
    H, W, C, N = 9, 13, 8, 257
    plane = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32),
                        jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (N, 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((C // 2, N, 2)).astype(np.float32))

    def f(p, c):
        return grid_sample_2d_cf_quad(p, c)

    _, vjp = jax.vjp(f, plane, coords)
    got_gp, got_gc = vjp(g)

    _, ref_vjp = jax.vjp(lambda p, c: _quad2d_ref(p, c),
                         plane.astype(jnp.float32), coords)
    ref_gp, ref_gc = ref_vjp(g)

    np.testing.assert_allclose(np.asarray(got_gp, np.float32),
                               np.asarray(ref_gp),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_gc), np.asarray(ref_gc),
                               rtol=2e-2, atol=2e-3)


def _rays_static(n=32, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    o[:, 2] -= 1.5
    d = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    return jnp.asarray(np.concatenate([o, d], -1))


@pytest.mark.parametrize("preset,dynamic", [(tiny_static, False),
                                            (tiny_dynamic, True)])
def test_bf16_model_close_to_f32(preset, dynamic):
    cfg32 = convert_epochs_to_iters(preset(), 100)
    cfg16 = convert_epochs_to_iters(preset(), 100)
    cfg16["color"]["net"]["bf16_tables"] = True
    info = {"num_keyframes": 2, "num_frames": 4, "num_views": 4}
    m32 = build_model(cfg32, dataset_info=info)
    m16 = build_model(cfg16, dataset_info=info)
    params = m32.init(jax.random.PRNGKey(0))

    rays = _rays_static(32)
    if dynamic:
        rng = np.random.default_rng(2)
        rays = jnp.concatenate([
            rays,
            jnp.asarray(rng.integers(0, 4, (32, 1)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (32, 1)).astype(np.float32)),
        ], -1)
    ctx = make_ctx(it=1000, training=False)
    out32 = np.asarray(m32.apply(params, rays, ctx)["rgb"])
    out16 = np.asarray(m16.apply(params, rays, ctx)["rgb"])
    # bf16 table quantization: expect ~1% agreement on composited color
    np.testing.assert_allclose(out16, out32, rtol=0.1, atol=0.02)


class TestInt8Tables:
    def test_int8_quad_matches_f32(self):
        """Eval-only int8 quad sampling stays within quantization error of
        the f32 reference sampler."""
        import numpy as np
        import jax.numpy as jnp
        from hyperreel_tpu.ops.grid_sample import (
            grid_sample_2d_cf_quad_int8, grid_sample_1d_cf_quad_int8,
            grid_sample_2d_cf, grid_sample_1d_cf, _cf_to_packed_layout)
        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.normal(size=(9, 11, 8)).astype(np.float32))
        pts = jnp.asarray(
            rng.uniform(-1.2, 1.2, size=(200, 2)).astype(np.float32))
        want = np.asarray(_cf_to_packed_layout(grid_sample_2d_cf(g, pts)))
        got = np.asarray(grid_sample_2d_cf_quad_int8(g, pts))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, rel
        line = jnp.asarray(rng.normal(size=(13, 8)).astype(np.float32))
        z = jnp.asarray(
            rng.uniform(-1.2, 1.2, size=(200,)).astype(np.float32))
        want = np.asarray(_cf_to_packed_layout(grid_sample_1d_cf(line, z)))
        got = np.asarray(grid_sample_1d_cf_quad_int8(line, z))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, rel

    def test_int8_model_forward_close_to_bf16(self):
        import copy
        import numpy as np
        import jax
        import jax.numpy as jnp
        from hyperreel_tpu.configs.presets import (
            technicolor_z_plane, convert_epochs_to_iters)
        from hyperreel_tpu.data.synthetic import gaussian_blob_scene
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.models.ctx import make_ctx
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True)
        cfg = convert_epochs_to_iters(technicolor_z_plane(), 100)
        m_bf = build_model(cfg, dataset_info=ds.info())
        cfg8 = copy.deepcopy(cfg)
        cfg8["color"]["net"]["table_dtype"] = "int8"
        m_i8 = build_model(cfg8, dataset_info=ds.info())
        params = m_bf.init(jax.random.PRNGKey(0))
        rays = jnp.asarray(np.random.default_rng(0).normal(
            size=(128, 8)).astype(np.float32))
        ctx = make_ctx(it=jnp.asarray(10 ** 9), training=False)
        a = np.asarray(m_bf.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_i8.apply(params, rays, ctx)["rgb"])
        assert np.abs(a - b).max() < 5e-3
        assert np.all(np.isfinite(b))


class TestFastScatter:
    """Sorted window-matmul scatter-add (grid_sample._scatter_add_cf_cols,
    round 5): the HBM-scatter replacement behind the quad backward. Must
    equal np.add.at at every index density, including tiles that
    overflow the window (lax.cond fallback) and N not a multiple of M."""

    def _check(self, idx_h, C4=8, R=3000, seed=0):
        from hyperreel_tpu.ops.grid_sample import _scatter_add_cf_cols
        rng = np.random.default_rng(seed)
        n = len(idx_h)
        rows = rng.standard_normal((C4, n)).astype(np.float32)
        ref = np.zeros((C4, R), np.float32)
        np.add.at(ref.T, idx_h, rows.T)
        got = np.asarray(jax.jit(
            lambda i, r: _scatter_add_cf_cols(i, r, R)
        )(jnp.asarray(idx_h.astype(np.int32)), jnp.asarray(rows)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_uniform_random(self):
        rng = np.random.default_rng(1)
        self._check(rng.integers(0, 3000, 4096))

    def test_overflow_tiles_mixed_density(self):
        # clustered + far-apart indices: sorted tiles span > K columns,
        # exercising the per-tile XLA-scatter fallback branch
        rng = np.random.default_rng(2)
        a = rng.integers(0, 8, 2048)           # dense cluster
        b = rng.integers(8, 3000, 256) * 1     # sparse spread
        c = rng.integers(0, 3000, 1792)
        self._check(np.concatenate([a, b, c]))

    def test_n_not_multiple_of_tile(self):
        rng = np.random.default_rng(3)
        self._check(rng.integers(0, 3000, 4096 - 333))

    def test_heavy_duplicates(self):
        rng = np.random.default_rng(4)
        self._check(rng.integers(0, 17, 4096))

    def test_quad2d_backward_fast_path_matches_xla_scatter(
            self, monkeypatch):
        """Force the fast path through the real _quad2d_bwd (threshold
        bypassed) and compare grid gradients vs the plain scatter."""
        import hyperreel_tpu.ops.grid_sample as GS
        rng = np.random.default_rng(5)
        H = W = 41
        C = 6
        n = 2500
        grid = jnp.asarray(
            rng.standard_normal((H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-1.05, 1.05, (n, 2)).astype(np.float32))

        def loss(g):
            out = GS.grid_sample_2d_cf_quad(g, coords)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                         .reshape(out.shape)))

        monkeypatch.setenv("HYPERREEL_FAST_SCATTER", "0")
        ref = np.asarray(jax.grad(loss)(grid))
        monkeypatch.setenv("HYPERREEL_FAST_SCATTER", "1")
        monkeypatch.setattr(GS, "_FAST_SCATTER_MIN_TABLE_BYTES", 0)
        monkeypatch.setattr(GS, "_FAST_SCATTER_M", 512)
        got = np.asarray(jax.grad(loss)(grid))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
