"""Coherent patch-gather math core (ops/patch_gather.py) vs the exact
quad sampler (ops/grid_sample.py) — the design gate for the patch-row
eval gather (one 256 B row per 4-ray block instead of 4x 128 B rows)."""

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.grid_sample import grid_sample_2d_cf_quad
from hyperreel_tpu.ops.patch_gather import (
    build_patch_table_2d, coverage_violations, grid_sample_2d_cf_patch,
    patch_anchors_2d, _unnormalize)


def quad_cf(grid, coords):
    """grid_sample_2d_cf_quad output [C//2, N, 2] -> [C, N]."""
    q = np.asarray(grid_sample_2d_cf_quad(grid, coords))
    c2, n, _ = q.shape
    return q.transpose(0, 2, 1).reshape(2 * c2, n)


def coherent_coords(rng, n_blocks, R, W, H, px, py, edge=0.2):
    """[n_blocks * R, 2] normalized coords, R-blocks jittered within the
    (px, py) patch coverage budget (floor-span <= p-2 per axis): x
    spreads like scanline rays, y is pinned inside one texel row when
    py == 2 (the scanline geometry exp_patch_coverage.py measures)."""
    xs = max(0.01, px - 2.99)
    ys = 0.5 if py == 2 else max(0.01, py - 2.99)
    # pin the base to a texel + 0.2 so py=2 blocks never straddle floors
    bx = rng.integers(2, W - px - 2, (n_blocks, 1)) + 0.2
    by = rng.integers(2, H - py - 2, (n_blocks, 1)) + 0.2
    tex = np.stack([bx + rng.uniform(0, xs, (n_blocks, R)),
                    by + rng.uniform(0, ys, (n_blocks, R))], -1)
    coords = np.stack([tex[..., 0] / (W - 1), tex[..., 1] / (H - 1)],
                      -1) * 2 - 1
    return jnp.asarray(coords.reshape(-1, 2).astype(np.float32))


class TestPatchGather:
    def test_exact_parity_in_coverage(self):
        rng = np.random.default_rng(0)
        H = W = 33
        C = 16
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        for R, px, py in ((4, 4, 2), (4, 4, 4), (8, 8, 2), (2, 3, 3)):
            coords = coherent_coords(rng, 64, R, W, H, px, py)
            x = _unnormalize(coords[:, 0], W)
            y = _unnormalize(coords[:, 1], H)
            assert float(coverage_violations(x, y, R, px, py)) == 0.0
            got = np.asarray(
                grid_sample_2d_cf_patch(grid, coords, R, px, py))
            want = quad_cf(grid, coords)
            assert np.abs(got - want).max() < 1e-5, (R, px, py)

    def test_border_and_far_out_parity(self):
        rng = np.random.default_rng(1)
        H = W = 17
        C = 8
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        # blocks straddling the border ring and far outside: quad zero
        # padding == patch hat-weight vanishing
        base = np.array([[-1.0, -1.0], [1.0, 1.0], [-1.06, 0.0],
                         [3.0, 3.0], [0.99, -1.02]], np.float32)
        coords = np.repeat(base, 4, 0)
        coords += rng.uniform(0, 0.04, coords.shape).astype(np.float32)
        coords = jnp.asarray(coords)
        got = np.asarray(grid_sample_2d_cf_patch(grid, coords, 4, 4, 2))
        want = quad_cf(grid, coords)
        assert np.abs(got - want).max() < 1e-5

    def test_exact_at_texel_centers(self):
        rng = np.random.default_rng(2)
        H = W = 9
        C = 4
        grid_np = rng.normal(size=(H, W, C)).astype(np.float32)
        grid = jnp.asarray(grid_np)
        # last texel exactly (x = W-1 <-> coord 1.0) in all block slots
        coords = jnp.asarray(np.tile([[1.0, 1.0]], (4, 1))
                             .astype(np.float32))
        got = np.asarray(grid_sample_2d_cf_patch(grid, coords, 4, 4, 2))
        assert np.abs(got - grid_np[-1, -1][:, None]).max() < 1e-6

    def test_violation_degrades_to_partial_zero(self):
        rng = np.random.default_rng(3)
        H = W = 33
        C = 8
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        # one block whose 4th ray is 6 texels away: that ray's footprint
        # exits the 4x2 patch -> its feature must be hat-zeroed, while
        # the 3 coherent rays stay exact
        tex = np.array([[10.2, 10.4], [10.5, 10.6], [10.8, 10.5],
                        [16.5, 10.4]], np.float32)
        coords = jnp.asarray(tex / (W - 1) * 2 - 1)
        x = _unnormalize(coords[:, 0], W)
        y = _unnormalize(coords[:, 1], H)
        assert float(coverage_violations(x, y, 4, 4, 2)) == 1.0
        got = np.asarray(grid_sample_2d_cf_patch(grid, coords, 4, 4, 2))
        want = quad_cf(grid, coords)
        assert np.abs(got[:, :3] - want[:, :3]).max() < 1e-5
        assert np.abs(got[:, 3]).max() == 0.0  # fully out of patch

    def test_patch_table_rows(self):
        rng = np.random.default_rng(4)
        H, W, C = 5, 7, 2
        grid_np = rng.normal(size=(H, W, C)).astype(np.float32)
        table = np.asarray(build_patch_table_2d(jnp.asarray(grid_np),
                                                px=4, py=2))
        assert table.shape == ((H + 1) * (W + 1), 4 * 2 * C)
        # row for anchor (y0=1, x0=2) must hold texels (1..2, 2..5)
        row = table[(1 + 1) * (W + 1) + (2 + 1)].reshape(2, 4, C)
        pad = np.pad(grid_np, ((0, 3), (0, 3), (0, 0)))
        for ty in range(2):
            for tx in range(4):
                np.testing.assert_allclose(row[ty, tx],
                                           pad[1 + ty, 2 + tx])

    def test_anchor_offsets(self):
        x = jnp.asarray(np.array([3.2, 3.9, 4.5, 3.4], np.float32))
        y = jnp.asarray(np.array([7.0, 7.1, 7.3, 7.9], np.float32))
        idx, u, v = patch_anchors_2d(x, y, 4, W=33, H=33, px=4, py=2)
        assert idx.shape == (1,)
        assert int(idx[0]) == (7 + 1) * 34 + (3 + 1)
        np.testing.assert_allclose(np.asarray(u), [0.2, 0.9, 1.5, 0.4],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), [0.0, 0.1, 0.3, 0.9],
                                   atol=1e-6)
