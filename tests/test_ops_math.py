"""Closed-form and reference-parity tests for intersection math, compositing,
SH bases and contraction (SURVEY.md §4 items 1-2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyperreel_tpu.ops import (
    raw2alpha,
    alpha2weights,
    sort_z,
    sort_with,
    intersect_axis_plane,
    intersect_plane,
    intersect_sphere,
    intersect_cylinder,
    intersect_voxel_grid,
    min_sphere_radius,
    eval_sh_bases,
    eval_sh,
)
from hyperreel_tpu.ops.contract import get_contract
from hyperreel_tpu.ops.render_math import (
    transform_color_all,
    scale_shift_color_all,
)


def _rays(o, d):
    return jnp.asarray(np.concatenate([o, d], -1), jnp.float32)


class TestIntersect:
    def test_axis_plane_closed_form(self):
        o = np.array([[0.0, 0.0, -2.0]])
        d = np.array([[0.0, 0.0, 1.0]])
        t = intersect_axis_plane(_rays(o, d), 1.5, 2)
        np.testing.assert_allclose(t, [3.5], atol=1e-6)

    def test_axis_plane_parallel_ray_is_huge(self):
        o = np.array([[0.0, 0.0, 0.0]])
        d = np.array([[1.0, 0.0, 0.0]])  # parallel to z-plane
        t = intersect_axis_plane(_rays(o, d), 1.0, 2)
        assert abs(float(t[0])) < 1e-6  # 1.0/1e12 ~ 0

    def test_axis_plane_batched_z_vals(self):
        # [B, 1, 6] rays against [B, S] plane offsets — the z-plane intersect
        # layout (nlf/intersect/z.py:89-95)
        o = np.array([[0.0, 0.0, -1.0]])
        d = np.array([[0.0, 0.0, 0.5]])
        rays = _rays(o, d)[:, None, :]
        z_vals = jnp.asarray([[0.0, 1.0, 2.0]])
        t = intersect_axis_plane(rays, z_vals, 2)
        np.testing.assert_allclose(t, [[2.0, 4.0, 6.0]], atol=1e-5)

    def test_sphere_closed_form(self):
        o = np.array([[0.0, 0.0, -3.0]])
        d = np.array([[0.0, 0.0, 1.0]])
        t = intersect_sphere(_rays(o, d), jnp.zeros(3), 1.0)
        np.testing.assert_allclose(t, [2.0], atol=1e-3)

    def test_sphere_miss_returns_zero(self):
        o = np.array([[0.0, 5.0, -3.0]])
        d = np.array([[0.0, 0.0, 1.0]])
        t = intersect_sphere(_rays(o, d), jnp.zeros(3), 1.0)
        np.testing.assert_allclose(t, [0.0], atol=1e-6)

    def test_cylinder_closed_form(self):
        # y-axis cylinder: y-component ignored
        o = np.array([[0.0, 7.0, -4.0]])
        d = np.array([[0.0, 0.0, 1.0]])
        t = intersect_cylinder(_rays(o, d), jnp.zeros(3), 2.0)
        np.testing.assert_allclose(t, [2.0], atol=1e-3)

    def test_plane_closed_form(self):
        o = np.array([[[0.0, 0.0, 0.0]]])
        d = np.array([[[1.0, 0.0, 0.0]]])
        rays = _rays(o, d)
        n = jnp.asarray([[[1.0, 0.0, 0.0]]])
        t = intersect_plane(rays, n, jnp.asarray([[4.0]]))
        np.testing.assert_allclose(t, [[4.0]], atol=1e-6)

    def test_voxel_grid_shape_and_values(self):
        o = np.array([[0.5, 0.5, 0.5]])
        d = np.array([[1.0, 1.0, 1.0]])
        rays = _rays(o, d)[:, None, :]
        val = jnp.asarray([[[1.0, 2.0, 3.0]]])  # [B, 1, 3]
        t = intersect_voxel_grid(rays, jnp.zeros(3), val)
        np.testing.assert_allclose(t, [[0.5, 1.5, 2.5]], atol=1e-6)

    def test_min_sphere_radius(self):
        o = np.array([[0.0, 2.0, -5.0]])
        d = np.array([[0.0, 0.0, 1.0]])
        r = min_sphere_radius(_rays(o, d), jnp.zeros(3))
        np.testing.assert_allclose(r, [2.0], atol=1e-5)

    def test_sort_roundtrip(self):
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
        vals = jnp.asarray(rng.standard_normal((4, 8, 3)).astype(np.float32))
        z_sorted, idx = sort_z(z)
        assert bool(jnp.all(jnp.diff(z_sorted, axis=-1) >= 0))
        vals_sorted = sort_with(idx, vals)
        # the value attached to the smallest z must come along
        i0 = np.argmin(np.asarray(z), -1)
        for b in range(4):
            np.testing.assert_allclose(
                np.asarray(vals_sorted)[b, 0], np.asarray(vals)[b, i0[b]]
            )


class TestRaw2Alpha:
    def test_matches_naive_cumprod(self):
        rng = np.random.default_rng(1)
        sigma = np.abs(rng.standard_normal((16, 32))).astype(np.float32)
        dist = np.abs(rng.standard_normal((16, 32))).astype(np.float32)

        alpha_ref = 1.0 - np.exp(-sigma * dist)
        T = np.cumprod(
            np.concatenate([np.ones((16, 1)), 1.0 - alpha_ref + 1e-10], -1), -1
        )
        w_ref = alpha_ref * T[:, :-1]

        alpha, w, bg = raw2alpha(jnp.asarray(sigma), jnp.asarray(dist))
        np.testing.assert_allclose(np.asarray(alpha), alpha_ref, rtol=1e-3, atol=5e-6)
        # log-space scan vs sequential cumprod: ~1e-6 absolute fp divergence
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bg), T[:, -1:], rtol=1e-3, atol=1e-5)

    def test_alpha2weights_consistent(self):
        rng = np.random.default_rng(2)
        alpha = rng.uniform(0, 1, (8, 16)).astype(np.float32)
        w = alpha2weights(jnp.asarray(alpha))
        T = np.cumprod(
            np.concatenate([np.ones((8, 1)), 1.0 - alpha + 1e-10], -1), -1
        )
        np.testing.assert_allclose(np.asarray(w), alpha * T[:, :-1], rtol=1e-4,
                                   atol=1e-6)

    def test_opaque_sample_blocks_rest(self):
        sigma = jnp.asarray([[1e8, 1.0, 1.0]])
        dist = jnp.asarray([[1.0, 1.0, 1.0]])
        _, w, bg = raw2alpha(sigma, dist)
        np.testing.assert_allclose(np.asarray(w[0, 0]), 1.0, atol=1e-5)
        assert float(jnp.sum(w[0, 1:])) < 1e-6
        assert float(bg[0, 0]) < 1e-6


class TestSH:
    def test_dc_term(self):
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        basis = eval_sh_bases(0, dirs)
        np.testing.assert_allclose(np.asarray(basis), [[0.28209479]], atol=1e-6)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_orthonormality(self, deg):
        # Monte-Carlo check: int Y_i Y_j dOmega = delta_ij
        rng = np.random.default_rng(42)
        v = rng.standard_normal((200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(eval_sh_bases(deg, jnp.asarray(v, jnp.float32)))
        gram = basis.T @ basis / v.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye((deg + 1) ** 2), atol=0.05)

    def test_eval_sh_contract(self):
        rng = np.random.default_rng(5)
        sh = jnp.asarray(rng.standard_normal((10, 3, 9)).astype(np.float32))
        dirs = rng.standard_normal((10, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(2, sh, jnp.asarray(dirs))
        basis = np.asarray(eval_sh_bases(2, jnp.asarray(dirs)))
        ref = np.einsum("bcn,bn->bc", np.asarray(sh), basis)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestContract:
    @pytest.mark.parametrize("cfg", [
        {"type": "mipnerf", "contract_start_radius": 1.0,
         "contract_end_radius": 8.0},
        {"type": "mipnerf", "contract_start_radius": 2.0,
         "contract_end_radius": 16.0},
        {"type": "donerf", "contract_start_radius": 1.0,
         "contract_end_radius": 100.0},
    ])
    def test_distance_roundtrip(self, cfg):
        c = get_contract(cfg)
        # start above ~0.3: the reference's +1e-8 epsilon inside the power
        # contraction makes round-trips at tiny contracted distances lossy
        d = jnp.linspace(0.3, 1.9, 64)
        round_trip = c.contract_distance(c.inverse_contract_distance(d))
        np.testing.assert_allclose(np.asarray(round_trip), np.asarray(d),
                                   rtol=1e-3, atol=1e-3)

    def test_mipnerf_points_bounded(self):
        c = get_contract({"type": "mipnerf", "contract_start_radius": 1.0,
                          "contract_end_radius": 8.0})
        rng = np.random.default_rng(9)
        pts = rng.uniform(-7, 7, (1000, 3)).astype(np.float32)
        # contraction reaches radius 2 exactly at contract_end_radius; points
        # beyond it (which the bbox would cull anyway) map slightly outside
        norms = np.linalg.norm(pts, axis=-1, keepdims=True)
        pts = pts / np.maximum(norms / 8.0, 1.0)
        out = c.contract_points(jnp.asarray(pts))
        assert float(jnp.max(jnp.linalg.norm(out, axis=-1))) <= 2.0 + 1e-4

    def test_mipnerf_identity_inside_unit_ball(self):
        c = get_contract({"type": "mipnerf", "contract_start_radius": 1.0,
                          "contract_end_radius": 8.0})
        pts = jnp.asarray([[0.3, -0.2, 0.1]])
        np.testing.assert_allclose(np.asarray(c.contract_points(pts)),
                                   np.asarray(pts), atol=1e-6)

    def test_bbox(self):
        c = get_contract({"type": "bbox", "bbox_min": [-2, -2, -2],
                          "bbox_max": [2, 2, 2]})
        np.testing.assert_allclose(
            np.asarray(c.contract_points(jnp.asarray([[2.0, 0.0, -2.0]]))),
            [[1.0, 0.5, 0.0]], atol=1e-6)


class TestColorTransforms:
    def test_scale_shift(self):
        rgb = jnp.ones((2, 3, 3))
        out = scale_shift_color_all(rgb, jnp.zeros((2, 3, 3)), jnp.ones((2, 3, 3)))
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_transform_residual(self):
        rng = np.random.default_rng(3)
        rgb = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
        M = jnp.asarray(rng.standard_normal((4, 5, 3, 3)).astype(np.float32))
        shift = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
        out = transform_color_all(rgb, M, shift)
        ref = np.asarray(rgb) + np.einsum(
            "bsi,bsci->bsc", np.asarray(rgb), np.asarray(M)
        ) + np.asarray(shift)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
