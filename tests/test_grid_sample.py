"""Parity tests for grid sampling vs torch.nn.functional.grid_sample
(align_corners=True, padding_mode='zeros') — the exact semantics the
reference relies on (SURVEY.md §7 hard part 1)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from hyperreel_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_1d,
    grid_sample_2d_cf,
    grid_sample_1d_cf,
    grid_sample_3d,
    resize_bilinear_2d,
    resize_linear_1d,
)


def test_channels_first_variants_match():
    rng = np.random.default_rng(21)
    H, W, C, N = 19, 23, 8, 513
    plane = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (N, 2)).astype(np.float32))
    ref = grid_sample_2d(plane, coords)
    got = grid_sample_2d_cf(plane, coords).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    line = jnp.asarray(rng.standard_normal((W, C)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-1.2, 1.2, (N,)).astype(np.float32))
    ref1 = grid_sample_1d(line, z)
    got1 = grid_sample_1d_cf(line, z).T
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("hw", [(7, 5), (33, 17), (1, 9)])
def test_grid_sample_2d_matches_torch(seed, hw):
    rng = np.random.default_rng(seed)
    H, W = hw
    C, N = 6, 257
    plane = rng.standard_normal((C, H, W)).astype(np.float32)
    # include out-of-range coords to exercise zero padding
    coords = rng.uniform(-1.4, 1.4, size=(N, 2)).astype(np.float32)

    ref = F.grid_sample(
        torch.from_numpy(plane)[None],
        torch.from_numpy(coords)[None, :, None, :],
        mode="bilinear",
        align_corners=True,
        padding_mode="zeros",
    )[0, :, :, 0].T.numpy()  # [N, C]

    got = grid_sample_2d(jnp.asarray(plane.transpose(1, 2, 0)), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("L", [2, 9, 65])
def test_grid_sample_1d_matches_torch(L):
    rng = np.random.default_rng(3)
    C, N = 4, 129
    line = rng.standard_normal((C, L)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(N,)).astype(np.float32)

    # reference samples lines as [1, C, L, 1] planes with x pinned to 0
    # (nlf/nets/tensorf_base.py:1068-1076)
    grid = np.stack([np.zeros_like(coords), coords], -1)
    ref = F.grid_sample(
        torch.from_numpy(line)[None, :, :, None],
        torch.from_numpy(grid)[None, :, None, :],
        mode="bilinear",
        align_corners=True,
        padding_mode="zeros",
    )[0, :, :, 0].T.numpy()

    got = grid_sample_1d(jnp.asarray(line.T), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.default_rng(7)
    D, H, W, C, N = 5, 6, 7, 2, 310
    vol = rng.standard_normal((C, D, H, W)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(N, 3)).astype(np.float32)

    ref = F.grid_sample(
        torch.from_numpy(vol)[None],
        torch.from_numpy(coords)[None, :, None, None, :],
        mode="bilinear",
        align_corners=True,
        padding_mode="zeros",
    )[0, :, :, 0, 0].T.numpy()

    got = grid_sample_3d(jnp.asarray(vol.transpose(1, 2, 3, 0)), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(11)
    C, H, W = 3, 9, 13
    plane = rng.standard_normal((C, H, W)).astype(np.float32)
    new_h, new_w = 21, 5
    ref = F.interpolate(
        torch.from_numpy(plane)[None],
        size=(new_h, new_w),
        mode="bilinear",
        align_corners=True,
    )[0].numpy()
    got = resize_bilinear_2d(jnp.asarray(plane.transpose(1, 2, 0)), new_h, new_w)
    np.testing.assert_allclose(
        np.asarray(got).transpose(2, 0, 1), ref, rtol=1e-5, atol=1e-5
    )


def test_resize_linear_matches_torch():
    rng = np.random.default_rng(13)
    C, L = 3, 17
    line = rng.standard_normal((C, L)).astype(np.float32)
    new_l = 40
    ref = F.interpolate(
        torch.from_numpy(line)[None, :, :, None],
        size=(new_l, 1),
        mode="bilinear",
        align_corners=True,
    )[0, :, :, 0].numpy()
    got = resize_linear_1d(jnp.asarray(line.T), new_l)
    np.testing.assert_allclose(np.asarray(got).T, ref, rtol=1e-5, atol=1e-5)
