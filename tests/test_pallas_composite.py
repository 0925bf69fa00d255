"""Pallas composite kernel parity (interpret mode on CPU; the TPU path is
exercised by perf scripts — it compiles and matches, see PERFORMANCE.md)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hyperreel_tpu.ops.pallas import composite as C


@pytest.mark.parametrize("S", [8, 32])
def test_interpret_parity(S):
    B = 512
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(np.abs(rng.standard_normal((B, S))).astype(np.float32))
    dist = jnp.asarray(np.sort(
        rng.uniform(0.1, 3, (B, S)).astype(np.float32), -1))
    rgb = jnp.asarray(rng.uniform(0, 1, (B, S, 3)).astype(np.float32))

    ref_rgb, ref_acc = C.composite_reference(sigma, dist, rgb, 16.0)

    kern = functools.partial(C._composite_kernel, scale=16.0, S=S)
    out = pl.pallas_call(
        kern, grid=(B // 256,),
        in_specs=[pl.BlockSpec((256, S), lambda i: (i, 0))] * 5,
        out_specs=pl.BlockSpec((256, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4), jnp.float32),
        interpret=True,
    )(sigma, dist, rgb[..., 0], rgb[..., 1], rgb[..., 2])

    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(ref_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(ref_acc),
                               rtol=1e-4, atol=1e-5)


def test_opaque_and_empty_rays():
    S = 16
    sigma = jnp.zeros((256, S))
    sigma = sigma.at[0, 0].set(1e8)  # ray 0: opaque first sample
    dist = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S), (256, S))
    rgb = jnp.ones((256, S, 3)) * 0.5

    kern = functools.partial(C._composite_kernel, scale=16.0, S=S)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((256, S), lambda i: (i, 0))] * 5,
        out_specs=pl.BlockSpec((256, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 4), jnp.float32),
        interpret=True,
    )(sigma, dist, rgb[..., 0], rgb[..., 1], rgb[..., 2])
    # opaque ray: acc ~1, rgb ~0.5
    np.testing.assert_allclose(float(out[0, 3]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0, :3]), 0.5, atol=1e-4)
    # empty rays: everything 0
    np.testing.assert_allclose(np.asarray(out[1:, 3]), 0.0, atol=1e-5)