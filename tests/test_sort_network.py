"""Bitonic sorting network vs jnp.sort / argsort+gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperreel_tpu.ops.sort_network import (
    bitonic_sort, bitonic_sort_with_payload)


@pytest.mark.parametrize("s", [1, 2, 3, 7, 8, 16, 17, 31, 32, 33, 64])
def test_values_only_matches_sort(s):
    rng = np.random.default_rng(s)
    x = jnp.asarray(rng.normal(size=(5, s)).astype(np.float32))
    got = np.asarray(jax.jit(bitonic_sort)(x))
    assert np.allclose(got, np.sort(np.asarray(x), -1))


def test_values_only_other_axis():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 8, 3)).astype(np.float32))
    got = np.asarray(bitonic_sort(x, axis=1))
    assert np.allclose(got, np.sort(np.asarray(x), 1))


@pytest.mark.parametrize("s", [8, 13, 32])
def test_payload_matches_argsort_gather(s):
    rng = np.random.default_rng(s)
    keys = jnp.asarray(rng.normal(size=(4, s)).astype(np.float32))
    p1 = jnp.asarray(rng.normal(size=(4, s)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(4, s, 3)).astype(np.float32))
    k_out, (q1, q2) = bitonic_sort_with_payload(
        keys, [p1, jnp.moveaxis(p2, -1, -2)])
    q2 = jnp.moveaxis(q2, -2, -1)
    idx = np.argsort(np.asarray(keys), -1)
    assert np.allclose(np.asarray(k_out),
                       np.take_along_axis(np.asarray(keys), idx, -1))
    assert np.allclose(np.asarray(q1),
                       np.take_along_axis(np.asarray(p1), idx, -1))
    assert np.allclose(np.asarray(q2),
                       np.take_along_axis(np.asarray(p2), idx[..., None], 1))


def test_ties_keep_key_order():
    # unstable for payloads, but keys themselves must still sort
    x = jnp.asarray([[1.0, 0.0, 1.0, 0.0, 0.5, 0.5, 0.0, 1.0]])
    got = np.asarray(bitonic_sort(x))
    assert np.allclose(got, np.sort(np.asarray(x), -1))


def test_grad_flows_through_sort():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))

    def f(x):
        return jnp.sum(bitonic_sort(x) * jnp.arange(8, dtype=jnp.float32))

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient of a sort permutes the cotangent: sum preserved per row
    assert np.allclose(np.asarray(g).sum(-1), 28.0)
