"""Pallas TPU kernel for the alpha-composite tail of the render
(reference math: utils/tensorf_utils.py:242-253 + the weighted reduce of
tensorf_no_sample.py:231-233).

Fuses: delta computation from sorted distances, the clamped log-direct
transmittance scan, and the weighted RGB/accumulation reduce — one VMEM
pass over [TILE, S] ray tiles instead of several XLA fusions with HBM
round-trips. S is static and small (<=64), so the prefix product unrolls
into log2(S) in-register shift-adds.

Falls back to the pure-jnp path when Pallas lowering is unavailable.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.ops.render_math import raw2alpha

_LOG_EPS = -23.025850929940457
_EXP_CLAMP = 70.0


def _composite_kernel(sigma_ref, dist_ref, r_ref, g_ref, b_ref, out_ref,
                      *, scale, S):
    sigma = sigma_ref[:]          # [TILE, S]
    dist = dist_ref[:]            # [TILE, S] sorted distances

    deltas = jnp.concatenate(
        [dist[:, 1:] - dist[:, :-1],
         jnp.full_like(dist[:, :1], 1e10)], 1)
    x = jnp.clip(sigma * (deltas * scale), -_EXP_CLAMP, _EXP_CLAMP)
    alpha = 1.0 - jnp.exp(-x)
    log_trans = jnp.maximum(-x, _LOG_EPS)

    # inclusive prefix sum along S via log-step shift-adds (static unroll)
    acc = log_trans
    shift = 1
    while shift < S:
        shifted = jnp.concatenate(
            [jnp.zeros_like(acc[:, :shift]), acc[:, :-shift]], 1)
        acc = acc + shifted
        shift *= 2
    # exclusive transmittance
    T_excl = jnp.exp(jnp.concatenate(
        [jnp.zeros_like(acc[:, :1]), acc[:, :-1]], 1))
    w = alpha * T_excl

    out_ref[:, 0] = jnp.sum(w * r_ref[:], 1)
    out_ref[:, 1] = jnp.sum(w * g_ref[:], 1)
    out_ref[:, 2] = jnp.sum(w * b_ref[:], 1)
    out_ref[:, 3] = jnp.sum(w, 1)  # acc_map


def composite_pallas(sigma, dist, rgb, scale, tile=1024):
    """sigma [B, S], dist [B, S] (sorted), rgb [B, S, 3] ->
    (rgb_map [B, 3], acc_map [B]). Requires B % tile == 0."""
    from jax.experimental import pallas as pl

    B, S = sigma.shape
    assert B % tile == 0, (B, tile)
    kern = functools.partial(_composite_kernel, scale=float(scale), S=S)
    out = pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4), jnp.float32),
    )(sigma, dist, rgb[..., 0], rgb[..., 1], rgb[..., 2])
    return out[:, :3], out[:, 3]


def composite_reference(sigma, dist, rgb, scale):
    """Pure-jnp equivalent (the current production path)."""
    deltas = jnp.concatenate(
        [dist[:, 1:] - dist[:, :-1],
         jnp.full_like(dist[:, :1], 1e10)], 1)
    alpha, w, bg = raw2alpha(sigma, deltas * scale)
    rgb_map = jnp.sum(w[..., None] * rgb, -2)
    return rgb_map, jnp.sum(w, -1)
