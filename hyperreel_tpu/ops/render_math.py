"""Volume-rendering math: alpha compositing and color calibration transforms
(reference: utils/tensorf_utils.py:242-331).

`raw2alpha` computes exclusive transmittance with a log-space cumulative sum
(an associative scan XLA maps to an efficient parallel prefix on TPU) rather
than the reference's sequential `cumprod`; values match to fp tolerance and
gradients are better conditioned.
"""

import jax.numpy as jnp


_LOG_EPS = -23.025850929940457  # log(1e-10), the reference's cumprod epsilon
_EXP_CLAMP = 70.0


def raw2alpha(sigma, dist):
    """alpha/weights/background weight from densities and deltas.

    Args:
      sigma: [B, S] densities (post activation).
      dist:  [B, S] distance deltas (already scaled by distance_scale).

    Returns:
      alpha [B, S], weights [B, S], bg_weight [B, 1]
      (reference utils/tensorf_utils.py:242-253)

    The transmittance is a log-space cumulative sum of -sigma*dist directly
    (log(1-alpha) == -sigma*dist exactly), floored at log(1e-10) to mirror
    the reference's `1 - alpha + 1e-10` cumprod epsilon. This avoids a
    log(1-alpha) whose backward produces NaN on TPU when sigma*dist is huge
    (e.g. the 1e10 sentinel last delta), needs no transcendental beyond the
    existing exp, and keeps gradients exact in the unsaturated region.
    """
    x = jnp.clip(sigma * dist, -_EXP_CLAMP, _EXP_CLAMP)
    alpha = 1.0 - jnp.exp(-x)
    log_trans = jnp.maximum(-x, _LOG_EPS)
    log_T = jnp.cumsum(log_trans, axis=-1)
    T_excl = jnp.exp(
        jnp.concatenate([jnp.zeros_like(log_T[..., :1]), log_T[..., :-1]], -1)
    )
    weights = alpha * T_excl
    bg_weight = jnp.exp(log_T[..., -1:])
    return alpha, weights, bg_weight


def alpha2weights(alpha):
    """Weights from pre-computed alphas
    (reference utils/tensorf_utils.py:256-265). The log uses a floor rather
    than the reference's additive epsilon for a TPU-safe backward."""
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    log_T = jnp.cumsum(log_trans, axis=-1)
    T_excl = jnp.exp(
        jnp.concatenate([jnp.zeros_like(log_T[..., :1]), log_T[..., :-1]], -1)
    )
    return alpha * T_excl


def scale_shift_color_all(rgb, color_scale, color_shift):
    """Per-sample affine color calibration
    (reference utils/tensorf_utils.py:267-273)."""
    return rgb * (color_scale + 1.0) + color_shift


def scale_shift_color_one(rgb_map, color_scale_global, color_shift_global):
    """Per-ray (global) affine calibration applied to the composited color
    (reference utils/tensorf_utils.py:275-281). Scale/shift are [B, 3] taken
    from the first sample slot."""
    return rgb_map * (color_scale_global + 1.0) + color_shift_global


def transform_color_all(rgb, color_transform, color_shift):
    """Per-sample residual 3x3 color transform
    (reference utils/tensorf_utils.py:283-306).

    rgb [B, S, 3], color_transform [B, S, 3, 3], color_shift [B, S, 3]:
      out_c = rgb_c + rgb . M[c, :] + shift_c
    """
    mixed = jnp.einsum("...i,...ci->...c", rgb, color_transform)
    return rgb + mixed + color_shift


def transform_color_one(rgb_map, color_transform_global, color_shift_global):
    """Per-ray residual 3x3 transform on the composited color
    (reference utils/tensorf_utils.py:308-331). transform [B, 3, 3],
    shift [B, 3]."""
    mixed = jnp.einsum("bi,bci->bc", rgb_map, color_transform_global)
    return rgb_map + mixed + color_shift_global
