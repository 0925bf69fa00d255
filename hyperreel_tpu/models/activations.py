"""Activation registry (reference: nlf/activations.py).

Each factory takes a config (str or dict) and returns a pure function
``act(x, ctx) -> y``. Iteration-scheduled activations (`ease_value`,
`interp_value`) read ``ctx.it`` instead of mutating module state, so they
trace into a single compiled step.
"""

import jax.numpy as jnp

from hyperreel_tpu.models.ctx import StepCtx  # noqa: F401  (type reference)


def _cfg_get(cfg, key, default):
    if isinstance(cfg, str):
        return default
    return cfg.get(key, default)


def _affine_params(cfg):
    inner = _cfg_get(cfg, "inner_fac", 1.0)
    outer = _cfg_get(cfg, "outer_fac", 1.0)
    shift = _cfg_get(cfg, "shift", 0.0)
    fac = _cfg_get(cfg, "fac", None)
    if fac is not None:
        outer = fac
    return inner, outer, shift


def make_identity(cfg):
    inner, outer, shift = _affine_params(cfg)

    def act(x, ctx=None):
        return (x * inner + shift) * outer

    act.inverse = lambda x: (x / outer - shift) / inner
    return act


def make_sigmoid(cfg):
    return _sigmoid_impl(*_affine_params(cfg))


def _sigmoid_impl(inner, outer, shift):
    def act(x, ctx=None):
        return jnp.reciprocal(1.0 + jnp.exp(-(x * inner + shift))) * outer

    return act


def make_softplus(cfg):
    inner, outer, shift = _affine_params(cfg)

    def act(x, ctx=None):
        return jnp.logaddexp(x * inner + shift, 0.0) * outer

    return act


def make_tanh(cfg):
    inner, outer, shift = _affine_params(cfg)

    def act(x, ctx=None):
        return jnp.tanh(x * inner + shift) * outer

    act.inverse = lambda x: (jnp.arctanh(x / outer) - shift) / inner
    return act


def make_identity_tanh(cfg):
    fac = _cfg_get(cfg, "fac", 1.0)

    def act(x, ctx=None):
        x2 = x * 2.0
        return jnp.where(jnp.abs(x2) < 1.91501, x2, jnp.tanh(x2) * 2.0) * fac / 2.0

    return act


def make_relu(cfg):
    def act(x, ctx=None):
        return jnp.maximum(x, 0.0)

    return act


def make_leaky_relu(cfg):
    a = _cfg_get(cfg, "a", 0.01)

    def act(x, ctx=None):
        return jnp.where(x >= 0, x, a * x)

    return act


def make_abs(cfg):
    def act(x, ctx=None):
        return jnp.abs(x)

    return act


def make_zero(cfg):
    def act(x, ctx=None):
        return jnp.zeros_like(x)

    return act


def make_power(cfg):
    power = _cfg_get(cfg, "power", 1.0)

    def act(x, ctx=None):
        return jnp.power(jnp.abs(x) + 1e-8, power) * jnp.sign(x)

    act.inverse = lambda x: jnp.power(jnp.abs(x) + 1e-8, 1.0 / power) * jnp.sign(x)
    return act


def make_softmax(cfg):
    def act(x, ctx=None):
        e = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
        return e / jnp.sum(e, axis=-1, keepdims=True)

    return act


def make_l1_norm(cfg):
    def act(x, ctx=None):
        n = jnp.sum(jnp.abs(x), axis=-1, keepdims=True)
        return x / jnp.maximum(n, 1e-12) * x.shape[-1]

    return act


def make_l2_norm(cfg):
    def act(x, ctx=None):
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(n, 1e-12)

    return act


def make_row_l2_norm(cfg):
    """Normalize per row of a [..., R, C]-viewed tensor
    (reference nlf/activations.py:210-233)."""
    param_channels = _cfg_get(cfg, "param_channels", 3)

    def act(x, ctx=None):
        shape = x.shape
        xr = x.reshape(shape[:-1] + (-1, param_channels))
        n = jnp.linalg.norm(xr, axis=-1, keepdims=True)
        return (xr / jnp.maximum(n, 1e-12)).reshape(shape)

    return act


def make_gaussian(cfg):
    sigma = _cfg_get(cfg, "sigma", 1.0)

    def act(x, ctx=None):
        return jnp.exp(-0.5 * (x / sigma) ** 2)

    return act


def make_ease_value(cfg):
    """Iteration-scheduled blend from start_value to inner activation
    (reference nlf/activations.py:462-497).

    weight(it): cur = it - wait_iters;
      cur >= window_iters -> 1; window==0 (and cur<0... see ref) -> 0;
      else clip(cur/window, 0, 1).
    """
    inner = get_activation(cfg["activation"])
    start_value = cfg.get("start_value", 0.0)
    wait = float(cfg.get("wait_iters", 0.0))
    window = float(cfg.get("window_iters", 0.0))

    def weight(it):
        cur = it.astype(jnp.float32) - wait
        if window <= 0.0:
            return jnp.where(cur >= 0.0, 1.0, 0.0)
        return jnp.clip(cur / window, 0.0, 1.0)

    def act(x, ctx=None):
        out = inner(x, ctx)
        if ctx is None:
            return out
        w = weight(ctx.it)
        return w * out + (1.0 - w) * start_value

    return act


def make_interp_value(cfg):
    """Iteration-scheduled interpolation between two activations
    (reference nlf/activations.py:499-535)."""
    act1 = get_activation(cfg["act1"])
    act2 = get_activation(cfg["act2"])
    wait = float(cfg.get("wait_iters", 0.0))
    window = float(cfg.get("window_iters", 0.0))

    def act(x, ctx=None):
        if ctx is None:
            return act2(x, ctx)
        cur = ctx.it.astype(jnp.float32) - wait
        if window <= 0.0:
            w = jnp.where(cur >= 0.0, 1.0, 0.0)
        else:
            w = jnp.clip(cur / window, 0.0, 1.0)
        return (1.0 - w) * act1(x, ctx) + w * act2(x, ctx)

    return act


def make_alpha(cfg):
    def act(x, ctx=None):
        return jnp.reciprocal(1.0 + jnp.exp(-x))

    return act


def make_rgba(cfg):
    def act(x, ctx=None):
        rgb = jnp.reciprocal(1.0 + jnp.exp(-x[..., :3]))
        a = jnp.reciprocal(1.0 + jnp.exp(-x[..., 3:]))
        return jnp.concatenate([rgb, a], -1)

    return act


def make_probs(cfg):
    """Normalize to a probability vector (reference
    nlf/activations.py:202-208)."""

    def act(x, ctx=None):
        x = jnp.abs(x)
        return x / jnp.maximum(jnp.sum(x, -1, keepdims=True), 1e-12)

    return act


def make_sparse_magnitude(cfg):
    """Softmax over row magnitudes applied to normalized rows
    (reference nlf/activations.py:100-118)."""
    inner = _cfg_get(cfg, "inner_fac", 1.0)
    outer = _cfg_get(cfg, "outer_fac", 1.0)
    pc = _cfg_get(cfg, "param_channels", 3)

    def act(x, ctx=None):
        shape = x.shape
        xr = x.reshape(shape[0], -1, pc)
        mag = jnp.linalg.norm(xr, axis=-1)
        e = jnp.exp(mag * inner - jnp.max(mag * inner, -1, keepdims=True))
        mag_sm = e / jnp.sum(e, -1, keepdims=True) * outer
        unit = xr / jnp.maximum(
            jnp.linalg.norm(xr, axis=-1, keepdims=True), 1e-12)
        return (unit * mag_sm[..., None]).reshape(shape)

    return act


def make_row_l1_norm(cfg):
    pc = _cfg_get(cfg, "param_channels", 3)

    def act(x, ctx=None):
        shape = x.shape
        xr = x.reshape(shape[:-1] + (-1, pc))
        n = jnp.sum(jnp.abs(xr), -1, keepdims=True)
        return (xr / jnp.maximum(n, 1e-12)).reshape(shape)

    return act


def make_row_linf_norm(cfg):
    pc = _cfg_get(cfg, "param_channels", 3)

    def act(x, ctx=None):
        shape = x.shape
        xr = x.reshape(shape[:-1] + (-1, pc))
        n = jnp.max(jnp.abs(xr), -1, keepdims=True)
        return (xr / jnp.maximum(n, 1e-12)).reshape(shape)

    return act


def make_row_l2_norm_z_only(cfg):
    """Row L2 normalization using only the z component's magnitude
    (reference nlf/activations.py:235-263)."""
    pc = _cfg_get(cfg, "param_channels", 3)

    def act(x, ctx=None):
        shape = x.shape
        xr = x.reshape(shape[:-1] + (-1, pc))
        n = jnp.abs(xr[..., -1:])
        return (xr / jnp.maximum(n, 1e-12)).reshape(shape)

    return act


def make_twist_to_matrix(cfg):
    """se(3) twist -> (rotation | translation) flattened
    (reference nlf/activations.py:383-423)."""
    from hyperreel_tpu.ops.rotation import axis_angle_to_matrix

    def act(x, ctx=None):
        w = x[..., :3]
        v = x[..., 3:6]
        R = axis_angle_to_matrix(w)
        return jnp.concatenate(
            [R.reshape(x.shape[:-1] + (9,)), v], -1)

    return act


def make_axis_angle_translation(cfg):
    """Axis-angle rotation + translation applied as a 12-dim transform
    (reference nlf/activations.py:440-460)."""
    fac = _cfg_get(cfg, "fac", 1.0)
    from hyperreel_tpu.ops.rotation import axis_angle_to_matrix

    def act(x, ctx=None):
        w = x[..., :3] * fac
        t = x[..., 3:6] * fac
        R = axis_angle_to_matrix(w)
        return jnp.concatenate(
            [R.reshape(x.shape[:-1] + (9,)), t], -1)

    return act


activation_map = {
    "identity": make_identity,
    "sigmoid": make_sigmoid,
    "probs": make_probs,
    "sparse_magnitude": make_sparse_magnitude,
    "row_l1_norm": make_row_l1_norm,
    "row_linf_norm": make_row_linf_norm,
    "row_l2_norm_z_only": make_row_l2_norm_z_only,
    "twist_to_matrix": make_twist_to_matrix,
    "axis_angle_translation": make_axis_angle_translation,
    "softplus": make_softplus,
    "tanh": make_tanh,
    "identity_tanh": make_identity_tanh,
    "relu": make_relu,
    "leaky_relu": make_leaky_relu,
    "abs": make_abs,
    "zero": make_zero,
    "power": make_power,
    "softmax": make_softmax,
    "l1_norm": make_l1_norm,
    "l2_norm": make_l2_norm,
    "row_l2_norm": make_row_l2_norm,
    "gaussian": make_gaussian,
    "ease_value": make_ease_value,
    "interp_value": make_interp_value,
    "alpha": make_alpha,
    "rgba": make_rgba,
}


def get_activation(cfg):
    """str or {'type': ...} config -> activation fn(x, ctx)
    (reference nlf/activations.py:566-570)."""
    if cfg is None:
        return make_identity("identity")
    if isinstance(cfg, str):
        return activation_map[cfg](cfg)
    return activation_map[cfg["type"]](cfg)
