"""Loss registry (reference: losses.py:11-165)."""

import jax
import jax.numpy as jnp


def mse_loss(cfg=None):
    def fn(inputs, targets, **kw):
        return jnp.mean((inputs - targets) ** 2)

    return fn


def mae_loss(cfg=None):
    def fn(inputs, targets, **kw):
        return jnp.mean(jnp.abs(inputs - targets))

    return fn


def huber_loss(cfg=None):
    delta = float(cfg.get("delta", 1.0)) if cfg else 1.0

    def fn(inputs, targets, **kw):
        err = inputs - targets
        abs_err = jnp.abs(err)
        quad = jnp.minimum(abs_err, delta)
        return jnp.mean(0.5 * quad ** 2 + delta * (abs_err - quad))

    return fn


def weighted_mse_loss(cfg=None):
    def fn(inputs, targets, weights=None, **kw):
        se = (inputs - targets) ** 2
        if weights is None:
            return jnp.mean(se)
        return jnp.mean(se * weights)

    return fn


def weighted_mae_loss(cfg=None):
    def fn(inputs, targets, weights=None, **kw):
        ae = jnp.abs(inputs - targets)
        if weights is None:
            return jnp.mean(ae)
        return jnp.mean(ae * weights)

    return fn


def mse_top_n_loss(cfg=None):
    """Mean over the N largest per-element errors
    (reference losses.py:108-129)."""
    frac = float(cfg.get("frac", 1.0)) if cfg else 1.0

    def fn(inputs, targets, **kw):
        se = ((inputs - targets) ** 2).reshape(-1)
        n = max(int(se.shape[0] * frac), 1)
        top = jax.lax.top_k(se, n)[0]
        return jnp.mean(top)

    return fn


def mae_top_n_loss(cfg=None):
    frac = float(cfg.get("frac", 1.0)) if cfg else 1.0

    def fn(inputs, targets, **kw):
        ae = jnp.abs(inputs - targets).reshape(-1)
        n = max(int(ae.shape[0] * frac), 1)
        top = jax.lax.top_k(ae, n)[0]
        return jnp.mean(top)

    return fn


def complex_mse_loss(cfg=None):
    def fn(inputs, targets, **kw):
        d = inputs - targets
        return jnp.mean(jnp.real(d * jnp.conj(d)))

    return fn


def complex_mae_loss(cfg=None):
    def fn(inputs, targets, **kw):
        return jnp.mean(jnp.abs(inputs - targets))

    return fn


def tv_loss(cfg=None):
    def fn(inputs, targets=None, **kw):
        h = jnp.mean((inputs[..., 1:, :] - inputs[..., :-1, :]) ** 2)
        w = jnp.mean((inputs[..., :, 1:] - inputs[..., :, :-1]) ** 2)
        return h + w

    return fn


loss_dict = {
    "mse": mse_loss,
    "mae": mae_loss,
    "huber": huber_loss,
    "weighted_mse": weighted_mse_loss,
    "weighted_mae": weighted_mae_loss,
    "mse_top_n": mse_top_n_loss,
    "mae_top_n": mae_top_n_loss,
    "complex_mse": complex_mse_loss,
    "complex_mae": complex_mae_loss,
    "tv": tv_loss,
}


def get_loss(cfg):
    if cfg is None:
        return mse_loss()
    if isinstance(cfg, str):
        return loss_dict[cfg]()
    return loss_dict[cfg["type"]](cfg)
