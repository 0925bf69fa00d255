"""Positional encodings (reference: nlf/pe.py).

Each factory returns an object with `.out_channels` and `.apply(x, ctx)`.
Frequency windows are computed from the traced iteration ``ctx.it`` with the
cosine-annealed schedule of WindowedPE (nlf/pe.py:130-224), so the encoder is
a single jit-stable function.
"""

import numpy as np
import jax.numpy as jnp

from dataclasses import dataclass, field
from typing import Callable, List, Tuple


@dataclass
class PE:
    in_channels: int
    out_channels: int
    apply: Callable  # (x, ctx) -> encoded


def identity_pe(in_channels, cfg=None):
    return PE(in_channels, in_channels, lambda x, ctx=None: x)


def _cos_window(cur, start, end, ceil=False):
    """Cosine window in [0,1] over [start, end) as a fn of traced `cur`."""
    if end - start <= 0:
        return jnp.where(cur >= start, 1.0, 0.0)
    alpha = jnp.clip((cur - start) / (end - start), 0.0, 1.0)
    w = (1.0 - jnp.cos(np.pi * alpha)) / 2.0
    if ceil:
        w = jnp.ceil(w)
    return w


def windowed_pe(in_channels, cfg):
    """WindowedPE (reference nlf/pe.py:130-224).

    freq bands: fm ** linspace(1, n, n). Per-frequency windows over
    [window_after*j + wait, window_after*(j+1) + wait) where
    window_after = max_freq_iter / n_freqs; weight 1 everywhere when
    max_freq_iter == 0.
    """
    n_freqs = int(cfg.get("n_freqs", 0))
    wait = float(cfg.get("wait_iters", 0))
    max_freq_iter = float(cfg.get("max_freq_iter", 0))
    freq_mult = float(cfg.get("freq_multiplier", 2.0))
    base_mult = float(cfg.get("base_multiplier", 1.0))
    ceil = bool(cfg.get("ceil", False))
    exclude_identity = bool(cfg.get("exclude_identity", False))
    window_identity = 1 if cfg.get("window_identity", False) else 0

    freq_bands = freq_mult ** np.linspace(1.0, n_freqs, n_freqs) if n_freqs else []

    # window intervals per frequency index (static python floats)
    windows: List[Tuple[float, float]] = []
    explicit = cfg.get("window_iters", None)
    eff_max_freq = max_freq_iter
    if max_freq_iter > 0 or explicit is not None:
        window_after = max_freq_iter / n_freqs if n_freqs else 0.0
        if explicit is not None:
            windows = [tuple(w) for w in explicit]
            eff_max_freq = float(np.max(np.asarray(explicit)))
        elif window_identity:
            windows = [(wait, window_after + wait)] + [
                (window_after * i + wait, window_after * (i + 1) + wait)
                for i in range(1, n_freqs + 1)
            ]
            eff_max_freq = (n_freqs + 1) * window_after
        else:
            windows = [
                (window_after * i + wait, window_after * (i + 1) + wait)
                for i in range(n_freqs)
            ]

    out_channels = in_channels * (2 * n_freqs + (0 if exclude_identity else 1))

    def weight(j, it):
        # reference nlf/pe.py:190-209
        if j < 0:
            return jnp.asarray(1.0)
        cur = it.astype(jnp.float32) - wait
        if eff_max_freq == 0:
            return jnp.where(cur < 0.0, 0.0, 1.0)
        w0, w1 = windows[j]
        w = _cos_window(it.astype(jnp.float32) - wait, w0 - wait, w1 - wait, ceil)
        w = jnp.where(cur < 0.0, 0.0, w)
        return jnp.where(it.astype(jnp.float32) > eff_max_freq, 1.0, w)

    def apply(x, ctx=None):
        out = [] if exclude_identity else [x]
        for j, freq in enumerate(freq_bands):
            w = weight(j + window_identity, ctx.it) if ctx is not None else 1.0
            arg = base_mult * freq * x
            out.append(w * jnp.sin(arg))
            out.append(w * jnp.cos(arg))
        if not out:
            return x[..., :0]
        return jnp.concatenate(out, -1)

    return PE(in_channels, out_channels, apply)


def basic_pe(in_channels, cfg):
    """Plain sin/cos PE with interleaved frequency layout
    (reference nlf/pe.py:40-70: sin(all freqs) then cos(all freqs))."""
    n_freqs = int(cfg.get("n_freqs", 0))
    freq_mult = float(cfg.get("freq_multiplier", 2.0))
    freq_bands = jnp.asarray(freq_mult ** np.linspace(1.0, n_freqs, n_freqs),
                             jnp.float32)
    out_channels = in_channels * (2 * n_freqs + 1)

    def apply(x, ctx=None):
        out = [x]
        if n_freqs > 0:
            arg = (freq_bands[None] * x[..., None]).reshape(x.shape[:-1] + (-1,))
            out += [jnp.sin(arg), jnp.cos(arg)]
        return jnp.concatenate(out, -1)

    return PE(in_channels, out_channels, apply)


def random_pe(in_channels, cfg):
    """Gaussian random Fourier features (reference nlf/pe.py:263-296)."""
    n_freqs = int(cfg.get("n_freqs", 0))
    sigma = float(cfg.get("sigma", 1.0))
    seed = int(cfg.get("seed", 0))
    rng = np.random.default_rng(seed)
    B = jnp.asarray(rng.standard_normal((in_channels, n_freqs)) * sigma,
                    jnp.float32)
    out_channels = in_channels + 2 * n_freqs

    def apply(x, ctx=None):
        proj = 2.0 * np.pi * (x @ B)
        return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], -1)

    return PE(in_channels, out_channels, apply)


def select_pe(in_channels, cfg):
    """Apply an inner PE to a channel slice; passthrough or discard the rest
    (reference nlf/pe.py:227-260)."""
    start = int(cfg.get("select_start", 0))
    end = int(cfg.get("select_end", in_channels))
    discard = bool(cfg.get("discard", False))
    inner = pe_dict[cfg["pe"]["type"]](end - start, cfg["pe"])
    rest = 0 if discard else (in_channels - (end - start))
    out_channels = inner.out_channels + rest

    def apply(x, ctx=None):
        sel = inner.apply(x[..., start:end], ctx)
        if discard:
            return sel
        return jnp.concatenate([x[..., :start], sel, x[..., end:]], -1)

    return PE(in_channels, out_channels, apply)


def windowed_random_pe(in_channels, cfg):
    """Gaussian random Fourier features with the windowed annealing schedule
    (reference nlf/pe.py:298+)."""
    n_freqs = int(cfg.get("n_freqs", 0))
    sigma = float(cfg.get("sigma", 1.0))
    seed = int(cfg.get("seed", 0))
    wait = float(cfg.get("wait_iters", 0))
    max_freq_iter = float(cfg.get("max_freq_iter", 0))
    rng = np.random.default_rng(seed)
    B = jnp.asarray(rng.standard_normal((in_channels, n_freqs)) * sigma,
                    jnp.float32)
    # order features by frequency magnitude so the window anneals low->high
    order = np.argsort(np.linalg.norm(np.asarray(B), axis=0))
    B = B[:, order]
    out_channels = in_channels + 2 * n_freqs

    def apply(x, ctx=None):
        proj = 2.0 * np.pi * (x @ B)
        if ctx is not None and max_freq_iter > 0:
            it = ctx.it.astype(jnp.float32) - wait
            alpha = jnp.clip(it / max_freq_iter, 0.0, 1.0) * n_freqs
            j = jnp.arange(n_freqs, dtype=jnp.float32)
            w = (1.0 - jnp.cos(
                np.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0
            proj_sin = jnp.sin(proj) * w
            proj_cos = jnp.cos(proj) * w
        else:
            proj_sin, proj_cos = jnp.sin(proj), jnp.cos(proj)
        return jnp.concatenate([x, proj_sin, proj_cos], -1)

    return PE(in_channels, out_channels, apply)


class LearnablePE:
    """Learnable frequency bank (reference nlf/pe.py:398+): the projection
    matrix is a parameter. Unlike the closure-PEs this one owns params; the
    RayPredictionEmbedding initializes/threads them when present."""

    def __init__(self, in_channels, cfg):
        self.in_channels = in_channels
        self.n_freqs = int(cfg.get("n_freqs", 0))
        self.sigma = float(cfg.get("sigma", 1.0))
        self.out_channels = in_channels + 2 * self.n_freqs
        self._param_key = cfg.get("param_key", "learnable_pe")

    def init(self, key):
        return {"B": jax.random.normal(
            key, (self.in_channels, self.n_freqs)) * self.sigma}

    def apply(self, x, ctx=None, params=None):
        if params is None:
            # degenerate to identity features when params aren't threaded
            pad = jnp.zeros(x.shape[:-1] + (2 * self.n_freqs,), x.dtype)
            return jnp.concatenate([x, pad], -1)
        proj = 2.0 * np.pi * (x @ params["B"])
        return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], -1)


import jax  # noqa: E402

pe_dict = {
    "basic": basic_pe,
    "windowed": windowed_pe,
    "windowed_random": windowed_random_pe,
    "learnable": LearnablePE,
    "identity": lambda c, cfg=None: identity_pe(c, cfg),
    "random": random_pe,
    "select": select_pe,
}


def get_pe(in_channels, cfg):
    if cfg is None:
        return identity_pe(in_channels)
    return pe_dict[cfg["type"]](in_channels, cfg)
