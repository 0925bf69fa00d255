"""Generic learned N-D arrays with multilinear interpolation and the
tensor-product/concat/reduce net family (reference: nlf/nets/array_nd.py,
nlf/nets/tensor.py). Registered for parity; no shipped config uses them
(SURVEY.md §2.10).
"""

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.mlp import build_net
from hyperreel_tpu.ops.grid_sample import (
    grid_sample_1d, grid_sample_2d, grid_sample_3d)


@dataclass
class ArrayND:
    """Dense N-D feature grid queried by multilinear interpolation with
    channel selection and range normalization
    (reference nlf/nets/array_nd.py:24-118)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 3

    def __post_init__(self):
        cfg = self.cfg
        self.input_channels = list(
            cfg.get("input_channels", range(self.in_channels)))
        self.n_dims = len(self.input_channels)
        assert self.n_dims in (1, 2, 3), "ArrayND supports 1-3 dims"
        self.resolution = list(cfg.get("resolution",
                                       [64] * self.n_dims))
        self.min_range = jnp.asarray(
            cfg.get("min_range", [-1.0] * self.n_dims), jnp.float32)
        self.max_range = jnp.asarray(
            cfg.get("max_range", [1.0] * self.n_dims), jnp.float32)
        self.init_scale = float(cfg.get("init_scale", 0.1))

    def init(self, key):
        shape = tuple(reversed(self.resolution)) + (self.out_channels,)
        return {"grid": self.init_scale * jax.random.normal(key, shape)}

    def apply(self, params, x, ctx=None):
        coords = x[..., self.input_channels]
        norm = (coords - self.min_range) / (self.max_range - self.min_range)
        norm = norm * 2.0 - 1.0
        # out-of-range -> zero contribution (reference masks via 1e8 coords)
        oob = jnp.any((norm < -1.0) | (norm > 1.0), -1, keepdims=True)
        if self.n_dims == 1:
            out = grid_sample_1d(params["grid"], norm[..., 0])
        elif self.n_dims == 2:
            out = grid_sample_2d(params["grid"], norm)
        else:
            out = grid_sample_3d(params["grid"], norm)
        return jnp.where(oob, 0.0, out)


@dataclass
class TensorProduct:
    """Product of per-axis coefficient grids with split color/opacity basis
    counts (reference nlf/nets/tensor.py:21-138)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.n_basis = int(cfg.get("num_basis", 8))
        self.tensors_cfg = cfg.get("tensors", [])
        self.arrays = [
            ArrayND(cfg=dict(tc), in_channels=self.in_channels,
                    out_channels=self.n_basis * self.out_channels)
            for tc in self.tensors_cfg
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays))
        return {f"array_{i}": a.init(k)
                for i, (a, k) in enumerate(zip(self.arrays, keys))}

    def apply(self, params, x, ctx=None):
        prod = None
        for i, a in enumerate(self.arrays):
            f = a.apply(params[f"array_{i}"], x, ctx)
            prod = f if prod is None else prod * f
        prod = prod.reshape(x.shape[:-1] + (self.n_basis, self.out_channels))
        return jnp.sum(prod, -2)


@dataclass
class TensorConcat:
    """Concatenation of sub-array features + fusion MLP
    (reference nlf/nets/tensor.py:144-210)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.feat_channels = int(cfg.get("feature_channels", 16))
        self.arrays = [
            ArrayND(cfg=dict(tc), in_channels=self.in_channels,
                    out_channels=self.feat_channels)
            for tc in cfg.get("tensors", [])
        ]
        total = self.feat_channels * len(self.arrays)
        self.net = build_net(total, self.out_channels,
                             dict(cfg.get("net", {"type": "base",
                                                  "depth": 2,
                                                  "hidden_channels": 64})))

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays) + 1)
        p = {f"array_{i}": a.init(k)
             for i, (a, k) in enumerate(zip(self.arrays, keys))}
        p["net"] = self.net.init(keys[-1])
        return p

    def apply(self, params, x, ctx=None):
        feats = [a.apply(params[f"array_{i}"], x, ctx)
                 for i, a in enumerate(self.arrays)]
        return self.net.apply(params["net"], jnp.concatenate(feats, -1), ctx)


@dataclass
class TensorReduce:
    """Sum/mean/prod over sub-tensors + optional feature net
    (reference nlf/nets/tensor.py:343-556)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.reduce = cfg.get("reduce", "sum")
        self.arrays = [
            ArrayND(cfg=dict(tc), in_channels=self.in_channels,
                    out_channels=self.out_channels)
            for tc in cfg.get("tensors", [])
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays))
        return {f"array_{i}": a.init(k)
                for i, (a, k) in enumerate(zip(self.arrays, keys))}

    def apply(self, params, x, ctx=None):
        feats = jnp.stack([a.apply(params[f"array_{i}"], x, ctx)
                           for i, a in enumerate(self.arrays)], 0)
        if self.reduce == "sum":
            return jnp.sum(feats, 0)
        if self.reduce == "mean":
            return jnp.mean(feats, 0)
        if self.reduce == "prod":
            return jnp.prod(feats, 0)
        raise ValueError(self.reduce)
