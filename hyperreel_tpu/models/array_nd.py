"""Generic learned N-D arrays with multilinear interpolation and the
tensor-product/concat/reduce net family (reference: nlf/nets/array_nd.py,
nlf/nets/tensor.py). Registered for parity; no shipped config uses them
(SURVEY.md §2.10).

Config surface mirrors the reference yamls: `input_channels`, `size`
(coordinate order, stored reversed), `range` (per-dim [lo, hi]),
`activation`, `group` (color-group arrays init uniform(-1, 1), others
uniform(-0.01, 0.01), reference array_nd.py:66-70). Sampling matches
torch grid_sample align_corners=False via a coordinate pre-warp onto the
align_corners=True kernels in ops/grid_sample.py; out-of-range points
contribute zeros (the reference pushes them to 1e8 -> zero padding).

Known reference quirks, preserved deliberately or documented:
  * nlf/nets/tensor.py TensorConcat references undefined attributes
    (`self.input_channels`, `self.out_channels = self.out_channels`) and
    would crash if instantiated — here it is implemented as the evidently
    intended per-tensor feature concat + basis mean.
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.models.mlp import build_net
from hyperreel_tpu.ops.grid_sample import (
    grid_sample_1d, grid_sample_2d, grid_sample_3d)


def _warp_align_corners_false(norm, size):
    """Map align_corners=False normalized coords onto the
    align_corners=True samplers: pixel = ((c + 1) * S - 1) / 2 must equal
    (c' + 1) / 2 * (S - 1)."""
    out = []
    for d, s in enumerate(size):
        if s <= 1:
            out.append(norm[..., d])
        else:
            out.append(((norm[..., d] + 1.0) * s - 1.0) / (s - 1.0) - 1.0)
    return jnp.stack(out, -1)


def _group_init(key, shape, group):
    if group == "color":
        return jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    return jax.random.uniform(key, shape, minval=-0.01, maxval=0.01)


def _sample(grid, norm, size):
    """Multilinear sample with align_corners=False semantics; norm in
    [-1, 1] coordinate order (x, y[, z]); grid channel-last reversed."""
    warped = _warp_align_corners_false(norm, size)
    if len(size) == 1:
        return grid_sample_1d(grid, warped[..., 0])
    if len(size) == 2:
        return grid_sample_2d(grid, warped)
    return grid_sample_3d(grid, warped)


@dataclass
class ArrayND:
    """Dense N-D feature grid queried by multilinear interpolation with
    channel selection and range normalization
    (reference nlf/nets/array_nd.py:24-120)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 3

    def __post_init__(self):
        cfg = self.cfg
        self.group = cfg.get("group", "color")
        self.input_channels = list(
            cfg.get("input_channels", range(self.in_channels)))
        self.n_dims = len(self.input_channels)
        assert self.n_dims in (1, 2, 3), "ArrayND supports 1-3 dims"
        # reference key is `size` (coordinate order); keep the round-1
        # `resolution` spelling as an alias
        self.size = list(cfg.get("size", cfg.get("resolution",
                                                 [64] * self.n_dims)))
        rng = cfg.get("range")
        if rng is not None:
            rng = np.asarray(rng, np.float32).reshape(self.n_dims, 2)
            self.min_range = jnp.asarray(rng[:, 0])
            self.max_range = jnp.asarray(rng[:, 1])
        else:
            self.min_range = jnp.asarray(
                cfg.get("min_range", [-1.0] * self.n_dims), jnp.float32)
            self.max_range = jnp.asarray(
                cfg.get("max_range", [1.0] * self.n_dims), jnp.float32)
        self.out_layer = get_activation(cfg.get("activation", "identity"))

    def init(self, key):
        shape = tuple(reversed(self.size)) + (self.out_channels,)
        return {"grid": _group_init(key, shape, self.group)}

    def apply(self, params, x, ctx=None):
        coords = x[..., self.input_channels]
        norm = (coords - self.min_range) / (self.max_range - self.min_range)
        norm = norm * 2.0 - 1.0
        oob = jnp.any((norm < -1.0) | (norm > 1.0), -1, keepdims=True)
        out = _sample(params["grid"], norm, self.size)
        return self.out_layer(jnp.where(oob, 0.0, out), ctx)


@dataclass
class ArrayNDMultiple:
    """`num_factors` stacked factor grids sharing one parameter, each with
    its own coordinate range; factor outputs combine by product or concat
    (reference nlf/nets/array_nd.py:122-268). Stored as a leading factor
    axis instead of the reference's row-offset packing — same math,
    pytree-friendly."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 3

    def __post_init__(self):
        cfg = self.cfg
        self.group = cfg.get("group", "color")
        self.num_factors = int(cfg.get("num_factors", 1))
        self.input_channels = list(cfg.get("input_channels"))
        self.size = list(cfg.get("size"))
        self.dims_per_factor = len(self.size)
        assert len(self.input_channels) == \
            self.num_factors * self.dims_per_factor
        rng = np.asarray(cfg.get("range"), np.float32).reshape(
            self.num_factors, self.dims_per_factor, 2)
        self.min_range = jnp.asarray(rng[..., 0])
        self.max_range = jnp.asarray(rng[..., 1])
        self.product_mode = cfg.get("product_mode", "product")
        self.out_layer = get_activation(cfg.get("activation", "identity"))

    def init(self, key):
        shape = (self.num_factors,) + tuple(reversed(self.size)) \
            + (self.out_channels,)
        return {"grid": _group_init(key, shape, self.group)}

    def apply(self, params, x, ctx=None):
        coords = x[..., self.input_channels].reshape(
            x.shape[:-1] + (self.num_factors, self.dims_per_factor))
        norm = (coords - self.min_range) / (self.max_range - self.min_range)
        norm = norm * 2.0 - 1.0
        # joint mask: any OOB coordinate zeroes the whole sample
        # (reference pushes all factors to 1e8, array_nd.py:206-233)
        oob = jnp.any((norm < -1.0) | (norm > 1.0), (-2, -1),
                      keepdims=False)[..., None]
        feats = [_sample(params["grid"][f], norm[..., f, :], self.size)
                 for f in range(self.num_factors)]
        if self.product_mode == "product":
            out = feats[0]
            for f in feats[1:]:
                out = out * f
        else:  # concat
            out = jnp.concatenate(feats, -1)
        return self.out_layer(jnp.where(oob, 0.0, out), ctx)


@dataclass
class ArrayNDSubdivided:
    """Voxel-grid-subdivided 2D feature arrays: the first three input
    coordinates select a voxel cell; each cell owns a (size/grid_size)
    tile in one big array, indexed by local wrapped coordinates
    (reference nlf/nets/array_nd.py:269-399)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 3

    def __post_init__(self):
        cfg = self.cfg
        self.group = cfg.get("group", "color")
        self.input_channels = list(cfg.get("input_channels"))[:2]
        self.size = list(cfg.get("size"))
        if len(self.size) == 1:
            self.size = self.size + [1]
        rng = np.asarray(cfg.get("range"), np.float32)
        self.min_range = jnp.asarray(rng[:, 0])
        self.max_range = jnp.asarray(rng[:, 1])
        self.grid_size = list(cfg.get("grid_size"))
        self.n_cells = int(np.prod(self.grid_size))
        self.tensor_size = [
            self.size[i] // self.grid_size[self.input_channels[i]]
            for i in range(2)]
        self.out_layer = get_activation(cfg.get("activation", "identity"))

    def init(self, key):
        # [n_cells, th, tw, C]: per-voxel tiles (reference packs them along
        # one axis of a single tensor; a leading cell axis is equivalent)
        shape = (self.n_cells, self.tensor_size[1], self.tensor_size[0],
                 self.out_channels)
        return {"grid": _group_init(key, shape, self.group)}

    def apply(self, params, x, ctx=None):
        gs = jnp.asarray(self.grid_size, jnp.float32)
        xyz = jnp.clip(x[..., :3], self.min_range, self.max_range)
        vox = jnp.floor(
            (xyz - self.min_range) / (self.max_range - self.min_range) * gs)
        vox = jnp.clip(vox, 0, gs - 1)
        cell = (vox[..., 2] * self.grid_size[0] * self.grid_size[1]
                + vox[..., 1] * self.grid_size[0]
                + vox[..., 0]).astype(jnp.int32)

        coords = x[..., self.input_channels]
        lo = self.min_range[jnp.asarray(self.input_channels)]
        hi = self.max_range[jnp.asarray(self.input_channels)]
        u = (coords - lo) / (hi - lo)
        oob = jnp.any((u < 0.0) | (u > 1.0), -1, keepdims=True)
        size = jnp.asarray(self.size[:2], jnp.float32)
        tsize = jnp.asarray(self.tensor_size, jnp.float32)
        local = jnp.remainder(u * size, tsize) / tsize * 2.0 - 1.0

        tiles = params["grid"][cell]                 # [..., th, tw, C]
        # per-sample tile sampling via vmap'd bilinear lookup
        flat_tiles = tiles.reshape((-1,) + tiles.shape[-3:])
        flat_local = local.reshape(-1, 2)
        out = jax.vmap(
            lambda g, c: _sample(g, c[None], self.tensor_size)[0])(
                flat_tiles, flat_local)
        out = out.reshape(x.shape[:-1] + (self.out_channels,))
        return self.out_layer(jnp.where(oob, 0.0, out), ctx)


def _build_array(tc, in_channels, out_channels, group):
    tc = dict(tc)
    tc.setdefault("group", group)
    t = tc.get("type", "array_nd")
    cls = array_dict[t]
    return cls(cfg=tc, in_channels=in_channels, out_channels=out_channels)


@dataclass
class TensorProduct:
    """Product of coefficient arrays with optional basis MLP and a split
    color/opacity basis (reference nlf/nets/tensor.py:21-141)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.group = cfg.get("group", "color")
        self.num_basis = int(cfg.get("num_basis", 8))
        self.use_opacity = "num_opacity_basis" in cfg
        self.num_opacity_basis = int(
            cfg.get("num_opacity_basis", self.num_basis))
        self.out_layer = get_activation(cfg.get("activation", "identity"))
        self.has_basis = "basis" in cfg
        if self.has_basis:
            basis_out = (self.num_basis * (self.out_channels - 1)
                         + self.num_opacity_basis)
            self.basis_net = build_net(self.in_channels, basis_out,
                                       dict(cfg["basis"]))
            t_out = (self.num_basis + self.num_opacity_basis
                     if self.use_opacity else self.num_basis)
        else:
            self.basis_net = None
            t_out = (self.num_basis * (self.out_channels - 1)
                     + self.num_opacity_basis)
        tensors = cfg.get("tensors", {})
        items = tensors.items() if isinstance(tensors, dict) \
            else enumerate(tensors)
        self.arrays = [_build_array(tc, self.in_channels, t_out, self.group)
                       for _, tc in items]

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays) + 1)
        p = {f"array_{i}": a.init(k)
             for i, (a, k) in enumerate(zip(self.arrays, keys))}
        if self.basis_net is not None:
            p["basis"] = self.basis_net.init(keys[-1])
        return p

    def apply(self, params, x, ctx=None):
        B = x.shape[0]
        coeffs = None
        for i, a in enumerate(self.arrays):
            f = a.apply(params[f"array_{i}"], x, ctx)
            coeffs = f if coeffs is None else coeffs * f
        coeffs = coeffs[..., None]                       # [B, T, 1]

        if self.has_basis:
            basis = self.basis_net.apply(params["basis"], x, ctx)
            if self.use_opacity:
                color_basis = basis[..., :-self.num_opacity_basis].reshape(
                    B, self.num_basis, self.out_channels - 1)
                opacity_basis = jnp.ones((B, self.num_opacity_basis, 1))
                color_coeffs = coeffs[..., :-self.num_opacity_basis, :]
                opacity_coeffs = coeffs[..., -self.num_opacity_basis:, :]
            else:
                basis = basis.reshape(B, self.num_basis, self.out_channels)
        else:
            if self.use_opacity:
                color_coeffs = coeffs[..., :-self.num_opacity_basis, :] \
                    .reshape(B, self.num_basis, self.out_channels - 1)
                opacity_coeffs = coeffs[..., -self.num_opacity_basis:, :] \
                    .reshape(B, self.num_opacity_basis, 1)
                color_basis = jnp.ones_like(color_coeffs)
                opacity_basis = jnp.ones_like(opacity_coeffs)
            else:
                coeffs = coeffs.reshape(B, self.num_basis,
                                        self.out_channels)
                basis = jnp.ones_like(coeffs)

        if self.use_opacity:
            color = self.out_layer((color_coeffs * color_basis).mean(1),
                                   ctx)
            opacity = self.out_layer(
                (opacity_coeffs * opacity_basis).mean(1), ctx)
            return jnp.concatenate([color, opacity], -1)
        return self.out_layer((coeffs * basis).mean(1), ctx)


@dataclass
class TensorPassthrough:
    """Holds several arrays, forwards through the first
    (reference nlf/nets/tensor.py:213-244)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        tensors = self.cfg.get("tensors", {})
        items = tensors.items() if isinstance(tensors, dict) \
            else enumerate(tensors)
        self.arrays = [_build_array(tc, self.in_channels,
                                    self.out_channels,
                                    self.cfg.get("group", "color"))
                       for _, tc in items]

    def init(self, key):
        keys = jax.random.split(key, max(len(self.arrays), 1))
        return {f"array_{i}": a.init(k)
                for i, (a, k) in enumerate(zip(self.arrays, keys))}

    def apply(self, params, x, ctx=None):
        return self.arrays[0].apply(params["array_0"], x, ctx)


@dataclass
class TensorConcat:
    """Per-tensor feature concat + shared-basis mean (reference
    nlf/nets/tensor.py:144-210 — the reference class references undefined
    attributes and cannot run; this is the evidently intended math:
    each tensor emits [num_basis, features+extra]; features concat, the
    extra channels multiply across tensors, all basis-averaged)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.group = cfg.get("group", "color")
        self.num_basis = int(cfg.get("num_basis", 8))
        tensors = cfg.get("tensors", {})
        items = list(tensors.items() if isinstance(tensors, dict)
                     else enumerate(tensors))
        self.num_tensors = max(len(items), 1)
        self.num_features = self.out_channels // self.num_tensors
        self.num_extra = (self.out_channels
                          - self.num_features * self.num_tensors)
        self.out_layer = get_activation(cfg.get("activation", "identity"))
        t_out = self.num_basis * (self.num_features + self.num_extra)
        self.arrays = [_build_array(tc, self.in_channels, t_out, self.group)
                       for _, tc in items]

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays))
        return {f"array_{i}": a.init(k)
                for i, (a, k) in enumerate(zip(self.arrays, keys))}

    def apply(self, params, x, ctx=None):
        B = x.shape[0]
        outputs = []
        extras = []
        for i, a in enumerate(self.arrays):
            cur = a.apply(params[f"array_{i}"], x, ctx).reshape(
                B, self.num_basis, self.num_features + self.num_extra)
            outputs.append(cur[..., :self.num_features])
            extras.append(cur[..., self.num_features:])
        out = jnp.concatenate(outputs, -1).mean(1)       # [B, F*T]
        if self.num_extra > 0:
            ex = extras[0]
            for e in extras[1:]:
                ex = ex * e
            out = jnp.concatenate([out, ex.mean(1)], -1)
        return self.out_layer(out, ctx)


@dataclass
class TensorReduce:
    """Sum/mean/prod over sub-tensors (reference nlf/nets/tensor.py:343+,
    simplified: the reference's partition/over-composite modes belong to
    the subdivided NLF models, which are out of shipped-config scope)."""

    cfg: dict
    in_channels: int = 4
    out_channels: int = 4

    def __post_init__(self):
        cfg = self.cfg
        self.reduce = cfg.get("reduce", "mean")
        self.out_layer = get_activation(cfg.get("activation", "identity"))
        tensors = cfg.get("tensors", {})
        items = tensors.items() if isinstance(tensors, dict) \
            else enumerate(tensors)
        self.arrays = [_build_array(tc, self.in_channels,
                                    self.out_channels,
                                    cfg.get("group", "color"))
                       for _, tc in items]

    def init(self, key):
        keys = jax.random.split(key, len(self.arrays))
        return {f"array_{i}": a.init(k)
                for i, (a, k) in enumerate(zip(self.arrays, keys))}

    def apply(self, params, x, ctx=None):
        feats = jnp.stack([a.apply(params[f"array_{i}"], x, ctx)
                           for i, a in enumerate(self.arrays)], 0)
        if self.reduce == "sum":
            out = jnp.sum(feats, 0)
        elif self.reduce == "mean":
            out = jnp.mean(feats, 0)
        elif self.reduce == "prod":
            out = jnp.prod(feats, 0)
        else:
            raise ValueError(self.reduce)
        return self.out_layer(out, ctx)


array_dict = {
    "array_nd": ArrayND,
    "array_nd_multiple": ArrayNDMultiple,
    "array_nd_subdivided": ArrayNDSubdivided,
}

tensor_dict = {
    "tensor_product": TensorProduct,
    "tensor_concat": TensorConcat,
    "tensor_passthrough": TensorPassthrough,
    "tensor_reduce": TensorReduce,
}
