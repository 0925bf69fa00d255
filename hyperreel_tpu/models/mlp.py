"""MLP nets (reference: nlf/nets/mlp.py:60-179).

Functional modules: `build()` returns (init, apply). Parameters are plain
dicts of jnp arrays. Weights use the reference's default init
(torch nn.Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so training dynamics
match. The matmul chain runs in `compute_dtype` (bf16 on TPU by default at
call sites that opt in) with f32 params/accumulation.
"""

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.models.pe import get_pe, identity_pe


def _linear_init(key, fan_in, fan_out, bias=True):
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
    return p


def _linear_apply(p, x, compute_dtype=None):
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = x @ w
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


@dataclass
class BaseMLP:
    """Skip-connection MLP (reference nlf/nets/mlp.py:60-179).

    Layer stack: D+2 linears; skips concatenate the (encoded) input; the
    inter-layer activation is applied to layers i < D (+1 when
    linear_last=False). The ray-prediction embedding builds this with
    depth=cfg.depth-2, linear_last=False (reference nlf/embedding/ray.py:283).
    """

    in_channels: int
    out_channels: int
    depth: int
    hidden: int
    skips: List[int] = field(default_factory=list)
    linear_last: bool = True
    bias: bool = True
    activation: str = "identity"
    layer_activation: str = "leaky_relu"
    pe_cfg: Optional[dict] = None
    compute_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        self.pe = get_pe(self.in_channels, self.pe_cfg) if self.pe_cfg else \
            identity_pe(self.in_channels)
        self.net_in = self.pe.out_channels
        self.out_act = get_activation(self.activation)
        self.layer_act = get_activation(self.layer_activation)
        if self.depth == 0:
            self.out_channels = self.in_channels

    def init(self, key):
        if self.depth == 0:
            return {}
        params = {}
        keys = jax.random.split(key, self.depth + 2)
        for i in range(self.depth + 2):
            if i == 0:
                fan_in = self.net_in
                fan_out = self.hidden
            elif i == self.depth + 1:
                fan_in = self.hidden
                fan_out = self.out_channels
            elif i in self.skips:
                fan_in = self.hidden + self.net_in
                fan_out = self.hidden
            else:
                fan_in = self.hidden
                fan_out = self.hidden
            params[f"layer_{i}"] = _linear_init(keys[i], fan_in, fan_out, self.bias)
        return params

    def apply(self, params, x, ctx=None):
        if self.depth == 0:
            return x
        x = self.pe.apply(x, ctx)
        input_x = x
        act_until = self.depth if self.linear_last else self.depth + 1
        for i in range(self.depth + 2):
            if i in self.skips:
                x = jnp.concatenate([input_x.astype(x.dtype), x], -1)
            x = _linear_apply(params[f"layer_{i}"], x, self.compute_dtype)
            if i < act_until:
                x = self.layer_act(x, ctx)
        x = x.astype(jnp.float32)
        return self.out_act(x, ctx)


@dataclass
class ZeroMLP:
    """Constant-zero net (reference nlf/nets/mlp.py:14-33)."""

    in_channels: int
    out_channels: int

    def init(self, key):
        return {}

    def apply(self, params, x, ctx=None):
        return jnp.zeros(x.shape[:-1] + (self.out_channels,), x.dtype)


@dataclass
class ConstantMLP:
    """Learned constant output (reference nlf/nets/mlp.py:36-57)."""

    in_channels: int
    out_channels: int

    def init(self, key):
        return {"value": jnp.zeros((self.out_channels,), jnp.float32)}

    def apply(self, params, x, ctx=None):
        return jnp.broadcast_to(params["value"], x.shape[:-1] + (self.out_channels,))


@dataclass
class Siren:
    """SIREN sine-MLP with omega_0=30 init (reference nlf/nets/siren.py)."""

    in_channels: int
    out_channels: int
    depth: int
    hidden: int
    omega_0: float = 30.0

    def init(self, key):
        params = {}
        keys = jax.random.split(key, self.depth + 2)
        for i in range(self.depth + 2):
            fan_in = self.in_channels if i == 0 else self.hidden
            fan_out = self.out_channels if i == self.depth + 1 else self.hidden
            if i == 0:
                bound = 1.0 / fan_in
            else:
                bound = jnp.sqrt(6.0 / fan_in) / self.omega_0
            wk, bk = jax.random.split(keys[i])
            params[f"layer_{i}"] = {
                "w": jax.random.uniform(wk, (fan_in, fan_out), jnp.float32,
                                        -bound, bound),
                "b": jax.random.uniform(bk, (fan_out,), jnp.float32,
                                        -bound, bound),
            }
        return params

    def apply(self, params, x, ctx=None):
        for i in range(self.depth + 2):
            x = _linear_apply(params[f"layer_{i}"], x)
            if i < self.depth + 1:
                x = jnp.sin(self.omega_0 * x)
        return x


@dataclass
class PartitionedMLP:
    """Independent per-partition MLPs selected by a partition index channel
    (reference nlf/nets/mlp.py PartitionedMLP): all partitions are evaluated
    and the right one selected with a one-hot mask (static shapes)."""

    in_channels: int
    out_channels: int
    depth: int
    hidden: int
    n_partitions: int = 4

    def __post_init__(self):
        self.nets = [
            BaseMLP(self.in_channels, self.out_channels, self.depth,
                    self.hidden)
            for _ in range(self.n_partitions)
        ]

    def init(self, key):
        keys = jax.random.split(key, self.n_partitions)
        return {f"part_{i}": n.init(k)
                for i, (n, k) in enumerate(zip(self.nets, keys))}

    def apply(self, params, x, ctx=None, partition_idx=None):
        if partition_idx is None:
            partition_idx = jnp.zeros(x.shape[:-1], jnp.int32)
        outs = jnp.stack([
            n.apply(params[f"part_{i}"], x, ctx)
            for i, n in enumerate(self.nets)
        ], 0)  # [P, ..., out]
        onehot = jax.nn.one_hot(partition_idx, self.n_partitions,
                                axis=0)  # [P, ...]
        return jnp.sum(outs * onehot[..., None], 0)


@dataclass
class PartitionedConstantMLP:
    """Per-partition learned constants
    (reference nlf/nets/mlp.py PartitionedConstantMLP)."""

    in_channels: int
    out_channels: int
    n_partitions: int = 4

    def init(self, key):
        return {"values": jnp.zeros((self.n_partitions, self.out_channels),
                                    jnp.float32)}

    def apply(self, params, x, ctx=None, partition_idx=None):
        if partition_idx is None:
            partition_idx = jnp.zeros(x.shape[:-1], jnp.int32)
        return params["values"][partition_idx]


@dataclass
class MultipleNet:
    """Cascade of tensor-input nets with wait/stop gating, per-stage
    scales, and FEATURE FEEDBACK (reference nlf/nets/nets.py:36-134):
    stage i consumes [x, features_{i-1}] and emits
    out_feature_dim + feature_dim_i channels; the feature tail feeds the
    next stage; per-stage outputs are scaled and summed over active
    stages; sub-nets see the shifted iteration `it - wait_iters[i]`
    (reference set_iter offset, nets.py:133-134).

    jit semantics: every stage always runs; inactive stages contribute
    zeros (output AND fed-forward features) via where-gates on the traced
    iteration — the static-shape equivalent of the reference's host-side
    `continue`."""

    in_channels: int
    out_channels: int
    cfg: dict
    compute_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        cfg = self.cfg
        nets_cfg = cfg["nets"]
        net_cfgs = list(nets_cfg.values()) if isinstance(nets_cfg, dict) \
            else list(nets_cfg)
        self.wait_iters = [float(nc.get("wait_iters", 0))
                           for nc in net_cfgs]
        self.stop_iters = [float(nc.get("stop_iters", float("inf")))
                           for nc in net_cfgs]
        self.feature_dims = [int(nc.get("feature_dim", 0))
                             for nc in net_cfgs]
        self.scales = [float(nc.get("scale", 1.0)) for nc in net_cfgs]
        self.use_feature_net = bool(cfg.get("feature_net", False))
        self.out_feature_dim = int(
            cfg.get("out_feature_dim", self.out_channels)) \
            if self.use_feature_net else self.out_channels
        self.nets = []
        for i, nc in enumerate(net_cfgs):
            extra_in = self.feature_dims[i - 1] if i > 0 else 0
            self.nets.append(build_net(
                self.in_channels + extra_in,
                self.out_feature_dim + self.feature_dims[i], nc,
                compute_dtype=self.compute_dtype))
        if self.use_feature_net:
            # the reference builds the feature net from the LAST stage's
            # cfg (nets.py:90-98); an explicit dict is also accepted
            fn_cfg = cfg["feature_net"] if isinstance(cfg["feature_net"],
                                                      dict) else net_cfgs[-1]
            self.feature_net = build_net(self.out_feature_dim,
                                         self.out_channels, fn_cfg)
        self.out_act = get_activation(cfg.get("activation", "identity"))

    def init(self, key):
        n_extra = 1 if self.use_feature_net else 0
        keys = jax.random.split(key, len(self.nets) + n_extra)
        params = {f"net_{i}": n.init(k)
                  for i, (n, k) in enumerate(zip(self.nets, keys))}
        if self.use_feature_net:
            params["feature_net"] = self.feature_net.init(keys[-1])
        return params

    def apply(self, params, x, ctx=None):
        total = jnp.zeros(x.shape[:-1] + (self.out_channels,), jnp.float32)
        feats = jnp.zeros(x.shape[:-1] + (0,), x.dtype)
        from dataclasses import replace as dc_replace
        for i, net in enumerate(self.nets):
            ctx_i = dc_replace(
                ctx, it=ctx.it - jnp.int32(self.wait_iters[i])) \
                if ctx is not None else None
            out = net.apply(params[f"net_{i}"],
                            jnp.concatenate([x, feats], -1), ctx_i)
            if self.feature_dims[i] > 0:
                feats = out[..., -self.feature_dims[i]:]
                out = out[..., :-self.feature_dims[i]]
            else:
                feats = jnp.zeros(x.shape[:-1] + (0,), x.dtype)
            if self.use_feature_net:
                out = self.feature_net.apply(params["feature_net"], out,
                                             ctx_i)
            if ctx is not None:
                it_f = ctx.it.astype(jnp.float32)
                gate = ((it_f >= self.wait_iters[i])
                        & (it_f < self.stop_iters[i])).astype(jnp.float32)
            else:
                gate = 1.0
            total = total + out * (gate * self.scales[i])
            feats = feats * gate
        return self.out_act(total, ctx)


def build_net(in_channels, out_channels, cfg, **kwargs):
    """net_dict-style MLP construction from config
    (reference nlf/nets/nets.py:12-136 for the mlp family)."""
    t = cfg.get("type", "base")
    if t == "multiple":
        return MultipleNet(in_channels=in_channels,
                           out_channels=out_channels, cfg=dict(cfg),
                           compute_dtype=kwargs.get("compute_dtype"))
    if t in ("base", "mlp"):
        return BaseMLP(
            in_channels=in_channels,
            out_channels=out_channels,
            depth=int(cfg.get("depth", 6)),
            hidden=int(cfg.get("hidden_channels", 256)),
            skips=list(cfg.get("skips", [])),
            linear_last=bool(cfg.get("linear_last", True)),
            bias=bool(cfg.get("bias", True)),
            activation=cfg.get("activation", "identity"),
            layer_activation=cfg.get("layer_activation", "leaky_relu"),
            pe_cfg=cfg.get("pe", None),
            compute_dtype=kwargs.get("compute_dtype", None),
        )
    if t == "zero":
        return ZeroMLP(in_channels, out_channels)
    if t == "constant":
        return ConstantMLP(in_channels, out_channels)
    if t == "partitioned":
        return PartitionedMLP(in_channels, out_channels,
                              int(cfg.get("depth", 4)),
                              int(cfg.get("hidden_channels", 128)),
                              int(cfg.get("n_partitions", 4)))
    if t == "partitioned_constant":
        return PartitionedConstantMLP(in_channels, out_channels,
                                      int(cfg.get("n_partitions", 4)))
    if t == "siren":
        return Siren(in_channels, out_channels, int(cfg.get("depth", 6)),
                     int(cfg.get("hidden_channels", 256)),
                     float(cfg.get("omega_0", 30.0)))
    # learned-array / tensor-factorization nets share the registry, like
    # the reference's nets.py merging tensor_dict into net_dict
    # (reference nlf/nets/nets.py:12-20); lazy import avoids a cycle
    from hyperreel_tpu.models import array_nd
    if t in array_nd.array_dict:
        return array_nd.array_dict[t](cfg=dict(cfg),
                                      in_channels=in_channels,
                                      out_channels=out_channels)
    if t in array_nd.tensor_dict:
        return array_nd.tensor_dict[t](cfg=dict(cfg),
                                       in_channels=in_channels,
                                       out_channels=out_channels)
    raise ValueError(f"unknown mlp net type {t}")
