"""Capability-parity embedding stages beyond the shipped hot path
(reference: nlf/embedding/ray.py Calibrate*, nlf/embedding/affine.py,
nlf/embedding/feature.py, nlf/embedding/point.py sample-count / reflect
stages).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.models.mlp import build_net, _linear_init, _linear_apply
from hyperreel_tpu.ops.intersect_math import intersect_axis_plane
from hyperreel_tpu.ops.rotation import quaternion_apply


def _normalize(v, axis=-1, eps=1e-12):
    from hyperreel_tpu.ops.intersect_math import safe_norm
    return v / safe_norm(v, axis=axis, keepdims=True, eps=eps)


@dataclass
class CalibrateEmbedding:
    """Learnable per-camera pose (quaternion + translation) and time offsets
    with a pinned constant_id camera (reference nlf/embedding/ray.py:91-210).
    """

    cfg: dict
    num_views: int = 1
    group: str = "calibration"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.use_pose = bool(cfg.get("use_pose", False))
        self.use_time = bool(cfg.get("use_time", False))
        self.constant_id = int(cfg.get("constant_id", 0))
        self.quaternion_activation = get_activation(
            cfg.get("quaternion_activation", "identity"))
        self.translation_activation = get_activation(
            cfg.get("translation_activation", "identity"))
        self.time_activation = get_activation(
            cfg.get("time_activation", "identity"))

    def init(self, key):
        params = {}
        if self.use_pose:
            params["quaternions"] = jnp.zeros((self.num_views, 4), jnp.float32)
            params["translations"] = jnp.zeros((self.num_views, 3), jnp.float32)
        if self.use_time:
            params["time_offsets"] = jnp.zeros((self.num_views, 1), jnp.float32)
        return params

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        rays_o = rays[..., 0:3]
        rays_d = rays[..., 3:6]
        cam = jnp.round(
            rays[..., -2] if rays.shape[-1] > 7 else rays[..., -1]
        ).astype(jnp.int32)

        if self.use_pose:
            q_off = self.quaternion_activation(params["quaternions"], ctx)
            # pin the reference camera (ray.py:162)
            pin = jnp.arange(self.num_views)[:, None] == self.constant_id
            q_off = jnp.where(pin, 0.0, q_off)
            base_q = jnp.zeros((self.num_views, 4)).at[:, 0].set(1.0)
            quats = (base_q + q_off)[cam]
            t_off = self.translation_activation(params["translations"], ctx)
            t_off = jnp.where(pin, 0.0, t_off)[cam]
            rays_d = quaternion_apply(quats, rays_d)
            rays_o = rays_o + t_off
            updated = jnp.concatenate([rays_o, rays_d], -1)
        else:
            updated = rays[..., :6]

        if self.use_time:
            time_off = self.time_activation(params["time_offsets"], ctx)
            pin = jnp.arange(self.num_views)[:, None] == self.constant_id
            time_off = jnp.where(pin, 0.0, time_off)[cam]
            rays_t = rays[..., -1:] + time_off
            rays = jnp.concatenate([updated, rays[..., 6:-1], rays_t], -1)
        else:
            rays = jnp.concatenate([updated, rays[..., 6:]], -1)

        x[self.rays_name] = rays
        return x


@dataclass
class CalibratePlanarEmbedding:
    """Learnable 2D origin offset for planar light fields
    (reference nlf/embedding/ray.py:28-88)."""

    cfg: dict
    group: str = "calibration"

    def __post_init__(self):
        self.rays_name = self.cfg.get("rays_name", "rays")
        self.activation = get_activation(self.cfg.get("activation", "identity"))

    def init(self, key):
        return {"offset": jnp.zeros((1, 2), jnp.float32)}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        rays_o, rays_d = rays[..., :3], rays[..., 3:6]
        t = intersect_axis_plane(rays, 0.0, 2)
        target = rays_o + t[..., None] * rays_d
        offset = self.activation(params["offset"], ctx)
        rays_o = jnp.concatenate([rays_o[..., :2] + offset, rays_o[..., 2:]], -1)
        rays_d = _normalize(target - rays_o)
        x[self.rays_name] = jnp.concatenate([rays_o, rays_d], -1)
        return x


@dataclass
class AffineEmbedding:
    """Single learned linear layer on rays
    (reference nlf/embedding/affine.py:13-32)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.rays_name = self.cfg.get("rays_name", "rays")
        self.in_channels = int(self.cfg.get("in_channels", 6))
        self.out_channels = int(self.cfg.get("out_channels", self.in_channels))

    def init(self, key):
        p = _linear_init(key, self.in_channels, self.out_channels)
        # initialize near identity
        eye = jnp.eye(self.in_channels, self.out_channels)
        return {"w": eye, "b": p["b"] * 0.0}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        out = _linear_apply(params, rays[..., : self.in_channels])
        x[self.rays_name] = jnp.concatenate(
            [out, rays[..., self.in_channels:]], -1)
        return x


@dataclass
class LocalAffineEmbedding:
    """An MLP predicts a per-ray transform applied to the ray's own
    parameterization (reference nlf/embedding/affine.py:35-216)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.param_channels = int(cfg.get("param_channels", 6))
        self.tform_out_channels = int(cfg.get("tform_out_channels",
                                              self.param_channels))
        self.use_bias = bool(cfg.get("use_bias", True))
        out = self.tform_out_channels * self.param_channels + (
            self.tform_out_channels if self.use_bias else 0)
        self.net = build_net(self.param_channels, out, dict(cfg["net"]))

    def init(self, key):
        return {"net": self.net.init(key)}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        pred = self.net.apply(params["net"], rays[..., :self.param_channels],
                              ctx)
        # raw (tform, bias) exposed for the warp regularizers (reference
        # nlf/embedding/affine.py embed_params mode); DCE'd when the
        # "embed_params" field is not requested
        x["embed_params"] = pred
        M = pred[..., : self.tform_out_channels * self.param_channels]
        M = M.reshape(rays.shape[0], self.tform_out_channels,
                      self.param_channels)
        out = jnp.einsum("bij,bj->bi", M, rays[..., :self.param_channels])
        if self.use_bias:
            out = out + pred[..., -self.tform_out_channels:]
        x[self.rays_name] = jnp.concatenate(
            [out, rays[..., self.param_channels:]], -1)
        return x


@dataclass
class FeatureEmbedding:
    """Plain MLP feature lift; depth 0 = identity
    (reference nlf/embedding/feature.py:11-53)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.in_channels = int(cfg.get("in_channels", 6))
        self.out_channels = int(cfg.get("out_channels", 64))
        self.net = build_net(self.in_channels, self.out_channels,
                             dict(cfg.get("net", {"type": "base"})))

    def init(self, key):
        return {"net": self.net.init(key)}

    def apply(self, params, x, ctx, render_kwargs=None):
        x[self.rays_name] = self.net.apply(
            params["net"], x[self.rays_name], ctx)
        return x


@dataclass
class GenerateNumSamplesEmbedding:
    """Train-time random sample count in `sample_range`; static-shape TPU
    realization: the count rides along as a ray feature and SelectPoints
    masks instead of slicing (reference nlf/embedding/point.py:402-449)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.sample_range = tuple(cfg["sample_range"])
        self.inference_samples = int(cfg["inference_samples"])
        self.total_samples = int(cfg["total_samples"])
        self.rays_name = cfg.get("rays_name", "rays")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        if ctx.training:
            lo, hi = self.sample_range
            n = jnp.round(
                jax.random.uniform(jax.random.fold_in(ctx.rng, 404), ()) * (hi - lo) + lo)
        else:
            n = jnp.asarray(float(self.inference_samples))
            # Python int for downstream STATIC slicing at inference
            x["inference_samples_static"] = self.inference_samples
        x["num_samples"] = n
        x["total_samples"] = self.total_samples
        rays = x[self.rays_name]
        x[self.rays_name] = jnp.concatenate(
            [rays, jnp.full_like(rays[..., :1], 1.0) * n], -1)
        return x


@dataclass
class SelectPointsEmbedding:
    """Subselect every k-th sample from all per-sample fields
    (reference nlf/embedding/point.py:452-480).

    Two regimes, both static-shape on TPU:
      * training: samples beyond the (traced) num_samples are masked invalid
        (weights/distances zeroed) rather than sliced out;
      * inference: `inference_samples` (from this stage's cfg or from a
        generate_samples stage upstream) is a PYTHON int, and ctx.training
        is trace-static — so every per-sample field is really sliced
        ``[:, ::stride]``, shrinking all downstream work (gathers are the
        render bottleneck and scale with samples/ray). This is the
        inference-time sample-count control of reference
        nlf/embedding/point.py:402-449.
    """

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.fields = list(self.cfg.get(
            "fields", ["points", "distances", "weights"]))
        isamp = self.cfg.get("inference_samples")
        self.inference_samples = int(isamp) if isamp else None
        # fine-tune-at-target-count mode: slice in TRAINING too, so a
        # short fine-tune adapts the model to the reduced sample budget
        # (the reference trains with randomized counts for the same
        # purpose, nlf/embedding/point.py:402-449; PERFORMANCE.md ladder)
        self.always_slice = bool(self.cfg.get("always_slice", False))
        # "stride" keeps every k-th sample (the reference's arrangement);
        # "first" keeps the first n sorted samples — the compaction mode
        # paired with intersect invalid_sort_far, where valid samples
        # form a nearest-first prefix and first-k drops only padding and
        # the farthest (most-occluded) tail
        self.mode = self.cfg.get("mode", "stride")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        S = x["points"].shape[1]
        if not ctx.training or (self.always_slice
                                and self.inference_samples):
            n = self.inference_samples or x.get("inference_samples_static")
            if not isinstance(n, (int, float)) or not n or n >= S:
                return x
            for k, v in list(x.items()):
                if hasattr(v, "ndim") and v.ndim >= 3 and v.shape[1] == S:
                    if self.mode == "first":
                        x[k] = v[:, :int(n)]
                    else:
                        x[k] = v[:, ::max(S // int(n), 1)]
            return x
        if "num_samples" not in x:
            return x
        n = x["num_samples"]
        total = x.get("total_samples", S)
        # Keep every round(total/n)-th sample. Static-shape realization:
        # every sample j is REPLACED by the next kept sample (clamped to the
        # last kept one), so duplicates land at identical distances, get
        # delta == 0 in the color net's sorted-delta computation, and
        # contribute nothing — the composite over the kept subset is exactly
        # the reference's sliced composite (nlf/embedding/point.py:452-480),
        # including the sentinel last delta landing on (a duplicate of) the
        # last kept sample. Zeroing dropped distances instead would create
        # NEGATIVE deltas for their predecessors.
        stride = jnp.maximum(jnp.round(total / jnp.maximum(n, 1.0)), 1.0)
        j = jnp.arange(S, dtype=jnp.float32)
        last_kept = jnp.floor((S - 1) / stride) * stride
        idx = jnp.minimum(jnp.ceil(j / stride) * stride,
                          last_kept).astype(jnp.int32)
        for k, v in list(x.items()):
            if hasattr(v, "ndim") and v.ndim >= 3 and v.shape[1] == S:
                x[k] = jnp.take(v, idx, axis=1)
        return x


@dataclass
class RandomOffsetEmbedding:
    """Jitter sample points uniformly between neighbors every `frequency`
    iters (reference nlf/embedding/point.py:483-555)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.frequency = int(cfg.get("frequency", 2))
        self.stop_iter = float(cfg.get("stop_iter", float("inf")))
        self.rays_name = cfg.get("rays_name", "rays")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        if not ctx.training:
            return x
        dists = x["distances"][..., 0]
        gaps = jnp.concatenate(
            [dists[:, 1:] - dists[:, :-1],
             jnp.zeros_like(dists[:, :1])], -1)
        u = jax.random.uniform(jax.random.fold_in(ctx.rng, 303), dists.shape)
        jitter = u * gaps
        gate = ((ctx.it % self.frequency) == 0) & (ctx.it < self.stop_iter)
        new_d = jnp.where(gate, dists + jitter, dists)[..., None]
        rays = x[self.rays_name]
        x["distances"] = new_d
        x["points"] = rays[..., None, :3] + rays[..., None, 3:6] * new_d
        return x


@dataclass
class ReflectEmbedding:
    """Reflection rays for RefNeRF-style shading (reference
    nlf/embedding/point.py:673-738): reflect view directions about
    predicted normals, march reflected points by |ref_distance|, with the
    reference's forward_facing / direction_init normal parameterizations
    and the optional predicted direction offset."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.in_points_field = cfg.get("in_points_field", "points")
        self.in_direction_field = cfg.get("in_direction_field", "viewdirs")
        self.in_normal_field = cfg.get("in_normal_field", "normal")
        self.in_distance_field = cfg.get("in_distance_field",
                                         "ref_distance")
        self.direction_offset_field = cfg.get("direction_offset_field",
                                              "ref_viewdirs_offset")
        self.out_points_field = cfg.get("out_points_field", "ref_points")
        self.out_direction_field = cfg.get("out_direction_field",
                                           "ref_viewdirs")
        self.out_normal_field = cfg.get("out_normal_field", "normal")
        self.forward_facing = bool(cfg.get("forward_facing", False))
        self.direction_init = bool(cfg.get("direction_init", False))

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x["rays"]
        points = x[self.in_points_field]
        S = points.shape[1]
        if self.in_direction_field in x:
            dirs = x[self.in_direction_field]
        else:
            dirs = jnp.broadcast_to(rays[..., None, 3:6],
                                    (rays.shape[0], S, 3))
        normal = x[self.in_normal_field]
        if self.forward_facing:
            normal = normal.at[..., -1].add(-1.0)
        elif self.direction_init:
            normal = normal - dirs
        normal = _normalize(normal)
        x[self.out_normal_field] = normal

        refl = dirs - 2.0 * jnp.sum(dirs * normal, -1, keepdims=True) \
            * normal
        if self.in_distance_field in x:
            ref_distance = x[self.in_distance_field].reshape(
                points.shape[0], S, 1)
            points = points + jnp.abs(ref_distance) * refl
        if self.direction_offset_field in x:
            refl = _normalize(
                refl + x[self.direction_offset_field].reshape(points.shape))

        x[self.out_points_field] = points
        x[self.out_direction_field] = refl
        return x
