"""Embedding pipeline stages (reference: nlf/embedding/).

The reference chains nn.Modules over a mutable dict
(nlf/embedding/embedding.py:100-117); here each stage is a functional
object with `.init(key) -> params` and
`.apply(params, x, ctx, render_kwargs) -> x` over a dict of jnp arrays.
The chain itself is assembled once at build time; per-stage wait/stop-iter
gating becomes `jnp.where` blends so the whole pipeline stays one jit.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.models.ctx import StepCtx
from hyperreel_tpu.models.mlp import build_net
from hyperreel_tpu.models.pe import get_pe
from hyperreel_tpu.models.ray_param import get_ray_param
from hyperreel_tpu.models.intersect import build_intersect
from hyperreel_tpu.ops.contract import get_contract


# ---------------------------------------------------------------------------
# Ray-level stages
# ---------------------------------------------------------------------------

@dataclass
class RayPredictionEmbedding:
    """The HyperReel sample-prediction network
    (reference nlf/embedding/ray.py:213-363).

    Parameterizes channel ranges of the ray (two_plane / pluecker / time),
    encodes them, runs one MLP, and splits the output into per-z-sample
    fields (z_vals, sigma, point_offset, flows, color transforms, ...) plus
    ray-level fields, each with its own (possibly scheduled) activation.
    """

    cfg: dict
    group: str = "embedding"
    compute_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.group = cfg.get("net", {}).get("group", cfg.get("group", self.group))

        self.param_ranges = []
        self.params_fns = []
        self.pes = []
        in_channels = 0
        for key, pcfg in cfg["params"].items():
            start, end = int(pcfg["start"]), int(pcfg["end"])
            self.param_ranges.append((start, end))
            param_cfg = dict(pcfg["param"])
            param_cfg.setdefault("in_channels", end - start)
            rp = get_ray_param(param_cfg)
            self.params_fns.append(rp)
            pe = get_pe(rp.out_channels, pcfg.get("pe", None))
            self.pes.append(pe)
            in_channels += pe.out_channels
        self.in_channels = in_channels

        self.z_channels = int(cfg["z_channels"])
        outputs = cfg["outputs"]
        self.output_names = list(outputs.keys())
        self.output_shapes = [int(outputs[k]["channels"]) for k in self.output_names]
        self.preds_per_z = sum(self.output_shapes)

        ray_outputs = cfg.get("ray_outputs", {})
        self.ray_output_names = list(ray_outputs.keys())
        self.ray_output_shapes = [int(ray_outputs[k]["channels"])
                                  for k in self.ray_output_names]

        self.total_point_out = self.z_channels * self.preds_per_z
        self.total_ray_out = sum(self.ray_output_shapes)

        # reference shrinks depth by 2 and disables linear_last for this net
        # (nlf/embedding/ray.py:283-285)
        net_cfg = dict(cfg["net"])
        if "depth" in net_cfg:
            net_cfg["depth"] = int(net_cfg["depth"]) - 2
            net_cfg["linear_last"] = False
        self.net = build_net(
            self.in_channels,
            self.total_point_out + self.total_ray_out,
            net_cfg,
            compute_dtype=self.compute_dtype,
        )

        self.activations = [
            get_activation(outputs[k].get("activation", "identity"))
            for k in self.output_names
        ]
        self.ray_activations = [
            get_activation(ray_outputs[k].get("activation", "identity"))
            for k in self.ray_output_names
        ]

    def init(self, key):
        return {"net": self.net.init(key)}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        feats = []
        for (start, end), rp, pe in zip(self.param_ranges, self.params_fns,
                                        self.pes):
            cur = rays[:, start:end]
            feats.append(pe.apply(rp.apply(cur), ctx))
        net_in = jnp.concatenate(feats, -1)

        out = self.net.apply(params["net"], net_in, ctx)

        if self.total_point_out > 0:
            point_out = out[..., : self.total_point_out].reshape(
                rays.shape[0], self.z_channels, self.preds_per_z
            )
            offset = 0
            for name, width, act in zip(self.output_names, self.output_shapes,
                                        self.activations):
                x[name] = act(point_out[..., offset:offset + width], ctx)
                offset += width

        if self.total_ray_out > 0:
            ray_out = out[..., self.total_point_out:]
            offset = 0
            for name, width, act in zip(self.ray_output_names,
                                        self.ray_output_shapes,
                                        self.ray_activations):
                x[name] = act(ray_out[..., offset:offset + width], ctx)
                offset += width
        return x


@dataclass
class RayIntersectEmbedding:
    """Wraps an intersect primitive (reference nlf/embedding/ray.py:366-394)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.rays_name = self.cfg.get("rays_name", "rays")
        self.z_channels = int(self.cfg["z_channels"])
        self.intersect = build_intersect(self.z_channels, self.cfg["intersect"])

    def init(self, key):
        return {"intersect": self.intersect.init(key)}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        return self.intersect.apply(params["intersect"], rays, x, ctx,
                                    render_kwargs)


@dataclass
class CreateRaysEmbedding:
    """rays' = (points, broadcast dirs)
    (reference nlf/embedding/ray.py:397-430)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.in_rays = self.cfg.get("in_rays_name", "rays")
        self.in_points = self.cfg.get("in_points_name", "points")
        self.out_rays = self.cfg.get("out_rays_name", "rays")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.in_rays]
        points = x[self.in_points]
        dirs = jnp.broadcast_to(rays[..., None, 3:6], points.shape)
        x[self.out_rays] = jnp.concatenate([points, dirs], -1)
        return x


# ---------------------------------------------------------------------------
# Point-level stages (reference nlf/embedding/point.py)
# ---------------------------------------------------------------------------

@dataclass
class CreatePointsEmbedding:
    """points = o + d * dists (reference nlf/embedding/point.py:250-279)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.rays_name = self.cfg.get("rays_name", "rays")
        self.out_points = self.cfg.get("out_points_field", "points")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        dists = x["distances"]
        if dists.ndim == 2:
            dists = dists[..., None]
        x[self.out_points] = rays[..., None, :3] + rays[..., None, 3:6] * dists
        return x


@dataclass
class PointOffsetEmbedding:
    """points += act(point_offset) * (1 - sigma), with train-time dropout
    every `frequency` iters (reference nlf/embedding/point.py:338-399)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.in_density_field = cfg.get("in_density_field", "sigma")
        self.in_offset_field = cfg.get("in_offset_field", "point_offset")
        self.out_offset_field = cfg.get("out_offset_field", "offset")
        self.in_points_field = cfg.get("in_points_field", "points")
        self.out_points_field = cfg.get("out_points_field", "points")
        self.save_points_field = cfg.get("save_points_field", None)
        self.use_sigma = bool(cfg.get("use_sigma", True))
        self.activation = get_activation(cfg.get("activation", "identity"))
        dropout = cfg.get("dropout", None)
        self.use_dropout = dropout is not None
        self.dropout_frequency = int(dropout.get("frequency", 2)) if dropout else 2
        self.dropout_stop_iter = float(dropout.get("stop_iter", float("inf"))) \
            if dropout else float("inf")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        in_points = x[self.in_points_field]
        if self.save_points_field is not None:
            x[self.save_points_field] = in_points

        if self.use_sigma and self.in_density_field in x:
            sigma = x[self.in_density_field]
        else:
            sigma = jnp.zeros(in_points.shape[:2] + (1,), in_points.dtype)

        offset = self.activation(x[self.in_offset_field], ctx) * (1.0 - sigma)

        if self.use_dropout and ctx.training:
            gate = ((ctx.it % self.dropout_frequency) == 0) & (
                ctx.it < self.dropout_stop_iter
            )
            offset = jnp.where(gate, jnp.zeros_like(offset), offset)

        x[self.in_offset_field] = offset
        x[self.out_points_field] = in_points + offset
        if self.out_offset_field is not None:
            x[self.out_offset_field] = offset
        return x


@dataclass
class PointDensityEmbedding:
    """sigma from the last z channel, with a linear warm-in window
    (reference nlf/embedding/point.py:282-335)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.in_field = cfg.get("in_field", "sigma")
        self.out_field = cfg.get("out_field", "sigma")
        self.activation = get_activation(cfg.get("activation", "sigmoid"))
        self.shift = float(cfg.get("shift", 0.0))
        self.window_start = float(cfg.get("window_start_iters", 0))
        self.window_iters = float(cfg.get("window_iters", 0))

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        cur = ctx.it.astype(jnp.float32) - self.window_start
        if self.window_iters <= 0:
            w = jnp.where(cur < 0, 0.0, 1.0)
        else:
            w = jnp.clip(cur / self.window_iters, 0.0, 1.0)
        sigma = self.activation(x[self.in_field][..., -1:] + self.shift, ctx)
        x[self.out_field] = sigma * w + (1.0 - w)
        return x


def get_base_time(t, flow_keyframes, total_frames, flow_scale, jitter, rng):
    """Snap times to keyframe times, optional train jitter
    (reference utils/flow_utils.py:10-35)."""
    if flow_keyframes <= 0:
        return jnp.zeros_like(t)
    fac = flow_keyframes * (total_frames - 1) / total_frames
    t = t * fac
    if jitter and flow_scale > 0.0:
        base = t + (jax.random.uniform(rng, t.shape) * flow_scale
                    - flow_scale / 2.0)
    else:
        base = t
    return jnp.round(jnp.clip(base, 0.0, flow_keyframes - 1.0) - 1e-5) * (1.0 / fac)


@dataclass
class AdvectPointsEmbedding:
    """Keyframe flow advection (reference nlf/embedding/point.py:741-834):
    snap time to a keyframe, advect points by spatial (and optionally
    angular) flow scaled by the time offset."""

    cfg: dict
    num_keyframes: int = 1
    num_frames: int = 1
    group: str = "embedding"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.in_points_field = cfg.get("in_points_field", "points")
        self.out_points_field = cfg.get("out_points_field", "points")
        self.save_points_field = cfg.get("save_points_field", None)
        self.out_offset_field = cfg.get("out_offset_field", "offset")
        self.use_spatial_flow = bool(cfg.get("use_spatial_flow", False))
        self.use_angular_flow = bool(cfg.get("use_angular_flow", False))
        self.flow_scale = float(cfg.get("flow_scale", 0.0))
        self.spatial_flow_activation = get_activation(
            cfg.get("spatial_flow_activation", "identity"))
        self.angular_flow_rotation_activation = get_activation(
            cfg.get("angular_flow_rotation_activation", "identity"))
        self.angular_flow_anchor_activation = get_activation(
            cfg.get("angular_flow_anchor_activation", "identity"))

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        rays = x[self.rays_name]
        points = x[self.in_points_field]
        t = rays[..., -1:]

        if self.save_points_field is not None:
            x[self.save_points_field] = points

        jitter = ctx.training and ("no_flow_jitter" not in render_kwargs)
        base_t = get_base_time(t, self.num_keyframes, self.num_frames,
                               self.flow_scale, jitter,
                               jax.random.fold_in(ctx.rng, 101))
        time_offset = (t - base_t)[..., None, :]

        if self.use_angular_flow:
            rot_vec = self.angular_flow_rotation_activation(
                x["angular_flow"][..., :3], ctx)
            anchor = self.angular_flow_anchor_activation(
                x["angular_flow"][..., 3:6], ctx)
            x["angular_flow_rot"] = rot_vec
            x["angular_flow_anchor"] = anchor
            from hyperreel_tpu.ops.rotation import axis_angle_to_matrix
            R = axis_angle_to_matrix(rot_vec * time_offset)
            p = points - anchor
            p = jnp.einsum("...ij,...j->...i", R, p)
            points = p + anchor

        if self.use_spatial_flow:
            flow = self.spatial_flow_activation(x["spatial_flow"], ctx)
            x["spatial_flow"] = flow
            points = points + flow * time_offset

        S = points.shape[1]
        x[self.out_points_field] = points
        x["base_times"] = jnp.broadcast_to(base_t[..., None, :],
                                           (points.shape[0], S, 1))
        x["time_offset"] = jnp.broadcast_to(time_offset,
                                            (points.shape[0], S, 1))
        if self.out_offset_field is not None:
            x[self.out_offset_field] = x[self.in_points_field] - points
        return x


@dataclass
class ColorTransformEmbedding:
    """Learnable per-camera 3x3 + shift color calibration
    (reference nlf/embedding/point.py:558-602)."""

    cfg: dict
    num_views: int = 1
    group: str = "color"

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        self.transform_activation = get_activation(
            cfg.get("transform_activation", "identity"))
        self.shift_activation = get_activation(
            cfg.get("shift_activation", "identity"))

    def init(self, key):
        return {
            "transform": jnp.zeros((self.num_views, 9), jnp.float32),
            "shift": jnp.zeros((self.num_views, 3), jnp.float32),
        }

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        cam = jnp.round(rays[..., -2]).astype(jnp.int32)
        transform = self.transform_activation(params["transform"], ctx)[cam]
        shift = self.shift_activation(params["shift"], ctx)[cam]
        S = x["points"].shape[1]
        x["color_transform_global"] = jnp.broadcast_to(
            transform[:, None, :], (rays.shape[0], S, 9))
        x["color_shift_global"] = jnp.broadcast_to(
            shift[:, None, :], (rays.shape[0], S, 3))
        return x


@dataclass
class AddPointOutputsEmbedding:
    """Broadcast per-ray viewdirs/times to per-sample fields
    (reference nlf/embedding/point.py:837-873)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.rays_name = self.cfg.get("rays_name", "rays")
        self.extra_outputs = list(self.cfg.get("extra_outputs", []))

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        rays = x[self.rays_name]
        S = x["points"].shape[1]
        B = rays.shape[0]
        if "times" in self.extra_outputs and "times" not in x:
            x["times"] = jnp.broadcast_to(rays[..., None, -1:], (B, S, 1))
        if "base_times" in self.extra_outputs and "base_times" not in x:
            x["base_times"] = jnp.broadcast_to(rays[..., None, -1:], (B, S, 1))
        if "viewdirs" in self.extra_outputs and "viewdirs" not in x:
            x["viewdirs"] = jnp.broadcast_to(rays[..., None, 3:6], (B, S, 3))
        return x


@dataclass
class ExtractFieldsEmbedding:
    """Final field selection (reference nlf/embedding/point.py:221-247)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.fields = list(self.cfg.get("fields", []))

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        fields = self.fields + list(render_kwargs.get("fields", []))
        return {k: x[k] for k in fields if k in x}


@dataclass
class ContractEmbedding:
    """Contract sample points (reference nlf/embedding/point.py:605-640)."""

    cfg: dict
    group: str = "embedding"

    def __post_init__(self):
        self.contract = get_contract(self.cfg.get("contract", None))
        self.in_points_field = self.cfg.get("in_points_field", "points")
        self.out_points_field = self.cfg.get("out_points_field", "points")

    def init(self, key):
        return {}

    def apply(self, params, x, ctx, render_kwargs=None):
        x[self.out_points_field] = self.contract.contract_points(
            x[self.in_points_field])
        return x


@dataclass
class PointPredictionEmbedding:
    """Per-sample-point MLP (reference nlf/embedding/point.py:39-218).
    Inputs are assembled from named per-sample fields; outputs are residual
    per-sample fields."""

    cfg: dict
    group: str = "embedding"
    compute_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        cfg = self.cfg
        self.rays_name = cfg.get("rays_name", "rays")
        # named per-sample input fields, CONCATENATED in declaration
        # order; the `params` ranges below index into that concatenation
        # (reference nlf/embedding/point.py:103-133 — note the shipped
        # cascaded yamls' `time: 3:4` range therefore lands on
        # viewdirs.x, a reference quirk reproduced faithfully)
        self.inputs = dict(cfg.get("inputs", {"points": 3}))

        self.in_fields = []
        in_channels = 0
        for name, pcfg in cfg["params"].items():
            start, end = int(pcfg["start"]), int(pcfg["end"])
            param_cfg = dict(pcfg.get("param", {"fn": "identity"}))
            param_cfg.setdefault("in_channels", end - start)
            rp = get_ray_param(param_cfg)
            pe = get_pe(rp.out_channels, pcfg.get("pe", None))
            self.in_fields.append((name, start, end, rp, pe))
            in_channels += pe.out_channels
        self.in_channels = in_channels

        outputs = cfg["outputs"]
        self.output_names = list(outputs.keys())
        self.output_shapes = [int(outputs[k]["channels"]) for k in self.output_names]
        self.residual = {k: bool(outputs[k].get("residual", False))
                         for k in self.output_names}
        self.activations = [
            get_activation(outputs[k].get("activation", "identity"))
            for k in self.output_names
        ]
        self.out_channels = sum(self.output_shapes)

        # cascaded refinement: each coarse sample emits
        # out_z_channels / in_z_channels refined samples (reference
        # point.py in_channels_per_z/out_channels_per_z)
        in_z = int(cfg.get("in_z_channels", 0))
        out_z = int(cfg.get("out_z_channels", 0))
        self.expand_factor = max(out_z // in_z, 1) if in_z and out_z else 1

        net_cfg = dict(cfg["net"])
        if "depth" in net_cfg:
            net_cfg["depth"] = int(net_cfg["depth"]) - 2
            net_cfg["linear_last"] = False
        self.net = build_net(self.in_channels,
                             self.out_channels * self.expand_factor,
                             net_cfg, compute_dtype=self.compute_dtype)

    def init(self, key):
        return {"net": self.net.init(key)}

    def _field(self, x, name, width, B, S):
        """Per-sample input field (reference point.py:107-118:
        viewdirs/origins/times come straight from the rays; anything else
        from x, truncated to the declared width)."""
        rays = x[self.rays_name]
        if name == "viewdirs":
            return jnp.broadcast_to(rays[..., None, 3:6], (B, S, 3))
        if name == "origins":
            return jnp.broadcast_to(rays[..., None, 0:3], (B, S, 3))
        if name in ("times", "base_times"):
            return jnp.broadcast_to(rays[..., None, -1:], (B, S, 1))
        return x[name][..., :width]

    def apply(self, params, x, ctx, render_kwargs=None):
        B, S = x["points"].shape[:2]
        inputs = jnp.concatenate(
            [self._field(x, name, width, B, S)
             for name, width in self.inputs.items()], -1)
        feats = []
        for name, start, end, rp, pe in self.in_fields:
            flat = inputs[..., start:end].reshape(B * S, -1)
            feats.append(pe.apply(rp.apply(flat), ctx))
        net_in = jnp.concatenate(feats, -1)
        out = self.net.apply(params["net"], net_in, ctx).reshape(
            B, S * self.expand_factor, -1)

        offset = 0
        for name, width, act in zip(self.output_names, self.output_shapes,
                                    self.activations):
            val = act(out[..., offset:offset + width], ctx)
            if self.residual.get(name) and name in x:
                x[name] = x[name] + val
            else:
                x[name] = val
            offset += width
        return x


# ---------------------------------------------------------------------------
# The chain container
# ---------------------------------------------------------------------------

@dataclass
class EmbeddingChain:
    """Ordered chain over the sample-state dict
    (reference nlf/embedding/embedding.py:59-126).

    Per-stage wait_iters/stop_iters gating (embedding.py:106-110) is
    realized jit-compatibly: the stage always runs, and every field it
    modified or added is where-blended with its pre-stage value by the
    gate on ``ctx.it`` (new fields blend against zeros)."""

    stages: List  # (name, stage) pairs

    def init(self, key):
        keys = jax.random.split(key, max(len(self.stages), 1))
        return {name: stage.init(k)
                for (name, stage), k in zip(self.stages, keys)}

    def apply(self, params, rays, ctx, render_kwargs=None):
        x = {"rays": rays}
        for name, stage in self.stages:
            wait = float(stage.cfg.get("wait_iters", 0)) \
                if isinstance(getattr(stage, "cfg", None), dict) else 0.0
            stop = float(stage.cfg.get("stop_iters", float("inf"))) \
                if isinstance(getattr(stage, "cfg", None), dict) else float("inf")
            gated = wait > 0 or stop != float("inf")
            if not gated:
                x = stage.apply(params[name], x, ctx, render_kwargs)
                continue
            before = dict(x)
            out = stage.apply(params[name], dict(x), ctx, render_kwargs)
            it_f = ctx.it.astype(jnp.float32)
            active = (it_f >= wait) & (it_f < stop)
            blended = {}
            for k, v in out.items():
                old = before.get(k)
                if old is None or old.shape != v.shape:
                    blended[k] = jnp.where(active, v, jnp.zeros_like(v)) \
                        if old is None else jnp.where(active, v, v)
                else:
                    blended[k] = jnp.where(active, v, old)
            x = blended
        return x


def _extra_stages():
    from hyperreel_tpu.models import embeddings_extra as ex
    return {
        "calibrate": ex.CalibrateEmbedding,
        "calibrate_planar": ex.CalibratePlanarEmbedding,
        "affine": ex.AffineEmbedding,
        "local_affine": ex.LocalAffineEmbedding,
        "feature": ex.FeatureEmbedding,
        "generate_num_samples": ex.GenerateNumSamplesEmbedding,
        "generate_samples": ex.GenerateNumSamplesEmbedding,
        "select_points": ex.SelectPointsEmbedding,
        "random_offset": ex.RandomOffsetEmbedding,
        "reflect": ex.ReflectEmbedding,
    }


embedding_stage_dict = {
    "ray_prediction": RayPredictionEmbedding,
    "ray_intersect": RayIntersectEmbedding,
    "create_rays": CreateRaysEmbedding,
    "create_points": CreatePointsEmbedding,
    "point_prediction": PointPredictionEmbedding,
    "point_offset": PointOffsetEmbedding,
    "point_density": PointDensityEmbedding,
    "advect_points": AdvectPointsEmbedding,
    "add_point_outputs": AddPointOutputsEmbedding,
    "extract_fields": ExtractFieldsEmbedding,
    "color_transform": ColorTransformEmbedding,
    "contract": ContractEmbedding,
}


def build_embedding_chain(cfg, dataset_info=None, compute_dtype=None):
    """Build the ray_point chain from a model config's `embedding.embeddings`
    ordered dict (reference nlf/models/models.py:104-143 wiring)."""
    dataset_info = dataset_info or {}
    registry = dict(embedding_stage_dict)
    registry.update(_extra_stages())
    stages = []
    for name, stage_cfg in cfg["embeddings"].items():
        t = stage_cfg["type"]
        cls = registry[t]
        kwargs = {}
        if t == "advect_points":
            kwargs = {
                "num_keyframes": int(dataset_info.get("num_keyframes", 1)),
                "num_frames": int(dataset_info.get("num_frames", 1)),
            }
        elif t == "ray_intersect":
            # inject dataset bounds for use_dataset_bounds intersects /
            # contracts (reference reads them off the live datamodule:
            # nlf/intersect/base.py:88, nlf/contract.py:121-125)
            stage_cfg = dict(stage_cfg)
            icfg = dict(stage_cfg.get("intersect", {}))
            if dataset_info.get("near") is not None:
                icfg.setdefault("_dataset_bounds",
                                (float(dataset_info["near"]),
                                 float(dataset_info["far"])))
            if dataset_info.get("bbox") is not None:
                bb = dataset_info["bbox"]
                icfg.setdefault("_dataset_bbox",
                                (np.asarray(bb[0], np.float32),
                                 np.asarray(bb[1], np.float32)))
            ccfg = icfg.get("contract")
            dr = dataset_info.get("depth_range")
            if isinstance(ccfg, dict) and dr is not None:
                ccfg = dict(ccfg)
                ccfg.setdefault("_dataset_depth_range",
                                (float(dr[0]), float(dr[1])))
                icfg["contract"] = ccfg
            stage_cfg["intersect"] = icfg
        elif t in ("color_transform", "calibrate"):
            kwargs = {"num_views": int(dataset_info.get("num_views", 1))}
        elif t in ("ray_prediction", "point_prediction"):
            kwargs = {"compute_dtype": compute_dtype}
        stages.append((name, cls(cfg=dict(stage_cfg), **kwargs)))
    return EmbeddingChain(stages)
