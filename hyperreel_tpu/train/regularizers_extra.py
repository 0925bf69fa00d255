"""Remaining regularizer families for capability parity
(reference: nlf/regularizers/ray_density.py, warp.py, teacher.py,
coarse.py, point.py, fourier.py, geometry.py flow/feedback variants).

All are functional: `loss(model, params, batch, ctx, system)` with the
shared wait/warmup/stop weight schedule. Random sampling uses ctx.rng.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from hyperreel_tpu.train.losses import get_loss
from hyperreel_tpu.train.regularizers import (
    schedule_weight, regularizer_dict)


def sample_simplex(rng, batch, n):
    """Uniform samples on the n-simplex via sorted-uniform differences
    (reference ray_density.py:31-42)."""
    u = jax.random.uniform(rng, (batch, n))
    u = jnp.concatenate([jnp.zeros((batch, 1)), u], -1)
    u = jnp.sort(u, -1)
    return u[:, 1:] - u[:, :-1]


@dataclass
class SimpleRayDensityRegularizer:
    """Consistency of predicted sample distributions across jittered rays
    (reference nlf/regularizers/ray_density.py simple variant): render the
    per-sample weights for a batch ray and a slightly jittered copy, and
    penalize the difference."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        jit = self.cfg.get("jitter", {})
        self.pos_std = float(jit.get("pos_std", 0.01))
        self.dir_std = float(jit.get("dir_std", 0.01))

    def loss(self, model, params, batch, ctx, system=None):
        rays = batch["rays"]
        k1, k2 = jax.random.split(ctx.rng)
        noise_o = jax.random.normal(k1, rays[..., :3].shape) * self.pos_std
        noise_d = jax.random.normal(k2, rays[..., 3:6].shape) * self.dir_std
        jittered = jnp.concatenate(
            [rays[..., :3] + noise_o, rays[..., 3:6] + noise_d,
             rays[..., 6:]], -1)

        kw = {"fields": ["render_weights"]}
        w0 = model.apply(params, rays, ctx, kw)["render_weights"]
        w1 = model.apply(params, jittered, ctx, kw)["render_weights"]
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(w0, w1)


@dataclass
class RayDensityRegularizer(SimpleRayDensityRegularizer):
    """Full variant: simplex-weighted blends of nearby training rays
    (reference ray_density.py:44-399). The blended ray's predicted sample
    distribution should match the blend of the endpoints' distributions."""

    def __post_init__(self):
        super().__post_init__()
        self.num_blend = int(self.cfg.get("num_views_for_ray", 2))

    def loss(self, model, params, batch, ctx, system=None):
        rays = batch["rays"]
        B = rays.shape[0]
        k1, k2 = jax.random.split(ctx.rng)
        perm = jax.random.permutation(k1, B)
        other = rays[perm]
        w = sample_simplex(k2, B, 2)
        blend = w[:, :1] * rays[..., :6] + w[:, 1:2] * other[..., :6]
        blended = jnp.concatenate([blend, rays[..., 6:]], -1)

        kw = {"fields": ["render_weights"]}
        wa = model.apply(params, rays, ctx, kw)["render_weights"]
        wb = model.apply(params, other, ctx, kw)["render_weights"]
        wc = model.apply(params, blended, ctx, kw)["render_weights"]
        target = w[:, :1] * wa + w[:, 1:2] * wb
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(wc, jax.lax.stop_gradient(target))


@dataclass
class WarpRegularizer:
    """Low-rank constraint on learned local re-parameterizations: penalize
    singular values beyond the top-2 of the predicted per-ray transform
    (reference nlf/regularizers/warp.py:18-80)."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        self.param_channels = int(self.cfg.get("param", {}).get("n_dims", 4))

    def loss(self, model, params, batch, ctx, system=None):
        # Only meaningful when the embedding chain contains a local_affine
        # stage exposing a per-ray transform; otherwise contributes zero.
        for name, stage in model.embedding.stages:
            if type(stage).__name__ == "LocalAffineEmbedding":
                rays = batch["rays"]
                pred = stage.net.apply(
                    params["embedding"][name]["net"],
                    rays[..., : stage.param_channels], ctx)
                M = pred[..., : stage.tform_out_channels
                         * stage.param_channels].reshape(
                    rays.shape[0], stage.tform_out_channels,
                    stage.param_channels)
                S = jnp.linalg.svd(M, compute_uv=False)
                base = schedule_weight(self.cfg, ctx.it)
                return base * self.loss_fn(S[..., 2:],
                                           jnp.zeros_like(S[..., 2:]))
        return jnp.asarray(0.0)


@dataclass
class CoarseRegularizer:
    """Extra MSE pass against the ground truth under the `coarse` render
    flag (reference nlf/regularizers/coarse.py:20-60)."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))

    def loss(self, model, params, batch, ctx, system=None):
        out = model.apply(params, batch["rays"], ctx, {"coarse": True})
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(out["rgb"], batch["rgb"])


@dataclass
class PointRegularizer:
    """L2 pull-to-zero on predicted point offsets
    (reference nlf/regularizers/point.py:28-70)."""

    cfg: dict

    def loss(self, model, params, batch, ctx, system=None):
        out = model.embed(params, batch["rays"], ctx,
                          {"fields": ["point_offset"]})
        if "point_offset" not in out:
            return jnp.asarray(0.0)
        base = schedule_weight(self.cfg, ctx.it)
        return base * jnp.mean(out["point_offset"] ** 2)


@dataclass
class FlowRegularizer:
    """Spatial-flow smoothness: penalize flow magnitude and neighboring-
    sample flow differences (reference nlf/regularizers/geometry.py:187+)."""

    cfg: dict

    def loss(self, model, params, batch, ctx, system=None):
        out = model.embed(params, batch["rays"], ctx,
                          {"fields": ["spatial_flow"]})
        if "spatial_flow" not in out:
            return jnp.asarray(0.0)
        flow = out["spatial_flow"]
        base = schedule_weight(self.cfg, ctx.it)
        mag = jnp.mean(flow ** 2)
        smooth = jnp.mean((flow[:, 1:] - flow[:, :-1]) ** 2)
        return base * (mag * float(self.cfg.get("magnitude_weight", 0.01))
                       + smooth * float(self.cfg.get("smooth_weight", 1.0)))


@dataclass
class TeacherRegularizer:
    """Distill from a frozen teacher model's outputs
    (reference nlf/regularizers/teacher.py:24-288). The teacher is a
    (model, params) pair set via `set_teacher`."""

    cfg: dict
    teacher_model: object = None
    teacher_params: object = None

    def set_teacher(self, model, params):
        self.teacher_model = model
        self.teacher_params = params

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))

    def loss(self, model, params, batch, ctx, system=None):
        if self.teacher_model is None:
            return jnp.asarray(0.0)
        target = jax.lax.stop_gradient(
            self.teacher_model.apply(self.teacher_params, batch["rays"],
                                     ctx)["rgb"])
        out = model.apply(params, batch["rays"], ctx)
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(out["rgb"], target)


@dataclass
class BlurryTeacherRegularizer(TeacherRegularizer):
    """Match a blurred teacher (low-frequency supervision,
    reference teacher.py blurry variant): compare means over ray groups."""

    def loss(self, model, params, batch, ctx, system=None):
        if self.teacher_model is None:
            return jnp.asarray(0.0)
        target = jax.lax.stop_gradient(
            self.teacher_model.apply(self.teacher_params, batch["rays"],
                                     ctx)["rgb"])
        out = model.apply(params, batch["rays"], ctx)["rgb"]
        g = int(self.cfg.get("group", 8))
        B = (out.shape[0] // g) * g
        tm = target[:B].reshape(-1, g, 3).mean(1)
        om = out[:B].reshape(-1, g, 3).mean(1)
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(om, tm)


@dataclass
class FourierRegularizer:
    """Frequency-space supervision: match the FFT magnitude of predictions
    to ground truth over a ray batch (reference
    nlf/regularizers/fourier.py:24+ with datasets/fourier.py)."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))

    def loss(self, model, params, batch, ctx, system=None):
        out = model.apply(params, batch["rays"], ctx)["rgb"]
        pred_f = jnp.abs(jnp.fft.rfft(out, axis=0))
        gt_f = jnp.abs(jnp.fft.rfft(batch["rgb"], axis=0))
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(pred_f, gt_f)


@dataclass
class GeometryFeedbackRegularizer:
    """Teacher-field vs student-field consistency weighted by render weights
    (reference nlf/regularizers/geometry.py:88-180): the render-weight-
    composited sample points should agree with the predicted-weight
    composited points."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))

    def loss(self, model, params, batch, ctx, system=None):
        out = model.apply(
            params, batch["rays"], ctx,
            {"fields": ["points"], "pred_weights_fields": []})
        out_pred = model.apply(
            params, batch["rays"], ctx,
            {"fields": ["points"], "pred_weights_fields": ["points"]})
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(
            out["points"], jax.lax.stop_gradient(out_pred["points"]))


@dataclass
class WarpLevelSetRegularizer:
    """Level-set consistency: embedding outputs should be locally constant
    along the ray direction (reference nlf/regularizers/warp.py:80-140
    WarpLevelSetRegularizer)."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        self.step = float(self.cfg.get("step", 0.01))

    def loss(self, model, params, batch, ctx, system=None):
        rays = batch["rays"]
        stepped = jnp.concatenate(
            [rays[..., :3] + rays[..., 3:6] * self.step,
             rays[..., 3:6], rays[..., 6:]], -1)
        kw = {"fields": ["points"]}
        a = model.apply(params, rays, ctx, kw)["points"]
        b = model.apply(params, stepped, ctx, kw)["points"]
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(a, b)


@dataclass
class TensorTVRegularizer:
    """TV on arbitrary tensor-grid parameters
    (reference nlf/regularizers/tensor.py)."""

    cfg: dict

    def loss(self, model, params, batch, ctx, system=None):
        from hyperreel_tpu.models.tensorf import _tv2d
        total = 0.0
        count = 0
        for fam in ("density", "app"):
            for key, arr in params["color"].get(fam, {}).items():
                if arr.ndim == 3:
                    total = total + _tv2d(arr)
                    count += 1
        if count == 0:
            return jnp.asarray(0.0)
        base = schedule_weight(self.cfg, ctx.it)
        return base * total / count


regularizer_dict.update({
    "geometry_feedback": GeometryFeedbackRegularizer,
    "warp_level": WarpLevelSetRegularizer,
    "tensor_tv": TensorTVRegularizer,
    "simple_ray_density": SimpleRayDensityRegularizer,
    "ray_density": RayDensityRegularizer,
    "warp": WarpRegularizer,
    "coarse": CoarseRegularizer,
    "point": PointRegularizer,
    "flow": FlowRegularizer,
    "teacher": TeacherRegularizer,
    "teacher_model": TeacherRegularizer,
    "blurry_teacher": BlurryTeacherRegularizer,
    "fourier": FourierRegularizer,
})
