"""Remaining regularizer families for capability parity
(reference: nlf/regularizers/ray_density.py, warp.py, teacher.py,
coarse.py, point.py, fourier.py, geometry.py flow/feedback variants).

All are functional: `loss(model, params, batch, ctx, system)` with the
shared wait/warmup/stop weight schedule. Random sampling uses ctx.rng.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.ops.intersect_math import safe_norm
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


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True),
                           1e-12)


def _synthesize_random_rays(cfg, system, batch_size, rng, it, extrap_mod):
    """Pose-aware random-ray synthesis (reference
    nlf/regularizers/ray_density.py:100-172): random train-camera anchors,
    random-pixel directions through K, periodic centroid extrapolation,
    periodic simplex interpolation across anchors, gaussian jitter, and
    the dataset's NDC transform.

    `it` is traced, so the reference's batch_idx-parity phases become
    jnp.where selections. Returns [batch, 6] rays (o, d)."""
    ds = system.train_dataset
    poses = jnp.asarray(ds.poses[:, :3, :4], jnp.float32)     # [V, 3, 4]
    K = jnp.asarray(ds.intrinsics, jnp.float32)
    W, H = ds.img_wh
    V = poses.shape[0]
    nvr = int(cfg.get("num_views_for_random", 4))
    extrapolate_scale = float(cfg.get("extrapolate_scale", 2.0))
    use_jitter = bool(cfg.get("use_jitter", False))
    jit = cfg.get("jitter", {}) or {}
    pos_std = float(jit.get("pos_std", 0.1))
    dir_std = float(jit.get("dir_std", 0.1))

    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    views = jax.random.randint(k1, (batch_size * nvr,), 0, max(V - 1, 1))
    anchor_poses = poses[views]                               # [B*nvr, 3, 4]
    pos = anchor_poses[:, :, 3]

    # random pixels -> camera-space dirs (ray_utils.get_random_pixels +
    # get_ray_directions_from_pixels_K, centered_pixels=True)
    pix = jax.random.uniform(k2, (batch_size * nvr, 2))
    i = pix[:, 0] * (W - 1)
    j = pix[:, 1] * (H - 1)
    d_cam = jnp.stack(
        [(i - K[0, 2] + 0.5) / K[0, 0],
         -(j - K[1, 2] + 0.5) / K[1, 1],
         -jnp.ones_like(i)], -1)
    d = _normalize(jnp.einsum("nij,nj->ni", anchor_poses[:, :, :3], d_cam))

    pos = pos.reshape(batch_size, nvr, 3)
    d = d.reshape(batch_size, nvr, 3)

    # extrapolate phase (reference: every `extrapolate_freq`-ish batch)
    pc = pos.mean(1, keepdims=True)
    dc = _normalize(d.mean(1, keepdims=True))
    pos_ex = (pos - pc) * extrapolate_scale + pc
    d_ex = _normalize((d - dc) * extrapolate_scale + dc)
    do_ex = (it % 3) == extrap_mod
    pos = jnp.where(do_ex, pos_ex, pos)
    d = jnp.where(do_ex, d_ex, d)

    # interpolate phase (odd batches): simplex-weighted anchor blend
    w = sample_simplex(k3, batch_size, nvr)[..., None]        # [B, nvr, 1]
    pos_in = (w * pos).sum(1)
    d_in = _normalize((w * d).sum(1))
    do_in = (it % 2) == 1
    pos = jnp.where(do_in, pos_in, pos[:, 0])
    d = jnp.where(do_in, d_in, d[:, 0])

    if use_jitter:
        pos = pos + jax.random.normal(k4, pos.shape) * pos_std
        d = _normalize(d + jax.random.normal(k5, d.shape) * dir_std)

    rays = jnp.concatenate([pos, d], -1)
    if getattr(ds, "ndc_params", None):
        from hyperreel_tpu.ops.ray_math import get_ndc_rays_fx_fy
        fx, fy, near = ds.ndc_params
        rays = get_ndc_rays_fx_fy(H, W, fx, fy, near, rays)
        rays = jnp.concatenate(
            [jnp.clip(rays[..., :3], -2.0, 2.0), rays[..., 3:]], -1)
    return rays


@dataclass
class SimpleRayDensityRegularizer:
    """Reference semantics (nlf/regularizers/ray_density.py:364-399
    SimpleRayDensityRegularizer): synthesize pose-aware random rays and
    push the embedding's predicted per-sample sigma toward 1, weighted by
    1/num_images (4x ray-position-dependent weights on extrapolated
    batches). Falls back to jittered-batch-ray weight consistency when the
    dataset exposes no poses/intrinsics."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        jit = self.cfg.get("jitter", {}) or {}
        self.pos_std = float(jit.get("pos_std", 0.01))
        self.dir_std = float(jit.get("dir_std", 0.01))
        self.extrap_mod = 0

    def _fallback_loss(self, model, params, batch, ctx):
        if not getattr(self, "_fallback_warned", False):
            # surface the semantic change ONCE: without dataset poses the
            # reference's pose-aware random-ray synthesis degrades to
            # batch-ray jitter (different math than the config implies)
            print(f"[{type(self).__name__}] dataset exposes no poses/"
                  "intrinsics: falling back to batch-ray jitter "
                  "consistency (reference ray_density semantics need "
                  "train-camera statistics)", flush=True)
            self._fallback_warned = True
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

    def _random_rays(self, model, batch, ctx, system):
        rays = _synthesize_random_rays(
            self.cfg, system, batch["rays"].shape[0], ctx.rng, ctx.it,
            self.extrap_mod)
        extra = batch["rays"].shape[-1] - 6
        if extra > 0:  # keep camera-id / time columns from the batch
            rays = jnp.concatenate([rays, batch["rays"][..., 6:]], -1)
        return rays

    def loss(self, model, params, batch, ctx, system=None):
        ds = getattr(system, "train_dataset", None) if system else None
        if ds is None or ds.poses is None or ds.intrinsics is None:
            return self._fallback_loss(model, params, batch, ctx)
        rays = self._random_rays(model, batch, ctx, system)
        out = model.embed(params, rays, ctx, {"fields": ["sigma"]})
        if "sigma" not in out:
            return self._fallback_loss(model, params, batch, ctx)
        sigma = out["sigma"].reshape(rays.shape[0], -1)

        # weight map (reference ray_density.py:374-395)
        n_img = max(int(ds.num_images), 1)
        w_ex = 4.0 * (1.0 - jnp.exp(
            -jnp.square(rays[..., :2]).mean(-1)
            - jnp.square(rays[..., 3:5]).mean(-1))) / n_img
        weights = jnp.where((ctx.it % 3) == 0, w_ex, 1.0 / n_img)[:, None]
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(sigma * weights,
                                   jnp.ones_like(sigma) * weights)


@dataclass
class RayDensityRegularizer(SimpleRayDensityRegularizer):
    """Full variant (reference ray_density.py:44-245): for each synthetic
    ray, compute a camera-density target h_sigma from the angle spread of
    the num_views_for_ray nearest train cameras toward the ray's sample
    points, and regress the embedding's predicted sigma onto it.

    Documented deviation: the reference reshapes the embedding params to
    [B, views, z] (a contract only its affine embeddings satisfy); here
    h_sigma is averaged over the camera-view axis to match the z-plane
    models' [B, z] sigma field."""

    def __post_init__(self):
        super().__post_init__()
        self.extrap_mod = 1
        self.num_views_for_ray = int(self.cfg.get("num_views_for_ray", 4))
        angle_std = float(self.cfg.get("angle_std", 120.0))
        self.angle_std_deg = angle_std

    def loss(self, model, params, batch, ctx, system=None):
        ds = getattr(system, "train_dataset", None) if system else None
        if ds is None or ds.poses is None or ds.intrinsics is None:
            return self._fallback_loss(model, params, batch, ctx)
        rays = self._random_rays(model, batch, ctx, system)
        out = model.embed(params, rays, ctx,
                          {"fields": ["sigma", "points"]})
        if "sigma" not in out or "points" not in out:
            return self._fallback_loss(model, params, batch, ctx)
        B = rays.shape[0]
        sigma = out["sigma"].reshape(B, -1)
        points = jax.lax.stop_gradient(out["points"]).reshape(B, -1, 3)

        centers = jnp.asarray(ds.poses[:, :3, 3], jnp.float32)  # [V, 3]
        nvk = min(self.num_views_for_ray, centers.shape[0])
        cam_d = jnp.linalg.norm(
            rays[:, None, :3] - centers[None], axis=-1)         # [B, V]
        _, nearest = jax.lax.top_k(-cam_d, nvk)                 # [B, nvk]
        near_centers = centers[nearest]                         # [B, nvk, 3]

        # directions from each near camera to each sample point
        cam_pts = points[:, None] - near_centers[:, :, None]    # [B,v,z,3]
        dirs = _normalize(cam_pts)

        # compute_sigma_angle (utils/ray_utils.py:245-279), then the
        # reference's sigmoid squash; NaN -> 1
        angle_std = (np.radians(self.angle_std_deg)
                     / max(int(ds.num_images), 1))
        q = _normalize(rays[:, None, None, 3:6])
        ang = jnp.arccos(jnp.clip(jnp.sum(dirs * q, -1),
                                  -1 + 1e-8, 1 - 1e-8))         # [B,v,z]
        c = float(np.power(2 * np.pi * angle_std * angle_std, -0.5))
        h = c * c * jnp.exp(-0.5 * jnp.square(ang / angle_std)).mean(1)
        h = (jax.nn.sigmoid(h * 1e-1) - 0.5) * 2.0
        h = jnp.nan_to_num(h, nan=1.0)                          # [B, z]
        h = jax.lax.stop_gradient(h)

        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(sigma, h)


def _affine_stage(model):
    for name, stage in model.embedding.stages:
        if type(stage).__name__ == "LocalAffineEmbedding":
            return name, stage
    return None, None


@dataclass
class WarpRegularizer:
    """Low-rank constraint on learned local re-parameterizations
    (reference nlf/regularizers/warp.py:18-76): render the model's
    `embed_params` output (the LocalAffine stage's raw tform+bias,
    produced through the full ray_param + embedding pipeline) and
    penalize singular values beyond the top-2 of the per-ray transform.

    Divergence note: the reference's tform slicing (warp.py:64-67)
    takes `raw[..., :out_channels]` — out_channels SCALARS — then
    reshapes to [out_channels, param_channels], which silently merges
    param_channels rays per tform; that code path is exercised by zero
    shipped experiments and cannot be intentional. We implement the
    intended (and WarpLevelSetRegularizer-consistent, warp.py:134-137)
    semantics: tform = the first out_channels*param_channels entries."""

    cfg: dict

    def __post_init__(self):
        loss_cfg = self.cfg.get("loss", "mse")
        if isinstance(loss_cfg, dict):
            loss_cfg = loss_cfg.get("type", "mse")
        self.loss_fn = get_loss(loss_cfg)
        self.param_channels = int(self.cfg.get("param", {}).get("n_dims", 4))

    def loss(self, model, params, batch, ctx, system=None):
        name, stage = _affine_stage(model)
        if stage is None:
            return jnp.asarray(0.0)
        out = model.apply(params, batch["rays"], ctx,
                          {"fields": ["embed_params"]})
        raw = out["embed_params"]
        pc = self.param_channels
        out_channels = raw.shape[-1] // (pc + 1)
        M = raw[..., : out_channels * pc].reshape(
            raw.shape[0], out_channels, pc)
        S = jnp.linalg.svd(M, compute_uv=False)
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(S[..., 2:], jnp.zeros_like(S[..., 2:]))


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
    """Scene-flow supervision (reference nlf/regularizers/geometry.py:
    187-263): the model's predicted per-sample (start, end) point pairs —
    named fields produced by intersect stages' `out_points` — are pulled
    toward the ground-truth world point (from batch depth) and its
    flow-advected end position, masked to rays with valid flow/depth and
    nonzero predicted distance, optionally keeping only the `num_points`
    closest samples.

    When the batch carries no flow/depth supervision (no shipped
    reference experiment wires the field names either — the flow config's
    `raw_points_start/end` appear in no model yaml), falls back to the
    flow-magnitude + neighbor-smoothness prior on `spatial_flow`."""

    cfg: dict

    def __post_init__(self):
        self.fields = list(self.cfg.get(
            "fields", ["raw_points_start", "raw_points_end",
                       "raw_distance"]))
        self.origin = jnp.asarray(self.cfg.get("origin", [0.0, 0.0, 0.0]),
                                  jnp.float32)
        ccfg = self.cfg.get("contract")
        from hyperreel_tpu.ops.contract import get_contract
        self.contract = get_contract(ccfg)
        self.num_points = int(self.cfg.get("num_points", -1))

    def loss(self, model, params, batch, ctx, system=None):
        base = schedule_weight(self.cfg, ctx.it)
        if "flow" in batch and "depth" in batch:
            out = model.embed(params, batch["rays"], ctx,
                              {"fields": self.fields,
                               "no_over_fields": self.fields})
            if all(f in out for f in self.fields):
                B = batch["rays"].shape[0]
                p_start = out[self.fields[0]].reshape(B, -1, 3)
                p_end = out[self.fields[1]].reshape(B, -1, 3)
                p_dist = out[self.fields[2]].reshape(B, -1)

                rays = batch["rays"]
                o = rays[..., :3] - self.origin
                d = rays[..., 3:6]
                d = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
                gt_depth = batch["depth"].reshape(B, 1)
                gt_flow = batch["flow"].reshape(B, 3)
                gt_world = o + gt_depth * d
                gt_start = self.contract.contract_points(gt_world)
                gt_end = self.contract.contract_points(gt_world + gt_flow)
                gt = jnp.concatenate([gt_start, gt_end], -1)  # [B, 6]

                pred = jnp.concatenate([p_start, p_end], -1)  # [B, S, 6]
                mask = (jnp.any(gt_flow != 0.0, -1, keepdims=True)
                        & (gt_depth[..., 0:1] != 0.0)
                        & (p_dist != 0.0))
                diff = safe_norm(pred - gt[:, None, :], axis=-1,
                                 keepdims=False) \
                    * mask.astype(jnp.float32)
                if self.num_points > 0:
                    diff = -jax.lax.top_k(-diff, self.num_points)[0]
                return base * jnp.mean(diff)

        out = model.embed(params, batch["rays"], ctx,
                          {"fields": ["spatial_flow"]})
        if "spatial_flow" not in out:
            return jnp.asarray(0.0)
        flow = out["spatial_flow"]
        mag = jnp.mean(flow ** 2)
        smooth = jnp.mean((flow[:, 1:] - flow[:, :-1]) ** 2)
        return base * (mag * float(self.cfg.get("magnitude_weight", 0.01))
                       + smooth * float(self.cfg.get("smooth_weight", 1.0)))


@dataclass
class TeacherRegularizer:
    """Teacher supervision (reference nlf/regularizers/teacher.py:24-58):
    when the config names a teacher DATASET (dense renders from a trained
    teacher), its rays/rgb are fed host-side each step (System.batches ->
    host_batch) and the current model is supervised on them. Without a
    dataset config, a frozen in-memory teacher set via `set_teacher`
    distills on the train batch's rays."""

    cfg: dict
    teacher_model: object = None
    teacher_params: object = None

    def set_teacher(self, model, params):
        self.teacher_model = model
        self.teacher_params = params

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        self.batch_size = int(self.cfg.get("batch_size", 4096))
        self._ds = None
        self._ds_rng = np.random.default_rng(
            int(self.cfg.get("seed", 1717)))

    def host_batch(self, system=None):
        """Host-side teacher-dataset sampling, merged into the train batch
        (reference BaseRegularizer.get_dataset + get_batch)."""
        dcfg = self.cfg.get("dataset")
        if not dcfg:
            return {}
        if self._ds is None:
            from hyperreel_tpu.data import get_dataset
            kwargs = {k: v for k, v in dcfg.items()
                      if k not in ("name", "root_dir")}
            args = [dcfg["root_dir"]] if dcfg.get("root_dir") else []
            self._ds = get_dataset(dcfg["name"], *args, **kwargs)
        idx = self._ds_rng.integers(0, self._ds.num_rays, self.batch_size)
        return {"teacher_rays": self._ds.all_coords[idx],
                "teacher_rgb": self._ds.all_rgb[idx]}

    def loss(self, model, params, batch, ctx, system=None):
        base = schedule_weight(self.cfg, ctx.it)
        if "teacher_rays" in batch:
            out = model.apply(params, batch["teacher_rays"], ctx)
            return base * self.loss_fn(out["rgb"], batch["teacher_rgb"])
        if self.teacher_model is None:
            return jnp.asarray(0.0)
        target = jax.lax.stop_gradient(
            self.teacher_model.apply(self.teacher_params, batch["rays"],
                                     ctx)["rgb"])
        out = model.apply(params, batch["rays"], ctx)
        return base * self.loss_fn(out["rgb"], target)


@dataclass
class TeacherModelRegularizer(TeacherRegularizer):
    """Frozen-teacher distillation on synthetic rays (reference
    nlf/regularizers/teacher.py:119-248 TeacherModelRegularizer): builds a
    teacher model from cfg `model` (preset name or model-config dict),
    loads params from cfg `model_ckpt_path`, generates uniform random rays
    in cfg origin/direction/extra ranges, and regresses the student onto
    the teacher's rgb. `set_teacher` still works for in-memory teachers."""

    def __post_init__(self):
        super().__post_init__()
        self.origin_range = np.asarray(self.cfg.get(
            "origin_range", [[-1.0] * 3, [1.0] * 3]), np.float32)
        self.direction_range = np.asarray(self.cfg.get(
            "direction_range", [[-1.0] * 3, [1.0] * 3]), np.float32)
        self.extra_range = np.asarray(self.cfg.get(
            "extra_range", [[0.0], [0.0]]), np.float32)
        self._load_attempted = False

    def _ensure_teacher(self, student):
        if self.teacher_model is not None or self._load_attempted:
            return
        self._load_attempted = True
        mc = self.cfg.get("model")
        ck = self.cfg.get("model_ckpt_path")
        if mc is None or ck is None:
            return
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.train.checkpoint import restore_params
        if isinstance(mc, str):
            from hyperreel_tpu.config import MODEL_PRESETS
            from hyperreel_tpu.configs.presets import (
                convert_epochs_to_iters)
            mc = convert_epochs_to_iters(MODEL_PRESETS[mc]())
        teacher = build_model(mc, dataset_info=student.dataset_info)
        self.teacher_params = restore_params(ck, teacher)
        self.teacher_model = teacher

    def _random_rays(self, ctx, n, extra_cols):
        k1, k2, k3 = jax.random.split(ctx.rng, 3)
        lo, hi = self.origin_range
        o = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
        lo, hi = self.direction_range
        d = jax.random.uniform(k2, (n, 3)) * (hi - lo) + lo
        d = _normalize(d)
        cols = [o, d]
        if extra_cols > 0:
            lo, hi = self.extra_range[0], self.extra_range[1]
            width = min(extra_cols, lo.shape[0])
            e = jax.random.uniform(k3, (n, width)) * (hi[:width]
                                                      - lo[:width]) + lo[:width]
            if width < extra_cols:
                e = jnp.concatenate(
                    [e, jnp.zeros((n, extra_cols - width))], -1)
            cols.append(e)
        return jnp.concatenate(cols, -1)

    def loss(self, model, params, batch, ctx, system=None):
        self._ensure_teacher(model)
        if self.teacher_model is None:
            return jnp.asarray(0.0)
        rays = self._random_rays(ctx, batch["rays"].shape[0],
                                 batch["rays"].shape[-1] - 6)
        target = jax.lax.stop_gradient(
            self.teacher_model.apply(self.teacher_params, rays,
                                     ctx)["rgb"])
        out = model.apply(params, rays, ctx)
        base = schedule_weight(self.cfg, ctx.it)
        return base * self.loss_fn(out["rgb"], target)


def _gaussian_blur2d(img_hwc, radius):
    """Separable gaussian blur, kernel (2r+1), sigma r/3 (matches kornia
    gaussian_blur2d as used by the reference, teacher.py:94-98)."""
    sigma = radius / 3.0
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(radius, radius), (0, 0), (0, 0)]
    out = jnp.pad(img_hwc, pad, mode="edge")
    out = sum(k[i] * out[i:i + img_hwc.shape[0]]
              for i in range(2 * radius + 1))
    out = jnp.pad(out, [(0, 0), (radius, radius), (0, 0)], mode="edge")
    out = sum(k[i] * out[:, i:i + img_hwc.shape[1]]
              for i in range(2 * radius + 1))
    return out


@dataclass
class BlurryTeacherRegularizer(TeacherRegularizer):
    """Blurred-patch teacher supervision (reference teacher.py:60-116):
    draw a patch_width^2 CONTIGUOUS pixel patch from the teacher dataset,
    render it, gaussian-blur the PREDICTION (kernel 2r+1, sigma r/3),
    crop the r-pixel border from both, and apply the loss against the
    un-blurred teacher rgb.

    Without a config dataset, distills ray-group means against a frozen
    in-memory teacher (set_teacher) on the train batch's rays."""

    def __post_init__(self):
        super().__post_init__()
        self.patch_width = int(
            self.cfg.get("dataset", {}).get("patch_width", 32)
            if isinstance(self.cfg.get("dataset"), dict) else 32)
        self.blur_radius = int(self.cfg.get("blur_radius", 2))

    def host_batch(self, system=None):
        dcfg = self.cfg.get("dataset")
        if not dcfg:
            return {}
        if self._ds is None:
            from hyperreel_tpu.data import get_dataset
            kwargs = {k: v for k, v in dcfg.items()
                      if k not in ("name", "root_dir", "patch_width")}
            args = [dcfg["root_dir"]] if dcfg.get("root_dir") else []
            self._ds = get_dataset(dcfg["name"], *args, **kwargs)
        ds = self._ds
        W, H = ds.img_wh
        pw = self.patch_width
        img = int(self._ds_rng.integers(0, ds.num_images))
        x0 = int(self._ds_rng.integers(0, max(W - pw, 0) + 1))
        y0 = int(self._ds_rng.integers(0, max(H - pw, 0) + 1))
        rows = (np.arange(pw)[:, None] + y0) * W \
            + (np.arange(pw)[None, :] + x0) + img * W * H
        rows = rows.reshape(-1)
        return {"teacher_patch_rays": ds.all_coords[rows],
                "teacher_patch_rgb": ds.all_rgb[rows]}

    def loss(self, model, params, batch, ctx, system=None):
        base = schedule_weight(self.cfg, ctx.it)
        if "teacher_patch_rays" in batch:
            pw, r = self.patch_width, self.blur_radius
            pred = model.apply(params, batch["teacher_patch_rays"],
                               ctx)["rgb"].reshape(pw, pw, 3)
            gt = batch["teacher_patch_rgb"].reshape(pw, pw, 3)
            if r > 0:
                pred = _gaussian_blur2d(pred, r)[r:-r, r:-r]
                gt = gt[r:-r, r:-r]
            return base * self.loss_fn(pred, gt)
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
        return base * self.loss_fn(om, tm)


@dataclass
class FourierRegularizer:
    """Frequency-space supervision (reference nlf/regularizers/fourier.py
    + datasets/fourier.py): each step, a RANDOM full-image ray grid is
    synthesized host-side (random origin within +-range.pos at z=0,
    random per-pixel directions around -z — get_random_rays), the model
    renders it, and the per-image 2D FFT magnitude is matched against the
    train images' mean FFT magnitude. (The reference MSEs the render
    against EVERY image's FFT; the gradient of that mean-of-MSEs equals
    the MSE against the mean target, which is what ships here.)

    Without a System (standalone Trainer), falls back to matching
    rfft magnitudes of pred vs gt along the ray batch axis."""

    cfg: dict

    def __post_init__(self):
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        rng_cfg = self.cfg.get("range", {})
        self.pos_range = float(rng_cfg.get("pos", 0.25))
        self.dir_range = float(rng_cfg.get("dir", 0.25))
        self.max_side = int(self.cfg.get("max_side", 128))
        self._rng = np.random.default_rng(
            int(self.cfg.get("seed", 2024)))
        self._target = None
        self._wh = None
        self._ray_dim = None

    def _prepare(self, system):
        ds = system.train_dataset
        W, H = ds.img_wh
        stride = max(1, int(np.ceil(max(W, H) / self.max_side)))
        Ws, Hs = W // stride, H // stride
        imgs = ds.all_rgb[: ds.num_images * W * H].reshape(
            ds.num_images, H, W, 3)[:, ::stride, ::stride][:, :Hs, :Ws]
        fft = np.abs(np.fft.fft2(imgs, axes=(1, 2)))
        self._target = fft.mean(0).astype(np.float32)   # [Hs, Ws, 3]
        self._wh = (Ws, Hs)
        self._ray_dim = ds.all_coords.shape[-1]

    def host_batch(self, system=None):
        if system is None:
            return {}
        if self._target is None:
            self._prepare(system)
        Ws, Hs = self._wh
        pos = (self._rng.uniform(-1, 1, (1, 1, 3))
               * self.pos_range).astype(np.float32)
        pos[..., 2] = 0.0
        d = (self._rng.uniform(-1, 1, (Hs, Ws, 3))
             * self.dir_range).astype(np.float32)
        d[..., 2] = -1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate(
            [np.broadcast_to(pos, d.shape), d], -1).reshape(-1, 6)
        if self._ray_dim > 6:  # cam-idx / time channels -> zeros
            rays = np.concatenate(
                [rays, np.zeros((len(rays), self._ray_dim - 6),
                                np.float32)], -1)
        return {"fourier_rays": rays, "fourier_mean_fft": self._target}

    def loss(self, model, params, batch, ctx, system=None):
        base = schedule_weight(self.cfg, ctx.it)
        if "fourier_rays" in batch:
            target = batch["fourier_mean_fft"]
            Hs, Ws = target.shape[0], target.shape[1]
            out = model.apply(params, batch["fourier_rays"], ctx)["rgb"]
            pred_f = jnp.abs(jnp.fft.fft2(out.reshape(Hs, Ws, 3),
                                          axes=(0, 1)))
            return base * self.loss_fn(pred_f, target)
        out = model.apply(params, batch["rays"], ctx)["rgb"]
        pred_f = jnp.abs(jnp.fft.rfft(out, axis=0))
        gt_f = jnp.abs(jnp.fft.rfft(batch["rgb"], axis=0))
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
    """Level-set consistency (reference nlf/regularizers/warp.py:79-300
    WarpLevelSetRegularizer, non-subdivided path — the subdivided
    branch belongs to the vestigial subdivision family, zero shipped
    configs, SURVEY.md §2.10).

    The reference machinery, reproduced: one forward returns rgb AND
    the LocalAffine stage's raw (tform, bias) (`embed_params`); the
    beyond-top-2 right singular vectors of tform span the local level
    set; rays are re-parameterized (ray_param), jittered along those
    null-space directions (a bundle of `jitter.bundle_size` gaussian
    draws scaled by `jitter.pos`), and re-rendered with no_param=True
    (rays already in param space). Three weighted losses: color
    (rgb vs jittered rgb), svd (S[..., 2:] -> 0), level (jittered
    tform/bias vs original). Falls back to along-the-ray translation
    consistency of predicted points when no transform stage exists."""

    cfg: dict

    def __post_init__(self):
        def one(key, default="mse"):
            c = self.cfg.get(key, {}) or {}
            return (get_loss(c.get("type", default)),
                    float(c.get("weight", 1.0)))

        self.color_loss = one("color_loss")
        self.svd_loss = one("svd_loss")
        self.level_loss = one("level_loss")
        self.loss_fn = get_loss(self.cfg.get("loss", "mse"))
        self.step = float(self.cfg.get("step", 0.01))
        jit = self.cfg.get("jitter", {}) or {}
        self.jitter_pos = float(jit.get("pos", 0.01))
        self.bundle = int(jit.get("bundle_size", 1))
        self.param_channels = int(self.cfg.get("param", {}).get("n_dims", 6))

    def loss(self, model, params, batch, ctx, system=None):
        rays = batch["rays"]
        base = schedule_weight(self.cfg, ctx.it)
        name, stage = _affine_stage(model)
        if stage is None:
            stepped = jnp.concatenate(
                [rays[..., :3] + rays[..., 3:6] * self.step,
                 rays[..., 3:6], rays[..., 6:]], -1)
            kw = {"fields": ["points"]}
            a = model.apply(params, rays, ctx, kw)["points"]
            b = model.apply(params, stepped, ctx, kw)["points"]
            return base * self.loss_fn(a, b)

        out = model.apply(params, rays, ctx, {"fields": ["embed_params"]})
        rgb, raw = out["rgb"], out["embed_params"]
        pc = stage.param_channels
        oc = stage.tform_out_channels
        tform = raw[..., : oc * pc].reshape(raw.shape[0], oc, pc)
        bias = raw[..., -oc:] if stage.use_bias else raw[..., :0]
        _, S, vt = jnp.linalg.svd(tform, full_matrices=False)
        null = vt[..., 2:, :]                          # [B, pc-2, pc]

        # bundle of jitters along the null space (warp.py:153-166)
        B, nb = rays.shape[0], self.bundle
        k = jax.random.normal(
            jax.random.fold_in(ctx.rng, 311),
            (B, nb, null.shape[-2], 1)) * self.jitter_pos
        jdirs = jnp.mean(k * null[:, None], -2)        # [B, nb, pc]

        # jitter in PARAM space; re-render bypassing ray_param
        # (warp.py:196-201 no_param=True, apply_ndc=False)
        prays = model.ray_param.apply(rays)
        pad = prays.shape[-1] - pc
        jdirs = jnp.concatenate(
            [jdirs, jnp.zeros((B, nb, pad), jdirs.dtype)], -1) \
            if pad > 0 else jdirs[..., : prays.shape[-1]]
        jrays = (prays[:, None] + jdirs).reshape(B * nb, prays.shape[-1])
        jout = model.apply(params, jrays, ctx,
                           {"fields": ["embed_params"], "no_param": True})
        jrgb = jout["rgb"]
        jraw = jout["embed_params"]
        jtform = jraw[..., : oc * pc]
        jbias = jraw[..., -oc:] if stage.use_bias else jraw[..., :0]

        rep = lambda a: jnp.repeat(a[:, None], nb, 1).reshape(  # noqa: E731
            B * nb, -1)
        (cf, cw), (sf, sw), (lf, lw) = (
            self.color_loss, self.svd_loss, self.level_loss)
        total = cw * cf(rep(rgb), jrgb)
        total = total + sw * sf(S[..., 2:], jnp.zeros_like(S[..., 2:]))
        total = total + lw * (
            lf(jtform, rep(tform.reshape(B, oc * pc)))
            + lf(jbias, rep(bias)))
        return base * total


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
    "teacher_model": TeacherModelRegularizer,
    "blurry_teacher": BlurryTeacherRegularizer,
    "fourier": FourierRegularizer,
})
