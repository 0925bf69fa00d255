"""Ray-primitive intersect stages (reference: nlf/intersect/).

TPU-first redesign of `Intersect.forward` (nlf/intersect/base.py:142-259):
static shapes throughout — invalid samples keep distance 0 and are masked by
the downstream color net rather than compacted; the sort is a fixed bitonic
network (ops/sort_network.py) — min/max/select passes over the static sample
axis, no gathers; iteration-gated dropout is a `jnp.where` on ``ctx.it``.

Each stage is an object with `.init(key)` (usually {}) and
`.apply(params, rays, x, ctx, render_kwargs)` mutating the sample-state dict.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.ops.contract import get_contract
from hyperreel_tpu.ops.intersect_math import (
    safe_norm,
    intersect_axis_plane,
    intersect_plane,
    intersect_sphere,
    intersect_cylinder,
    intersect_voxel_grid,
    min_sphere_radius,
    min_cylinder_radius,
    pluecker_closest_point,
    sort_z,
    sort_with,
)
from hyperreel_tpu.ops.sort_network import (
    bitonic_sort,
    bitonic_sort_with_payload,
)

# invalid-sample sentinel for invalid_sort_far (far beyond any scene
# distance, small enough that f32 math on it stays exact)
_FAR_SENTINEL = 1e9


def _uniform_weight_fn(cfg):
    def fn(rays, dists):
        return jnp.ones_like(dists)

    return fn


def _ease_max_weight_fn(cfg):
    """Down-weight rays whose dominant direction component is near an axis
    boundary (reference nlf/intersect/base.py:32-43)."""
    w_start = float(cfg.get("weight_start", 1.0))
    w_end = float(cfg.get("weight_end", 0.95))

    def fn(rays, dists):
        d = rays[..., 3:6]
        inf_norm = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
        d_norm = jnp.abs(d) / jnp.maximum(inf_norm, 1e-12)
        w = jnp.clip((d_norm - w_end) / (w_start - w_end), 0.0, 1.0)
        reps = dists.shape[1] // 3
        return jnp.tile(w[:, None, :], (1, reps, 1)).reshape(w.shape[0], -1)

    return fn


weight_fn_dict = {
    "uniform": _uniform_weight_fn,
    "ease_max": _ease_max_weight_fn,
}


@dataclass
class IntersectStage:
    """Shared z-processing / sort / mask driver. Subclass-like behaviour is
    provided through `intersect_fn(params, rays, z_vals)` supplied by the
    concrete builders below."""

    z_channels: int
    cfg: dict
    # filled by builder:
    samples: np.ndarray = None          # [Z, 1] anchor values
    z_scale: np.ndarray = None          # [*, 1]
    name: str = "intersect"

    def __post_init__(self):
        cfg = self.cfg
        self.in_density_field = cfg.get("in_density_field", "sigma")
        self.out_points = cfg.get("out_points", None)
        self.out_distance = cfg.get("out_distance", None)
        self.sort = bool(cfg.get("sort", False))
        self.normalize = bool(cfg.get("normalize", False))
        self.residual_z = bool(cfg.get("residual_z", False))
        self.residual_distance = bool(cfg.get("residual_distance", False))
        self.clamp = bool(cfg.get("clamp", False))
        self.use_disparity = bool(cfg.get("use_disparity", False))
        self.use_sigma = bool(cfg.get("use_sigma", False))
        self.origin = np.asarray(cfg.get("origin", [0.0, 0.0, 0.0]), np.float32)
        # min intersect distance for the validity mask: under
        # use_dataset_bounds the default is the DATASET near, not 0
        # (reference nlf/intersect/base.py:87-91)
        if "near" in cfg:
            self.near = float(cfg["near"])
        elif cfg.get("use_dataset_bounds", False):
            self.near = float(cfg.get("_dataset_bounds", (0.0, 1.0))[0])
        else:
            self.near = 0.0
        self.far = float(cfg.get("far", float("inf")))
        self.mask_stop_iters = float(cfg.get("mask", {}).get("stop_iters", float("inf")))
        self.contract = get_contract(cfg.get("contract", None))
        self.contract_stop_iters = float(
            cfg.get("contract", {}).get("stop_iters", float("inf"))
            if cfg.get("contract") else float("inf")
        )
        self.activation = get_activation(cfg.get("activation", "identity"))
        wf = cfg.get("weight_fn", None)
        self.weight_fn = weight_fn_dict[wf["type"]](wf) if wf else None
        self.sort_outputs: List[str] = list(cfg.get("sort_outputs", []))
        if self.weight_fn is not None:
            self.sort_outputs.append("weights")
        dropout = cfg.get("dropout", None)
        self.use_dropout = dropout is not None
        self.dropout_frequency = int(dropout.get("frequency", 2)) if dropout else 2
        self.dropout_stop_iter = float(dropout.get("stop_iter", float("inf"))) if dropout else float("inf")
        # TPU-native extension: sort masked-invalid samples to the FAR end
        # (sentinel before the sort, remapped to 0 after) instead of the
        # reference's 0-first arrangement. The valid samples then form a
        # nearest-first PREFIX, so render-time sample compaction is a
        # static first-k slice (see select_points mode="first"). Changes
        # only which prediction-slot pairs with which sorted position —
        # train and eval must agree on the arrangement.
        self.invalid_sort_far = bool(cfg.get("invalid_sort_far", False))

    def init(self, key):
        return {}

    # --- hooks implemented per primitive ---
    def intersect(self, params, rays, z_vals, x):
        raise NotImplementedError

    def process_z_vals(self, z_vals):
        """scale/shift against anchors, then undo sample-space contraction
        (reference nlf/intersect/base.py:128-140)."""
        B = z_vals.shape[0]
        z = z_vals.reshape(B, -1, self.z_scale.shape[-1])
        z = z * jnp.asarray(self.z_scale)[None] + jnp.asarray(self.samples)[None]
        z = z.reshape(B, -1)
        if self.contract.contract_samples:
            z = self.contract.inverse_contract_distance(z)
        elif self.use_disparity:
            z = jnp.where(jnp.abs(z) < 1e-8, jnp.full_like(z, 1e8), z)
            z = 1.0 / z
        return z

    def apply(self, params, rays, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        rays = jnp.concatenate(
            [rays[..., :3] - self.origin, rays[..., 3:6]], -1
        )
        B = rays.shape[0]

        z_vals = x["z_vals"].reshape(B, -1)

        if self.use_sigma and self.in_density_field in x:
            sigma = x[self.in_density_field].reshape(B, -1)
        else:
            sigma = jnp.zeros_like(z_vals)

        z3 = z_vals.reshape(B, sigma.shape[1], -1)
        z3 = self.activation(z3, ctx) * (1.0 - sigma[..., None])
        z_vals = z3.reshape(B, -1)

        # train-time dropout of predicted offsets (base.py:164-165)
        if self.use_dropout and ctx.training:
            gate = ((ctx.it % self.dropout_frequency) == 0) & (
                ctx.it < self.dropout_stop_iter
            )
            z_vals = jnp.where(gate, jnp.zeros_like(z_vals), z_vals)

        z_vals = self.process_z_vals(z_vals)

        if self.residual_z and "last_z" in x:
            last_z = x["last_z"].reshape(B, -1, 1)
            z_vals = (z_vals.reshape(B, last_z.shape[1], -1) + last_z).reshape(B, -1)
        else:
            x["last_z"] = z_vals

        dists = self.intersect(params, rays, z_vals, x)

        if self.weight_fn is not None:
            weights = self.weight_fn(rays, dists)
        else:
            weights = jnp.ones_like(dists)

        if "weights" not in x or x["weights"].shape[1] != weights.shape[1]:
            x["weights"] = weights[..., None]
        else:
            x["weights"] = x["weights"] * weights[..., None]

        mask = (dists <= self.near) | (dists >= self.far) | (weights == 0.0)
        mask = jnp.where(ctx.it > self.mask_stop_iters, jnp.zeros_like(mask), mask)
        if self.invalid_sort_far and self.sort:
            dists = jnp.where(mask, jnp.full_like(dists, _FAR_SENTINEL),
                              dists)
        else:
            dists = jnp.where(mask, jnp.zeros_like(dists), dists)

        if self.sort:
            # bitonic network instead of XLA's variadic sort HLO: pure
            # min/max/select passes over the static sample axis, no gathers
            # (measured ~30x faster with payloads at [262144, 32] on v5e)
            if self.sort_outputs:
                payloads, specs = [], []
                for key in self.sort_outputs:
                    v = x[key]
                    if v.ndim == dists.ndim:  # [B, S]
                        payloads.append(v)
                        specs.append((key, False))
                    else:  # [B, S, C] — sort axis to the back
                        payloads.append(jnp.moveaxis(v, -1, -2))
                        specs.append((key, True))
                dists, sorted_p = bitonic_sort_with_payload(dists, payloads)
                for (key, has_ch), v in zip(specs, sorted_p):
                    x[key] = jnp.moveaxis(v, -2, -1) if has_ch else v
            else:
                # values-only sort — the shipped configs list no
                # sort_outputs (SURVEY.md §2.10)
                dists = bitonic_sort(dists)

        # invalid_sort_far: sentinel distances stay — the sample point
        # lands far outside the aabb so the color net's validity mask
        # (valid_mask & dist > 0) excludes it, and the PRECEDING valid
        # sample's delta (sentinel - d_k) saturates its alpha exactly like
        # the reference's 1e10 last-sample delta. Remapping to 0 instead
        # would give that boundary sample a NEGATIVE delta.

        dists = dists[..., None]
        mask = dists == 0.0

        if self.residual_distance and "last_distance" in x:
            last = x["last_distance"].reshape(B, -1, 1, 1)
            dists = (dists.reshape(B, last.shape[1], -1, 1) + last).reshape(B, -1, 1)
        else:
            x["last_distance"] = dists

        points = rays[..., None, :3] + rays[..., None, 3:6] * dists

        if self.normalize:
            # cylindrical re-normalization (base.py:229-239)
            r = z_vals[..., None] + 1.0
            fac = 1.0 / jnp.sqrt((1.0 - r) ** 2 + r * r + 1e-8)
            points = jnp.concatenate(
                [points[..., :2] * fac, points[..., 2:3]], -1
            )

        if self.contract.name != "identity":
            points_c, dists_c = self.contract.contract_points_and_distance(
                rays[..., :3], points, dists
            )
            keep = ctx.it > self.contract_stop_iters
            points = jnp.where(keep, points, points_c)
            dists = jnp.where(keep, dists, jnp.where(mask, 0.0, dists_c))

        if self.out_points is not None:
            x[self.out_points] = points
        if self.out_distance is not None:
            x[self.out_distance] = dists

        x["points"] = points
        x["distances"] = dists
        x["z_vals"] = z_vals
        return x


def _make_anchor_schedule(z_channels, cfg, contract, near=None, far=None):
    """linspace anchors + z_scale (reference nlf/intersect/z.py:26-71)."""
    initial = float(cfg.get("initial", 0.0)) if near is None else near
    end = float(cfg.get("end", 1.0)) if far is None else far
    num_repeat = int(cfg.get("num_repeat", 1))
    use_disparity = bool(cfg.get("use_disparity", False))

    if contract.contract_samples:
        initial = float(contract.contract_distance(np.float32(initial)))
        end = float(contract.contract_distance(np.float32(end)))

    n = z_channels // num_repeat
    if use_disparity:
        samples = np.linspace(1.0 / end, 1.0 / initial, n)[::-1].copy()
    else:
        samples = np.linspace(initial, end, n)
    samples = np.tile(samples, num_repeat).reshape(-1, 1).astype(np.float32)

    if z_channels > 1:
        if "z_scale" in cfg:
            z_scale = float(cfg["z_scale"])
        elif "num_samples_for_scale" in cfg:
            z_scale = abs(samples[1, 0] - samples[0, 0]) * (
                z_channels / float(cfg["num_samples_for_scale"])
            )
        else:
            z_scale = abs(samples[1, 0] - samples[0, 0])
    else:
        z_scale = float(cfg.get("z_scale", 1.0))
    z_scale = np.asarray(z_scale, np.float32).reshape(-1, 1)
    return samples, z_scale, initial, end


@dataclass
class IntersectZPlane(IntersectStage):
    """Axis-aligned z-plane intersection (reference nlf/intersect/z.py)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        near = far = None
        if cfg.get("use_dataset_bounds", False):
            ds = cfg.get("_dataset_bounds", (0.0, 1.0))
            near, far = -float(ds[0]), -float(ds[1])
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract, near, far
        )
        self.use_local_prediction = bool(cfg.get("use_local_prediction", False))
        self.voxel_size = float(cfg.get("voxel_size", 1.0))

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        z_vals = z_vals.reshape(B, -1)
        if self.clamp:
            z_vals = jnp.clip(z_vals, self.initial, self.end)
        if self.use_local_prediction:
            origin = jnp.round(rays[..., 2:3] / self.voxel_size) * self.voxel_size
            z_vals = z_vals + origin
        return intersect_axis_plane(rays[:, None, :], z_vals, 2)


@dataclass
class IntersectSphere(IntersectStage):
    """Concentric spheres (reference nlf/intersect/primitive.py:366-441).

    Two predicted-z layouts, like the reference: 1 radius channel per
    sample (this repo's radius-only presets — exactly the reference math
    when origin_scale_factor == 0), or the reference's 4-channel blocks
    (origin scale x3 + radius; reference process_z_vals views z as
    [B, -1, 4], primitive.py:417-421) selected whenever the flat z width
    is a 4-multiple wider than z_channels."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        near = far = None
        if cfg.get("use_dataset_bounds", False):
            # reference: cfg.initial if present else 1.5x dataset bounds
            # (nlf/intersect/primitive.py:370-373)
            ds = cfg.get("_dataset_bounds", (0.0, 1.0))
            near = float(cfg["initial"]) if "initial" in cfg \
                else float(ds[0]) * 1.5
            far = float(cfg["end"]) if "end" in cfg else float(ds[1]) * 1.5
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract, near, far
        )
        self.origin_scale_factor = float(cfg.get("origin_scale_factor",
                                                 0.0))
        self.origin_initial = np.asarray(
            cfg.get("origin_initial", [1.0, 1.0, 1.0]), np.float32)

    def _blocked(self, z_vals):
        w = z_vals.shape[-1] if z_vals.ndim == 2 else z_vals.shape[-1]
        return w != self.z_channels and w % 4 == 0

    def process_z_vals(self, z_vals):
        if not self._blocked(z_vals):
            return super().process_z_vals(z_vals)
        B = z_vals.shape[0]
        z = z_vals.reshape(B, -1, 4)
        origins = z[..., :3] * self.origin_scale_factor \
            + jnp.asarray(self.origin_initial)
        radii = super().process_z_vals(z[..., -1])
        return jnp.concatenate([origins, radii[..., None]],
                               -1).reshape(B, -1)

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        if self._blocked(z_vals):
            z = z_vals.reshape(B, -1, 4)
            origins = z[..., :3]
            radii = z[..., -1]
            # reference primitive.py:424-440: origins SCALE the ray
            r = jnp.concatenate([rays[..., None, :3] * origins,
                                 rays[..., None, 3:6] * origins], -1)
            return intersect_sphere(r, jnp.zeros(3), radii)
        radii = z_vals.reshape(B, -1)
        if self.clamp:
            radii = jnp.clip(radii, self.initial, self.end)
        return intersect_sphere(rays[:, None, :], jnp.zeros(3), radii)


@dataclass
class IntersectSphereNew(IntersectStage):
    """Spheres with per-primitive resize + miss fallback
    (reference nlf/intersect/primitive.py:474-545): rays that miss a sphere
    fall back to the min-touch radius sphere distance via the Pluecker
    closest point."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        near = far = None
        if cfg.get("use_dataset_bounds", False):
            # reference nlf/intersect/primitive.py:479-486: initial is
            # near*1.5 when outward_facing else -far*1.5; end is far*1.5
            ds = cfg.get("_dataset_bounds", (0.0, 1.0))
            if "initial" in cfg:
                near = float(cfg["initial"])
            elif cfg.get("outward_facing", False):
                near = float(ds[0]) * 1.5
            else:
                near = -float(ds[1]) * 1.5
            far = float(cfg["end"]) if "end" in cfg else float(ds[1]) * 1.5
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract, near, far
        )
        self.resize = np.asarray(cfg.get("resize", [1.0, 1.0, 1.0]), np.float32)
        self.origin_scale_factor = float(cfg.get("origin_scale_factor",
                                                 0.0))
        self.resize_scale_factor = float(cfg.get("resize_scale_factor",
                                                 0.0))
        self.resize_initial = np.asarray(
            cfg.get("resize_initial", [1.0, 1.0, 1.0]), np.float32)

    def _blocked(self, z_vals):
        w = z_vals.shape[-1]
        return w != self.z_channels and w % 8 == 0

    def process_z_vals(self, z_vals):
        """8-channel blocks (reference primitive.py:490-504): per-sphere
        origin x3, resize x3, miss-fallback raw offset, radius."""
        if not self._blocked(z_vals):
            return super().process_z_vals(z_vals)
        B = z_vals.shape[0]
        z = z_vals.reshape(B, -1, 8)
        origins = z[..., :3] * self.origin_scale_factor
        resize = z[..., 3:6] * self.resize_scale_factor \
            + jnp.asarray(self.resize_initial)
        raw_offsets = super().process_z_vals(z[..., -2])
        radii = super().process_z_vals(z[..., -1])
        return jnp.concatenate(
            [origins, resize, raw_offsets[..., None], radii[..., None]],
            -1).reshape(B, -1)

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        zsc = jnp.asarray(np.asarray(self.z_scale, np.float32).reshape(-1))
        if self._blocked(z_vals):
            # reference primitive.py:506-545
            z = z_vals.reshape(B, -1, 8)
            origins, resize = z[..., :3], z[..., 3:6]
            raw_offsets, radii = z[..., -2], z[..., -1]
            rays_o = (rays[..., None, :3] - origins) * resize
            rays_d = rays[..., None, 3:6] * resize
            d_unit = rays_d / safe_norm(rays_d, axis=-1, keepdims=True)
            r = jnp.concatenate([rays_o, d_unit], -1)
            t = intersect_sphere(r, jnp.zeros(3), radii)
            min_r = min_sphere_radius(r, jnp.zeros(3))
            base_pos = pluecker_closest_point(rays_o, d_unit)
            diff = base_pos - rays_o
            base_distance = jnp.sign(jnp.sum(d_unit * diff, -1)) \
                * safe_norm(diff, axis=-1, keepdims=False)
            t = jnp.where(jnp.abs(radii) < min_r + 4.0 * zsc,
                          raw_offsets + base_distance, t)
            return t / (safe_norm(rays_d, axis=-1, keepdims=False) + 1e-5)
        radii = z_vals.reshape(B, -1)
        r = jnp.concatenate([rays[..., :3] * self.resize, rays[..., 3:6] * self.resize], -1)
        min_r = min_sphere_radius(r, jnp.zeros(3))[:, None]
        hit = radii >= min_r
        t = intersect_sphere(r[:, None, :], jnp.zeros(3), jnp.maximum(radii, min_r))
        # base distance to the closest point for non-hit spheres
        p = pluecker_closest_point(r[..., :3], r[..., 3:6])
        d_unit = r[..., 3:6] / safe_norm(r[..., 3:6], axis=-1, keepdims=True)
        t_base = jnp.sum((p - r[..., :3]) * d_unit, -1)[:, None]
        return jnp.where(hit, t, t_base)


@dataclass
class IntersectCylinder(IntersectStage):
    """Concentric y-axis cylinders (reference
    nlf/intersect/primitive.py:181-255). Like IntersectSphere, accepts
    the radius-only layout or the reference's 4-channel blocks
    (origin scale x3 + radius, primitive.py:230-254)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        near = far = None
        if cfg.get("use_dataset_bounds", False):
            ds = cfg.get("_dataset_bounds", (0.0, 1.0))
            near = float(cfg["initial"]) if "initial" in cfg \
                else float(ds[0]) * 1.5
            far = float(cfg["end"]) if "end" in cfg else float(ds[1]) * 1.5
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract, near, far
        )
        self.origin_scale_factor = float(cfg.get("origin_scale_factor",
                                                 0.0))
        self.origin_initial = np.asarray(
            cfg.get("origin_initial", [1.0, 1.0, 1.0]), np.float32)

    def _blocked(self, z_vals):
        w = z_vals.shape[-1]
        return w != self.z_channels and w % 4 == 0

    def process_z_vals(self, z_vals):
        if not self._blocked(z_vals):
            return super().process_z_vals(z_vals)
        B = z_vals.shape[0]
        z = z_vals.reshape(B, -1, 4)
        origins = z[..., :3] * self.origin_scale_factor \
            + jnp.asarray(self.origin_initial)
        radii = super().process_z_vals(z[..., -1])
        return jnp.concatenate([origins, radii[..., None]],
                               -1).reshape(B, -1)

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        if self._blocked(z_vals):
            z = z_vals.reshape(B, -1, 4)
            origins = z[..., :3]
            radii = z[..., -1]
            r = jnp.concatenate([rays[..., None, :3] * origins,
                                 rays[..., None, 3:6] * origins], -1)
            return intersect_cylinder(r, jnp.zeros(3), radii)
        radii = z_vals.reshape(B, -1)
        if self.clamp:
            radii = jnp.clip(radii, self.initial, self.end)
        return intersect_cylinder(rays[:, None, :], jnp.zeros(3), radii)


@dataclass
class IntersectVoxelGrid(IntersectStage):
    """Axis-aligned planes in all 3 dims, z_channels/3 per axis
    (reference nlf/intersect/voxel.py:19-112)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        self.outward_facing = bool(cfg.get("outward_facing", False))
        self.max_axis = bool(cfg.get("max_axis", False))
        assert self.z_channels % 3 == 0, self.z_channels
        n = self.z_channels // 3
        # per-axis anchors (reference voxel.py:46-63): initial/end are
        # 3-vectors, a z/3-point linspace per axis, z_scale per axis;
        # under use_dataset_bounds they default to the dataset bbox
        # scaled by `fac` (reference voxel.py:25-29)
        if cfg.get("use_dataset_bounds", False) and "_dataset_bbox" in cfg:
            fac = float(cfg.get("fac", 1.0))
            bb_min, bb_max = cfg["_dataset_bbox"]
            d_initial = np.asarray(bb_min, np.float32) * fac
            d_end = np.asarray(bb_max, np.float32) * fac
        else:
            d_initial = [0.0] * 3
            d_end = [1.0] * 3
        initial = np.asarray(cfg.get("initial", d_initial),
                             np.float32).reshape(-1)
        end = np.asarray(cfg.get("end", d_end), np.float32).reshape(-1)
        if initial.size == 1:
            initial = np.repeat(initial, 3)
        if end.size == 1:
            end = np.repeat(end, 3)
        if self.contract.contract_samples:
            initial = np.asarray(self.contract.contract_distance(initial),
                                 np.float32)
            end = np.asarray(self.contract.contract_distance(end),
                             np.float32)
        samples = np.stack(
            [np.linspace(initial[d], end[d], n) for d in range(3)],
            -1).astype(np.float32)                     # [n, 3]
        if "z_scale" in cfg:
            z_scale = np.asarray(cfg["z_scale"], np.float32)
        elif n > 1:
            z_scale = np.abs(samples[1] - samples[0])
        else:
            z_scale = np.ones(3, np.float32)
        self.z_scale = np.where(z_scale == 0.0, 1.0,
                                z_scale).astype(np.float32)
        self.samples = samples
        self.initial, self.end = initial, end

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        vals = z_vals.reshape(B, -1, 3)
        if self.outward_facing:
            d = rays[..., 3:6]
            vals = vals * jnp.sign(d)[:, None, :]
        dists = intersect_voxel_grid(rays[:, None, :], jnp.zeros(3), vals)
        if self.max_axis:
            # keep only the dominant-direction axis' planes
            # (reference voxel.py:99-112)
            d = jnp.abs(rays[..., 3:6])
            keep = d >= (jnp.max(d, -1, keepdims=True) - 1e-8)
            dists = jnp.where(
                jnp.tile(keep[:, None, :], (1, vals.shape[1], 1)).reshape(
                    B, -1),
                dists.reshape(B, -1), 0.0)
        return dists


@dataclass
class IntersectEuclidean(IntersectStage):
    """Direct distance prediction (reference
    nlf/intersect/primitive.py:72-123): anchor end defaults to 2.0 and
    min_radius > 0 re-centers distances on the origin distance."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        self.min_radius = float(cfg.get("min_radius", 0.0))
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract,
            far=float(cfg.get("end", 2.0)),
        )

    def intersect(self, params, rays, z_vals, x):
        dist = z_vals.reshape(z_vals.shape[0], -1)
        if self.min_radius > 0:
            # reference primitive.py:113-121: distance += distance - |o|
            d_from_o = safe_norm(rays[..., :3], axis=-1, keepdims=True)
            dist = dist + (dist - d_from_o)
        return dist


@dataclass
class IntersectEuclideanUnified(IntersectStage):
    """Distance prediction unified to the ray's Pluecker closest point
    (reference nlf/intersect/primitive.py:126-179): anchors span
    [-far, far] under use_dataset_bounds, and the predicted distance is
    offset by the signed distance from the ray origin to the closest
    point to the world origin (pluecker_pos, nlf/param.py:297-307)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        near = far = None
        if cfg.get("use_dataset_bounds", False):
            ds = cfg.get("_dataset_bounds", (0.0, 1.0))
            near = float(cfg["initial"]) if "initial" in cfg \
                else -float(ds[1])
            far = float(cfg["end"]) if "end" in cfg else float(ds[1])
        self.samples, self.z_scale, self.initial, self.end = _make_anchor_schedule(
            self.z_channels, cfg, self.contract, near, far
        )

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        dist = z_vals.reshape(B, -1)
        rays_o, rays_d = rays[..., :3], rays[..., 3:6]
        base_pos = pluecker_closest_point(rays_o, rays_d)
        diff = base_pos - rays_o
        off = jnp.sign(jnp.sum(rays_d * diff, -1)) \
            * safe_norm(diff, axis=-1, keepdims=False)
        return dist + off[:, None]


@dataclass
class IntersectPlane(IntersectStage):
    """General planes with per-sample predicted normals: z_vals carry
    (nx, ny, nz, d) per sample; anchors apply to the distance channel only
    (reference nlf/intersect/primitive.py:26-69)."""

    def __post_init__(self):
        super().__post_init__()
        self.samples, self.z_scale, self.initial, self.end = \
            _make_anchor_schedule(self.z_channels, self.cfg, self.contract)

    def process_z_vals(self, z_vals):
        B = z_vals.shape[0]
        z4 = z_vals.reshape(B, -1, 4)
        d = super().process_z_vals(z4[..., -1])
        return jnp.concatenate([z4[..., :3], d[..., None]], -1).reshape(B, -1)

    def intersect(self, params, rays, z_vals, x):
        z4 = z_vals.reshape(z_vals.shape[0], -1, 4)
        normal = z4[..., :3]
        return intersect_plane(rays[:, None, :], normal, z4[..., -1])


@dataclass
class IntersectDeformableVoxelGrid(IntersectStage):
    """Learned-normal axis grids: per sample (dnx, dny, dnz, d) where the
    normal is start_normal + scale*offset, normalized
    (reference nlf/intersect/voxel.py:115-215)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        self.start_normal = np.asarray(
            cfg.get("start_normal",
                    [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]), np.float32)
        self.num_axes = len(self.start_normal)
        self.normal_scale_factor = float(cfg.get("normal_scale_factor", 0.1))
        zc = self.z_channels // self.num_axes
        initial = np.asarray(cfg.get("initial", [0.0] * self.num_axes))
        end = np.asarray(cfg.get("end", [1.0] * self.num_axes))
        samples = np.stack(
            [np.linspace(initial[d], end[d], zc) for d in
             range(self.num_axes)], -1).reshape(-1, 1).astype(np.float32)
        self.samples = samples
        if "z_scale" in cfg:
            z_scale = np.asarray(cfg["z_scale"], np.float32)
        elif zc > 1:
            z_scale = np.abs(samples[1] - samples[0])
        else:
            z_scale = np.ones((self.num_axes,), np.float32)
        z_scale = np.where(z_scale == 0.0, 1.0, z_scale)
        self.z_scale = np.asarray(z_scale, np.float32).reshape(-1, 1)

    def process_z_vals(self, z_vals):
        B = z_vals.shape[0]
        z4 = z_vals.reshape(B, -1, 4)
        d = super().process_z_vals(z4[..., -1])
        return jnp.concatenate([z4[..., :3], d[..., None]], -1).reshape(B, -1)

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        z4 = z_vals.reshape(B, -1, 4)
        offset = z4[..., :3].reshape(B, -1, self.num_axes, 3)
        normal = offset * self.normal_scale_factor + self.start_normal
        normal = normal.reshape(B, -1, 3)
        normal = normal / safe_norm(normal, axis=-1, keepdims=True)
        return intersect_plane(rays[:, None, :], normal, z4[..., -1])


@dataclass
class IntersectCylinderNew(IntersectStage):
    """Cylinders with per-primitive origin/resize transform and min-radius
    fallback for non-hit rays (reference
    nlf/intersect/primitive.py:181-363 'New' variant)."""

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        self.samples, self.z_scale, self.initial, self.end = \
            _make_anchor_schedule(self.z_channels, cfg, self.contract)
        self.resize = np.asarray(cfg.get("resize", [1.0, 1.0, 1.0]),
                                 np.float32)

    def intersect(self, params, rays, z_vals, x):
        B = z_vals.shape[0]
        radii = z_vals.reshape(B, -1)
        r = jnp.concatenate(
            [rays[..., :3] * self.resize, rays[..., 3:6] * self.resize], -1)
        min_r = min_cylinder_radius(r, jnp.zeros(3))[:, None]
        t = intersect_cylinder(r[:, None, :], jnp.zeros(3),
                               jnp.maximum(radii, min_r))
        d_flat = jnp.concatenate(
            [r[..., 3:4], jnp.zeros_like(r[..., 4:5]), r[..., 5:6]], -1)
        d_unit = d_flat / safe_norm(d_flat, axis=-1, keepdims=True)
        o_flat = jnp.concatenate(
            [r[..., 0:1], jnp.zeros_like(r[..., 1:2]), r[..., 2:3]], -1)
        p = pluecker_closest_point(o_flat, d_flat)
        t_base = jnp.sum((p - o_flat) * d_unit, -1)[:, None]
        return jnp.where(radii >= min_r, t, t_base)


intersect_dict = {
    "z_plane": IntersectZPlane,
    # alias: shiny_z_tensorf.yaml says `type: z`, which the reference's
    # own registry lacks (nlf/intersect/z.py:100-102 — a stale config);
    # accepted here so the shipped experiment runs
    "z": IntersectZPlane,
    "plane": IntersectPlane,
    "sphere": IntersectSphere,
    "sphere_new": IntersectSphereNew,
    "cylinder": IntersectCylinder,
    "cylinder_new": IntersectCylinderNew,
    "voxel_grid": IntersectVoxelGrid,
    "deformable_voxel_grid": IntersectDeformableVoxelGrid,
    "euclidean_distance": IntersectEuclidean,
    "euclidean_distance_unified": IntersectEuclideanUnified,
}


def build_intersect(z_channels, cfg, **kwargs):
    return intersect_dict[cfg["type"]](z_channels=z_channels, cfg=cfg)
