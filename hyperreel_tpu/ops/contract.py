"""Scene contraction functions (reference: nlf/contract.py).

Each factory takes a plain-dict config and returns a `Contract` with pure-jnp
methods. `contract_samples=True` makes the z-plane intersect place its
linspace anchors in contracted space and invert predicted z values back to
metric distance (reference nlf/intersect/base.py:128-140).
"""

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.intersect_math import safe_norm


def _identity_act():
    return (lambda x: x), (lambda x: x)


def _tanh_act(fac):
    fwd = lambda x: jnp.tanh(x) * fac
    inv = lambda x: jnp.arctanh(jnp.clip(x / fac, -1 + 1e-7, 1 - 1e-7))
    return fwd, inv


def _identity_tanh_act(fac):
    # Almost-identity map onto [-1, 1] (reference nlf/activations.py:140-160).
    def fwd(x):
        x2 = x * 2.0
        return jnp.where(jnp.abs(x2) < 1.91501, x2, jnp.tanh(x2) * 2.0) * fac / 2.0

    def inv(x):
        x2 = (x / fac) * 2.0
        return jnp.where(
            jnp.abs(x2) < 1.91501, x2, jnp.arctanh(jnp.clip(x2 / 2.0, -1 + 1e-7, 1 - 1e-7))
        ) / 2.0

    return fwd, inv


def _get_distance_activation(cfg):
    act_cfg = cfg.get("distance_activation", None)
    if act_cfg is None:
        return _identity_act()
    t = act_cfg.get("type", act_cfg) if isinstance(act_cfg, dict) else act_cfg
    fac = act_cfg.get("fac", 1.0) if isinstance(act_cfg, dict) else 1.0
    if t == "identity":
        return _identity_act()
    if t == "tanh":
        return _tanh_act(fac)
    if t == "identity_tanh":
        return _identity_tanh_act(fac)
    raise ValueError(f"unsupported distance_activation {t}")


@dataclass
class Contract:
    name: str
    contract_samples: bool
    contract_points: Callable
    contract_distance: Callable
    inverse_contract_distance: Callable
    contract_points_and_distance: Callable
    # channels-first variant: points as a LEADING [3, ...] component axis
    # (the fused eval pipeline's row world, models/fused_eval.py) — the
    # norm reduces over axis 0 with full-lane rows instead of a
    # lane-padded [..., 3] minor axis. None = no CF form (CF eval
    # ineligible for this contraction).
    contract_points_cf: Callable = None
    # rows variant: (px, py, pz) -> (cx, cy, cz) on three same-shape 2D
    # arrays — strictly elementwise + cross-row sums, so it lowers inside
    # a Mosaic kernel (ops/pallas/pack_build.py). None = contraction
    # keeps the legacy CF-XLA embedding tail.
    contract_rows: Callable = None


def _make(name, cfg, contract_points, contract_distance, inverse_contract_distance,
          identity_points_and_distance=False, contract_points_cf=None,
          contract_rows=None):
    if identity_points_and_distance:
        def cpad(rays_o, points, distance):
            return points, distance
    else:
        def cpad(rays_o, points, distance):
            # reference nlf/contract.py:43-50
            o_c = contract_points(rays_o)
            p_c = contract_points(points)
            d_c = safe_norm(p_c - o_c[..., None, :])
            return p_c, d_c

    if contract_points_cf is None and identity_points_and_distance:
        contract_points_cf = lambda p: p
    return Contract(
        name=name,
        contract_samples=bool(cfg.get("contract_samples", False)),
        contract_points=contract_points,
        contract_distance=contract_distance,
        inverse_contract_distance=inverse_contract_distance,
        contract_points_and_distance=cpad,
        contract_points_cf=contract_points_cf,
        contract_rows=contract_rows,
    )


def identity_contract(cfg, **kwargs):
    ident = lambda x: x
    return _make("identity", cfg, ident, ident, ident,
                 identity_points_and_distance=True)


def bbox_contract(cfg, **kwargs):
    bbox_min = np.asarray(cfg.get("bbox_min", [-1.0, -1.0, -1.0]), np.float32)
    bbox_max = np.asarray(cfg.get("bbox_max", [1.0, 1.0, 1.0]), np.float32)
    fac = float(np.mean(np.abs(bbox_max - bbox_min)))

    def contract_points(points):
        return (points - bbox_min) / (bbox_max - bbox_min)

    def contract_points_cf(points):
        # leading [3, ...] component axis (fused CF eval)
        lo = jnp.asarray(bbox_min).reshape(
            (3,) + (1,) * (points.ndim - 1))
        hi = jnp.asarray(bbox_max).reshape(
            (3,) + (1,) * (points.ndim - 1))
        return (points - lo) / (hi - lo)

    def contract_rows(px, py, pz):
        return ((px - float(bbox_min[0])) / float(bbox_max[0] - bbox_min[0]),
                (py - float(bbox_min[1])) / float(bbox_max[1] - bbox_min[1]),
                (pz - float(bbox_min[2])) / float(bbox_max[2] - bbox_min[2]))

    return _make(
        "bbox", cfg,
        contract_points,
        lambda d: d / fac,
        lambda d: d * fac,
        contract_points_cf=contract_points_cf,
        contract_rows=contract_rows,
    )


def z_depth_contract(cfg, **kwargs):
    end_radius = float(cfg.get("contract_end_radius", float("inf")))
    fac = end_radius / 2.0

    return _make(
        "z_depth", cfg,
        lambda p: p / fac,
        lambda d: d / fac,
        lambda d: d * fac,
    )


def mipnerf_contract(cfg, **kwargs):
    """Piecewise linear -> 1/x contraction to radius 2
    (reference nlf/contract.py:112-192)."""
    if cfg.get("use_dataset_bounds") and "_dataset_depth_range" in cfg:
        # radii default to 1.5x the dataset depth range
        # (reference nlf/contract.py:121-127)
        dr = cfg["_dataset_depth_range"]
        start_r = float(cfg.get("contract_start_radius",
                                max(float(dr[0]) * 1.5, 1.0)))
        end_r = float(cfg.get("contract_end_radius", float(dr[1]) * 1.5))
    else:
        start_r = float(cfg.get("contract_start_radius", 1.0))
        end_r = float(cfg.get("contract_end_radius", float("inf")))
    start_d = float(cfg.get("contract_start_distance", start_r))
    end_d = float(cfg.get("contract_end_distance", end_r))
    act_fwd, act_inv = _get_distance_activation(cfg)

    inv_end_d = start_d / end_d if math.isfinite(end_d) else 0.0
    d_scale = 1.0 / (1.0 - inv_end_d)
    inv_end_r = start_r / end_r if math.isfinite(end_r) else 0.0
    r_scale = 1.0 / (1.0 - inv_end_r)

    def inverse_contract_distance(distance):
        distance = act_fwd(distance / 2.0) * 2.0
        distance = jnp.clip(distance, -2.0, 2.0)
        t = 2.0 - jnp.abs(distance)
        inverse_distance = t / d_scale + inv_end_d
        return jnp.where(
            jnp.abs(distance) < 1.0,
            distance,
            jnp.sign(distance) * (1.0 / inverse_distance),
        ) * start_d

    def contract_distance(distance):
        distance = distance / start_d
        inverse_distance = 1.0 / jnp.maximum(jnp.abs(distance), 1e-12)
        t = (inverse_distance - inv_end_d) * d_scale
        distance = jnp.where(
            jnp.abs(distance) < 1.0,
            distance,
            jnp.sign(distance) * (2.0 - t),
        )
        return act_inv(distance / 2.0) * 2.0

    def contract_points(points):
        points = points / start_r
        distance = safe_norm(points)
        inverse_distance = 1.0 / jnp.maximum(distance, 1e-12)
        t = (inverse_distance - inv_end_r) * r_scale
        return jnp.where(
            distance < 1.0,
            points,
            (points / jnp.maximum(distance, 1e-12)) * (2.0 - t),
        )

    def contract_points_cf(points):
        """Same math, components on the LEADING axis ([3, ...])."""
        points = points / start_r
        distance = jnp.sqrt(jnp.maximum(
            jnp.sum(points * points, 0, keepdims=True), 1e-24))
        inverse_distance = 1.0 / jnp.maximum(distance, 1e-12)
        t = (inverse_distance - inv_end_r) * r_scale
        return jnp.where(
            distance < 1.0,
            points,
            (points / jnp.maximum(distance, 1e-12)) * (2.0 - t),
        )

    def contract_rows(px, py, pz):
        """contract_points on three 2D rows (elementwise + row sums —
        Mosaic-lowerable; exact same math as contract_points_cf)."""
        px, py, pz = px / start_r, py / start_r, pz / start_r
        distance = jnp.sqrt(jnp.maximum(
            px * px + py * py + pz * pz, 1e-24))
        inverse_distance = 1.0 / jnp.maximum(distance, 1e-12)
        t = (inverse_distance - inv_end_r) * r_scale
        inside = distance < 1.0
        scale = jnp.where(
            inside, 1.0, (2.0 - t) / jnp.maximum(distance, 1e-12))
        return px * scale, py * scale, pz * scale

    return _make("mipnerf", cfg, contract_points, contract_distance,
                 inverse_contract_distance,
                 contract_points_cf=contract_points_cf,
                 contract_rows=contract_rows)


def donerf_contract(cfg, **kwargs):
    """Power contraction (reference nlf/contract.py:195-240)."""
    start_r = cfg.get("contract_start_radius", None)
    end_r = float(cfg.get("contract_end_radius", 10000.0))
    act_fwd, act_inv = _get_distance_activation(cfg)

    if start_r is None:
        power = float(cfg.get("power", 2.0))
        fac = (2.0 ** power) / end_r
    else:
        start_r = float(start_r)
        fac = 1.0 / start_r
        power = math.log(end_r / start_r) / math.log(2.0)

    def inverse_contract_distance(distance):
        distance = act_fwd(distance / 2.0) * 2.0
        distance = jnp.clip(distance, -2.0, 2.0)
        return jnp.power(jnp.abs(distance) + 1e-8, power) * jnp.sign(distance) / fac

    def contract_distance(distance):
        distance = distance * fac
        distance = jnp.power(jnp.abs(distance) + 1e-8, 1.0 / power) * jnp.sign(distance)
        return act_inv(distance / 2.0) * 2.0

    def contract_points(points):
        dists = safe_norm(points)
        return (points / jnp.maximum(dists, 1e-12)) * jnp.power(
            dists * fac + 1e-8, 1.0 / power
        )

    return _make("donerf", cfg, contract_points, contract_distance,
                 inverse_contract_distance)


contract_dict = {
    "identity": identity_contract,
    "bbox": bbox_contract,
    "z_depth": z_depth_contract,
    "mipnerf": mipnerf_contract,
    "donerf": donerf_contract,
}


def get_contract(cfg, **kwargs):
    if cfg is None:
        return contract_dict["identity"]({})
    return contract_dict[cfg["type"]](cfg, **kwargs)
