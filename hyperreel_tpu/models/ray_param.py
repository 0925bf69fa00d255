"""Ray parameterizations (reference: nlf/param.py).

Each factory returns an object with `.in_channels`, `.out_channels` and
`.apply(x)` (pure). The shipped configs exercise identity, two_plane and
pluecker (SURVEY.md §2.10); the rest are capability-parity extras.
"""

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.intersect_math import (
    intersect_axis_plane,
    intersect_sphere,
    pluecker_closest_point,
)


@dataclass
class RayParam:
    name: str
    in_channels: int
    out_channels: int
    apply: Callable


def _normalize(v, axis=-1, eps=1e-12):
    from hyperreel_tpu.ops.intersect_math import safe_norm
    return v / safe_norm(v, axis=axis, keepdims=True, eps=eps)


def identity_param(cfg, **kwargs):
    n = int(cfg.get("in_channels", cfg.get("n_dims", 6)))
    return RayParam("identity", n, int(cfg.get("n_dims", n)), lambda x: x)


def take_param(cfg, **kwargs):
    idx = tuple(cfg["input_channels"])
    n_in = int(cfg.get("in_channels", 6))

    def apply(x):
        return x[..., list(idx)]

    return RayParam("take", n_in, len(idx), apply)


def position_param(cfg, **kwargs):
    return RayParam("position", 6, 3, lambda rays: rays[..., :3])


def two_plane_param(cfg, **kwargs):
    """(x1, y1, x2, y2) at the z=near and z=far planes
    (reference nlf/param.py:63-118)."""
    near = float(cfg.get("near", -1.0))
    far = float(cfg.get("far", 0.0))
    origin = np.asarray(cfg.get("origin", [0.0, 0.0, 0.0]), np.float32)
    st_mult = float(cfg.get("st_multiplier", 1.0))
    uv_mult = float(cfg.get("uv_multiplier", 1.0))
    use_local = bool(cfg.get("use_local_param", False))
    voxel_size = float(cfg.get("voxel_size", 1.0))

    def apply(rays):
        rays_o = rays[..., :3] - origin
        rays_d = rays[..., 3:6]
        if use_local:
            z_off = jnp.round(rays_o[..., 2:3] / voxel_size) * voxel_size
            rays_o = rays_o - jnp.concatenate(
                [jnp.zeros_like(z_off), jnp.zeros_like(z_off), z_off], -1
            )
        r = jnp.concatenate([rays_o, rays_d], -1)
        t1 = intersect_axis_plane(r, near, 2)
        t2 = intersect_axis_plane(r, far, 2)
        p1 = (rays_o[..., :2] + rays_d[..., :2] * t1[..., None]) * st_mult
        p2 = (rays_o[..., :2] + rays_d[..., :2] * t2[..., None]) * uv_mult
        return jnp.concatenate([p1, p2], -1)

    return RayParam("two_plane", 6, int(cfg.get("n_dims", 4)), apply)


def pluecker_param(cfg, **kwargs):
    """(d, o x d) with unit direction (reference nlf/param.py:223-257)."""
    d_mult = float(cfg.get("direction_multiplier", 1.0))
    m_mult = float(cfg.get("moment_multiplier", 1.0))
    origin = np.asarray(cfg.get("origin", [0.0, 0.0, 0.0]), np.float32)
    use_local = bool(cfg.get("use_local_param", False))
    voxel_size = np.asarray(cfg.get("voxel_size", [1.0, 1.0, 1.0]), np.float32)

    def apply(rays):
        rays_o = rays[..., :3] - origin
        rays_d = _normalize(rays[..., 3:6])
        if use_local:
            snapped = jnp.round(rays_o / voxel_size) * voxel_size
            rays_o = rays_o - snapped
        m = jnp.cross(rays_o, rays_d)
        return jnp.concatenate([rays_d * d_mult, m * m_mult], -1)

    return RayParam("pluecker", 6, int(cfg.get("n_dims", 6)), apply)


def spherical_param(cfg, **kwargs):
    """Intersect a sphere and return the normalized hit point
    (reference nlf/param.py:322-360)."""
    radius = float(cfg.get("radius", 1.0))

    def apply(rays):
        t = intersect_sphere(rays, jnp.zeros(3), radius)
        pts = rays[..., :3] + rays[..., 3:6] * t[..., None]
        return pts / radius

    return RayParam("spherical", 6, int(cfg.get("n_dims", 3)), apply)


def xy_param(cfg, **kwargs):
    def apply(rays):
        r = rays.reshape(rays.shape[0], -1, 6)
        out = jnp.concatenate([r[..., :2], r[..., 3:5]], -1)
        return out.reshape(rays.shape[0], -1)

    return RayParam("xy", 6, int(cfg.get("n_dims", 4)), apply)


def rays_param(cfg, **kwargs):
    def apply(rays):
        r = rays.reshape(rays.shape[0], -1, 6)
        rays_o = r[..., :3]
        rays_d = _normalize(r[..., 3:6] - rays_o)
        return jnp.concatenate([rays_o, rays_d], -1).reshape(rays.shape[0], -1)

    return RayParam("rays", 6, int(cfg.get("n_dims", 6)), apply)


def pluecker_pos_param(cfg, **kwargs):
    def apply(rays):
        return pluecker_closest_point(rays[..., :3], rays[..., 3:6])

    return RayParam("pluecker_pos", 6, 3, apply)


def multi_plane_param(cfg, **kwargs):
    """Intersections with a stack of z-planes, (x, y) at each
    (reference nlf/param.py:121-160)."""
    initial_z = float(cfg.get("initial_z", -1.0))
    end_z = float(cfg.get("end_z", 1.0))
    z_channels = int(cfg.get("z_channels", 8))
    depths = np.linspace(initial_z, end_z, z_channels).astype(np.float32)

    def apply(rays):
        t = intersect_axis_plane(rays[:, None, :], depths[None, :], 2)
        pts = rays[:, None, :2] + rays[:, None, 3:5] * t[..., None]
        return pts.reshape(rays.shape[0], -1)

    return RayParam("multi_plane", 6, 2 * z_channels, apply)


def two_plane_matrix_param(cfg, **kwargs):
    """two_plane followed by a fixed affine matrix
    (reference nlf/param.py two_plane_matrix: a view-matrix re-projection of
    the two-plane coords)."""
    base = two_plane_param(cfg, **kwargs)
    M = np.asarray(cfg.get("matrix", np.eye(4)), np.float32)

    def apply(rays):
        return base.apply(rays) @ M.T[:4, :4]

    return RayParam("two_plane_matrix", 6, 4, apply)


def two_cylinder_param(cfg, **kwargs):
    """Intersections with two concentric y-axis cylinders
    (reference nlf/param.py two_cylinder)."""
    near = float(cfg.get("near", 0.5))
    far = float(cfg.get("far", 1.0))

    def apply(rays):
        t1 = intersect_cylinder_math(rays, np.zeros(3, np.float32), near)
        t2 = intersect_cylinder_math(rays, np.zeros(3, np.float32), far)
        p1 = rays[..., :3] + rays[..., 3:6] * t1[..., None]
        p2 = rays[..., :3] + rays[..., 3:6] * t2[..., None]
        return jnp.concatenate(
            [p1[..., 0:1], p1[..., 1:2], p2[..., 0:1], p2[..., 2:3]], -1)

    return RayParam("two_cylinder", 6, 4, apply)


def ray_plus_time_param(cfg, **kwargs):
    """Pass the ray plus trailing time channel through an inner param
    (reference nlf/param.py ray_plus_time)."""
    inner = get_ray_param(dict(cfg.get("param", {"fn": "identity"})))

    def apply(rays):
        return jnp.concatenate([inner.apply(rays[..., :6]),
                                rays[..., -1:]], -1)

    return RayParam("ray_plus_time", 7, inner.out_channels + 1, apply)


def voxel_center_param(cfg, **kwargs):
    """Snap origins to voxel centers (reference nlf/param.py voxel_center)."""
    voxel_size = float(cfg.get("voxel_size", 1.0))

    def apply(rays):
        center = jnp.round(rays[..., :3] / voxel_size) * voxel_size
        return jnp.concatenate([center, rays[..., 3:6]], -1)

    return RayParam("voxel_center", 6, 6, apply)


def z_slice_param(cfg, **kwargs):
    """(x, y) at a fixed z plane plus direction
    (reference nlf/param.py z_slice)."""
    z_val = float(cfg.get("z", 0.0))

    def apply(rays):
        t = intersect_axis_plane(rays, z_val, 2)
        pts = rays[..., :2] + rays[..., 3:5] * t[..., None]
        return jnp.concatenate([pts, rays[..., 3:6]], -1)

    return RayParam("z_slice", 6, 5, apply)


def contract_points_param(cfg, **kwargs):
    """Apply a scene contraction to a channel range of an inner param's
    output (reference nlf/param.py:258-295 ContractPointsParam)."""
    from hyperreel_tpu.ops.contract import get_contract
    inner = get_ray_param(dict(cfg["param"]))
    contract = get_contract(cfg.get("contract"))
    start = int(cfg.get("contract_start_channel", 0))
    end = int(cfg.get("contract_end_channel", 3))

    def apply(rays):
        p = inner.apply(rays)
        return jnp.concatenate([
            p[..., :start],
            contract.contract_points(p[..., start:end]),
            p[..., end:],
        ], -1)

    return RayParam("contract_points", inner.in_channels,
                    inner.out_channels, apply)


from hyperreel_tpu.ops.intersect_math import (  # noqa: E402
    intersect_cylinder as intersect_cylinder_math)

ray_param_dict = {
    "identity": identity_param,
    "take": take_param,
    "position": position_param,
    "two_plane": two_plane_param,
    "multi_plane": multi_plane_param,
    "two_plane_matrix": two_plane_matrix_param,
    "two_cylinder": two_cylinder_param,
    "ray_plus_time": ray_plus_time_param,
    "voxel_center": voxel_center_param,
    "z_slice": z_slice_param,
    "contract_points": contract_points_param,
    "pluecker": pluecker_param,
    "spherical": spherical_param,
    "xy": xy_param,
    "rays": rays_param,
    "pluecker_pos": pluecker_pos_param,
}


def get_ray_param(cfg, **kwargs):
    if cfg is None:
        return ray_param_dict["identity"]({})
    p = ray_param_dict[cfg["fn"]](cfg, **kwargs)
    return p
