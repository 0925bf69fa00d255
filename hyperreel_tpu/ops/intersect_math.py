"""Ray-primitive intersection math (reference: utils/intersect_utils.py).

All functions are pure jnp over static shapes. Rays are ``[..., 6+]`` with
origin in channels 0:3 and direction in 3:6. Distances are returned raw
(may be negative / zero); masking and sorting are handled by the intersect
stages (hyperreel_tpu/models/intersect.py).
"""

import jax.numpy as jnp

_EPS_DIR = 1e-5
_BIG = 1e12


def dot(a, b, axis=-1):
    return jnp.sum(a * b, axis=axis)


def safe_norm(v, axis=-1, keepdims=True, eps=1e-12):
    """NaN-free L2 norm: jnp.linalg.norm's sqrt has a 0/0 VJP at v = 0
    (the max-after-norm guard protects the division, not the sqrt), which
    poisons gradients whenever a sample lands exactly on the origin."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def sort_z(z_vals, axis=-1, descending=False):
    """Sort distances; returns (sorted, sort_idx) like reference
    utils/intersect_utils.py:12-17."""
    key = -z_vals if descending else z_vals
    sort_idx = jnp.argsort(key, axis=axis)
    return jnp.take_along_axis(z_vals, sort_idx, axis=axis), sort_idx


def sort_with(sort_idx, values):
    """Gather per-sample fields [B, S, C] with a [B, S] permutation
    (reference utils/intersect_utils.py:18-22)."""
    return jnp.take_along_axis(values, sort_idx[..., None], axis=1)


def _safe_dirs(rays_d):
    return jnp.where(jnp.abs(rays_d) < _EPS_DIR, jnp.full_like(rays_d, _BIG), rays_d)


def intersect_axis_plane(rays, val, dim):
    """t such that o[dim] + t*d[dim] == val
    (reference utils/intersect_utils.py:127-150).

    `val` broadcasts against rays[..., 0]; pass rays shaped [..., 1, 6] with
    val [..., S] for multi-plane intersection.
    """
    rays_o, rays_d = rays[..., :3], _safe_dirs(rays[..., 3:6])
    return (val - rays_o[..., dim]) / rays_d[..., dim]


def intersect_voxel_grid(rays, origin, val):
    """Intersect axis-aligned planes in all 3 dims at offsets `val`
    (reference utils/intersect_utils.py:152-179).

    rays: [B, 1, 6]; val: [B, S, 3] (or broadcastable). Returns [B, S*3].
    """
    rays_o = rays[..., :3] - origin
    rays_d = _safe_dirs(rays[..., 3:6])
    t = (val - rays_o) / rays_d
    return t.reshape(t.shape[0], -1)


def intersect_plane(rays, normal, distance):
    """General plane n.x = distance (reference
    utils/intersect_utils.py:210-236). rays [B, S, 6], normal [B, S, 3] or
    broadcastable, distance [B, S]."""
    rays_o, rays_d = rays[..., :3], rays[..., 3:6]
    o_dot_n = dot(rays_o, normal)
    d_dot_n = dot(rays_d, normal)
    d_dot_n = jnp.where(
        jnp.abs(d_dot_n) < _EPS_DIR, jnp.full_like(d_dot_n, _BIG), d_dot_n
    )
    t = (distance - o_dot_n) / d_dot_n
    return t.reshape(t.shape[0], -1)


def _quadratic_intersect(o2, d2, od, radius, continuous=False):
    a = d2
    b = 2.0 * od
    c = o2 - radius * radius
    disc = b * b - 4.0 * a * c
    if continuous:
        disc = jnp.abs(disc)
    else:
        disc = jnp.maximum(disc, 0.0)
    sq = jnp.sqrt(disc + 1e-8)
    t1 = (-b + sq) / (2.0 * a)
    t2 = (-b - sq) / (2.0 * a)
    t1 = jnp.where(disc <= 0, jnp.zeros_like(t1), t1)
    t2 = jnp.where(disc <= 0, jnp.zeros_like(t2), t2)
    # Prefer the near hit; fall back to far hit when behind the origin or
    # when radius < 0 flags the "far-side" convention.
    return jnp.where((t2 < 0) | (radius < 0), t1, t2)


def intersect_sphere(rays, origin, radius, continuous=False):
    """Concentric-sphere intersection (reference
    utils/intersect_utils.py:45-84)."""
    o = rays[..., :3] - origin
    d = rays[..., 3:6]
    return _quadratic_intersect(dot(o, o), dot(d, d), dot(o, d), radius, continuous)


def intersect_cylinder(rays, origin, radius, continuous=False):
    """Y-axis cylinder intersection (reference
    utils/intersect_utils.py:86-125): drop the y component."""
    o3 = rays[..., :3] - origin
    d3 = rays[..., 3:6]
    o = jnp.stack([o3[..., 0], o3[..., 2]], -1)
    d = jnp.stack([d3[..., 0], d3[..., 2]], -1)
    return _quadratic_intersect(dot(o, o), dot(d, d), dot(o, d), radius, continuous)


def _normalize(v, axis=-1, eps=1e-12):
    return v / safe_norm(v, axis=axis, keepdims=True, eps=eps)


def pluecker_closest_point(rays_o, rays_d):
    """Point on the ray closest to the origin via Pluecker coords
    (reference nlf/param.py:297-307)."""
    d = _normalize(rays_d)
    m = jnp.cross(rays_o, d)
    return jnp.cross(d, m)


def min_sphere_radius(rays, origin):
    """Smallest concentric sphere the ray touches (reference
    utils/intersect_utils.py:27-33)."""
    p = pluecker_closest_point(rays[..., :3] - origin, rays[..., 3:6])
    return safe_norm(p, axis=-1, keepdims=False)


def min_cylinder_radius(rays, origin):
    """Same for y-axis cylinders (reference utils/intersect_utils.py:35-43)."""
    rays_o = rays[..., :3] - origin
    rays_d = rays[..., 3:6]
    o = jnp.stack([rays_o[..., 0], jnp.zeros_like(rays_o[..., 1]), rays_o[..., 2]], -1)
    d = jnp.stack([rays_d[..., 0], jnp.zeros_like(rays_d[..., 1]), rays_d[..., 2]], -1)
    p = pluecker_closest_point(o, d)
    return safe_norm(p, axis=-1, keepdims=False)
