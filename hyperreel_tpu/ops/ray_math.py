"""Ray generation math (reference: utils/ray_utils.py). Host-side numpy by
default (datasets precompute rays); pass xp=jnp for on-device generation
(the interactive viewer path)."""

import numpy as np


def get_ray_directions_K(H, W, K, centered_pixels=False, flipped=False,
                         xp=np):
    """Per-pixel camera-space ray directions from intrinsics K
    (reference utils/ray_utils.py:103-118). Returns [H, W, 3] in the
    OpenGL-style convention (x right, y up, z backward):
    ((i - cx)/fx, -(j - cy)/fy, -1)."""
    j, i = xp.meshgrid(
        xp.arange(H, dtype=xp.float32),
        xp.arange(W, dtype=xp.float32),
        indexing="ij",
    )
    off = 0.5 if centered_pixels else 0.0
    y = (j - K[1][2] + off) / K[1][1]
    dirs = xp.stack([
        (i - K[0][2] + off) / K[0][0],
        y if flipped else -y,
        -xp.ones_like(i),
    ], -1)
    return dirs


def get_rays(directions, c2w, normalize=True, xp=np):
    """Rotate camera-space dirs into world space and broadcast the origin
    (reference utils/ray_utils.py:120-135). directions [..., 3],
    c2w [3, 4] -> (rays_o, rays_d) each [N, 3]."""
    c2w = xp.asarray(c2w)
    rays_d = directions @ c2w[:, :3].T
    if normalize:
        rays_d = rays_d / xp.maximum(
            xp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    rays_o = xp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3).copy(), rays_d.reshape(-1, 3)


def get_ndc_rays_fx_fy(H, W, fx, fy, near, rays, xp=np):
    """Shift rays to the near plane and project to NDC
    (reference utils/ray_utils.py:137-164). rays [..., 6] -> [..., 6]."""
    rays_o, rays_d = rays[..., 0:3], rays[..., 3:6]
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * fx)) * ox_oz
    o1 = -1.0 / (H / (2.0 * fy)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * fx)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * fy)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return xp.concatenate(
        [xp.stack([o0, o1, o2], -1), xp.stack([d0, d1, d2], -1)], -1)


def _normalize_rows(v, xp):
    return v / xp.maximum(xp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def get_lightfield_rays(U, V, s, t, aspect, st_scale=1.0, uv_scale=1.0,
                        near=-1.0, far=0.0, xp=np):
    """Two-plane (s,t,u,v) light-field ray grid
    (reference utils/ray_utils.py:14-45): origins (s, t) on the z=near
    plane, directions toward (u, v) on the z=far plane; v runs top-down."""
    u = xp.linspace(-1.0, 1.0, U, dtype=xp.float32)
    v = xp.linspace(1.0, -1.0, V, dtype=xp.float32) / aspect
    vg, ug = xp.meshgrid(v, u, indexing="ij")
    u = (ug * uv_scale).reshape(-1)
    v = (vg * uv_scale).reshape(-1)
    s_arr = xp.full_like(u, s * st_scale)
    t_arr = xp.full_like(v, t * st_scale)

    dirs = xp.stack([u - s_arr, v - t_arr,
                     xp.full_like(u, far - near)], -1)
    origins = xp.stack([s_arr, t_arr, xp.full_like(u, near)], -1)
    return xp.concatenate([origins, _normalize_rows(dirs, xp)], -1)


def get_epi_rays(U, v, S, t, aspect, st_scale=1.0, uv_scale=1.0,
                 near=-1.0, far=0.0, xp=np):
    """Epipolar-plane rays: sweep s and u for fixed (v, t)
    (reference utils/ray_utils.py:47-78)."""
    u = xp.linspace(-1.0, 1.0, U, dtype=xp.float32)
    s = xp.linspace(-1.0, 1.0, S, dtype=xp.float32) / aspect
    sg, ug = xp.meshgrid(s, u, indexing="ij")
    u = (ug * uv_scale).reshape(-1)
    s_arr = (sg * st_scale).reshape(-1)
    v_arr = xp.full_like(u, v * uv_scale)
    t_arr = xp.full_like(s_arr, t * st_scale)

    dirs = xp.stack([u - s_arr, v_arr - t_arr,
                     xp.full_like(u, far - near)], -1)
    origins = xp.stack([s_arr, t_arr, xp.full_like(u, near)], -1)
    return xp.concatenate([origins, _normalize_rows(dirs, xp)], -1)


def get_weight_map(rays, jitter_rays, softmax_temp=1.0, xp=np):
    """Ray-similarity weights between jittered ray pairs
    (reference utils/ray_utils.py:166+, used by ray-density regularizers)."""
    d = xp.linalg.norm(rays - jitter_rays, axis=-1)
    w = np.exp(-d * softmax_temp)
    return w / xp.maximum(w.sum(), 1e-12)
