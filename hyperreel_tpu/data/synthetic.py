"""Synthetic datasets for tests and benchmarks — no downloads needed
(the reference relies on external datasets; its closest analogs are the
random-ray regularizer datasets, datasets/random.py).

`gaussian_blob_scene` renders ground truth by dense ray-marching an analytic
density field (a few colored gaussian blobs), so a correct model must be
able to fit it and PSNR is a meaningful training signal.
"""

import numpy as np

from hyperreel_tpu.data.base import RayDataset
from hyperreel_tpu.ops.ray_math import get_ray_directions_K, get_rays


def _blob_field(points, blobs):
    """density, rgb at [N, 3] points for a list of
    (center[3], radius, color[3], peak)."""
    sigma = np.zeros(points.shape[0], np.float32)
    rgb_acc = np.zeros((points.shape[0], 3), np.float32)
    for center, radius, color, peak in blobs:
        d2 = np.sum((points - center) ** 2, -1)
        dens = peak * np.exp(-d2 / (2 * radius ** 2))
        sigma += dens
        rgb_acc += dens[:, None] * color
    rgb = rgb_acc / np.maximum(sigma[:, None], 1e-8)
    return sigma, rgb


def _march(rays_o, rays_d, blobs, near, far, n_steps=192, bg=0.0):
    """Dense-ray-march ground truth (numpy, reference-free)."""
    t = np.linspace(near, far, n_steps, dtype=np.float32)
    delta = (far - near) / (n_steps - 1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[None, :, None]
    sigma, rgb = _blob_field(pts.reshape(-1, 3), blobs)
    sigma = sigma.reshape(len(rays_o), n_steps)
    rgb = rgb.reshape(len(rays_o), n_steps, 3)
    alpha = 1.0 - np.exp(-sigma * delta)
    T = np.cumprod(1.0 - alpha + 1e-10, -1)
    T = np.concatenate([np.ones_like(T[:, :1]), T[:, :-1]], -1)
    w = alpha * T
    out = np.sum(w[..., None] * rgb, 1) + bg * (1.0 - w.sum(-1, keepdims=True))
    return out.astype(np.float32)


_DEFAULT_BLOBS = [
    (np.array([0.0, 0.0, 0.0], np.float32), 0.25,
     np.array([0.9, 0.2, 0.2], np.float32), 12.0),
    (np.array([0.35, 0.2, 0.1], np.float32), 0.18,
     np.array([0.2, 0.8, 0.3], np.float32), 10.0),
    (np.array([-0.3, -0.25, -0.2], np.float32), 0.2,
     np.array([0.2, 0.3, 0.9], np.float32), 10.0),
]


def gaussian_blob_scene(n_views=8, wh=(32, 32), dynamic=False,
                        num_frames=8, num_keyframes=4, seed=0,
                        cam_distance=2.0):
    """Forward-facing cameras on a small arc looking at blobs near the
    origin. Dynamic variant translates the first blob over time."""
    W, H = wh
    f = 1.2 * W
    K = [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]
    dirs = get_ray_directions_K(H, W, K, centered_pixels=True)

    coords_list, rgb_list = [], []
    frames = range(num_frames) if dynamic else [0]
    for view in range(n_views):
        ang = (view / max(n_views - 1, 1) - 0.5) * 0.6
        cx, cy = np.sin(ang) * 0.5, np.cos(ang) * 0.1 - 0.05
        c2w = np.array([
            [1.0, 0.0, 0.0, cx],
            [0.0, 1.0, 0.0, cy],
            [0.0, 0.0, 1.0, cam_distance],
        ], np.float32)
        rays_o, rays_d = get_rays(dirs, c2w)
        for fi in frames:
            t_norm = fi / max(num_frames - 1, 1)
            blobs = [list(b) for b in _DEFAULT_BLOBS]
            if dynamic:
                blobs[0][0] = blobs[0][0] + np.array(
                    [0.3 * t_norm, 0.0, 0.0], np.float32)
            blobs = [tuple(b) for b in blobs]
            rgb = _march(rays_o, rays_d, blobs, near=0.5, far=3.5)
            if dynamic:
                coords = np.concatenate([
                    rays_o, rays_d,
                    np.full((len(rays_o), 1), view, np.float32),
                    np.full((len(rays_o), 1), t_norm, np.float32),
                ], -1)
            else:
                coords = np.concatenate([rays_o, rays_d], -1)
            coords_list.append(coords.astype(np.float32))
            rgb_list.append(rgb)

    ds = RayDataset(
        all_coords=np.concatenate(coords_list, 0),
        all_rgb=np.concatenate(rgb_list, 0),
        img_wh=wh,
        num_images=n_views * len(list(frames)),
        num_keyframes=num_keyframes if dynamic else 1,
        num_frames=num_frames if dynamic else 1,
        num_views=n_views,
        near=0.5,
        far=3.5,
        depth_range=(0.5, 3.5),
    )
    return ds


def _hostile_field(points, dirs, t_norm=0.0):
    """Hostile analytic scene: density, view-dependent rgb at [N, 3]
    points with unit view dirs [N, 3].

    Stresses exactly what the smooth gaussian-blob scene cannot
    (PERFORMANCE.md quality ladders caveat): hard occlusion boundaries
    (thin near-opaque bars in front of content), high-frequency texture
    (multi-band sinusoid x checker back wall), and specular
    view-dependent shading (Blinn lobe on a sharp-edged sphere). The
    dynamic variant sweeps the middle occluder bar across the textured
    wall so temporal supervision sees moving hard edges."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    sigma = np.zeros(len(points), np.float32)
    rgb_acc = np.zeros((len(points), 3), np.float32)

    def edge(v, k=200.0):
        return 1.0 / (1.0 + np.exp(np.clip(-k * v, -30, 30)))

    # 1. textured back wall: slab z in [-0.85, -0.72]
    wall = 60.0 * edge(z - (-0.85)) * edge((-0.72) - z)
    tex = np.stack([
        0.5 + 0.5 * np.sin(19.0 * x) * np.sin(23.0 * y),
        0.5 + 0.5 * np.sin(31.0 * x + 1.3) * np.cos(17.0 * y),
        0.5 + 0.5 * np.cos(27.0 * x) * np.sin(29.0 * y + 0.7),
    ], -1).astype(np.float32)
    checker = ((np.floor(x * 6.0) + np.floor(y * 6.0)) % 2.0)
    tex = tex * (0.35 + 0.65 * checker[:, None])
    sigma += wall
    rgb_acc += wall[:, None] * tex

    # 2. thin near-opaque occluder bars (hard edges over the texture);
    # the middle bar translates with time in the dynamic variant
    bar_x = [-0.45, -0.05 + 0.25 * t_norm, 0.40]
    bar_c = [np.array(c, np.float32) for c in
             ([0.95, 0.45, 0.1], [0.15, 0.85, 0.35], [0.9, 0.15, 0.6])]
    for bx, bc in zip(bar_x, bar_c):
        bar = (200.0 * edge(0.028 - np.abs(x - bx), 400.0)
               * edge(0.7 - np.abs(y)) * edge(z - 0.24) * edge(0.32 - z))
        sigma += bar
        rgb_acc += bar[:, None] * bc

    # 3. specular sphere (view-dependent Blinn lobe, sharp edge)
    c = np.array([0.1, -0.05, -0.2], np.float32)
    rel = points - c
    r = np.sqrt(np.sum(rel ** 2, -1) + 1e-12)
    sph = 50.0 * edge(0.25 - r, 60.0)
    n = rel / r[:, None]
    light = np.array([0.5, 0.8, 0.6], np.float32)
    light /= np.linalg.norm(light)
    h = light[None] - dirs
    h /= np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    spec = np.maximum(np.sum(n * h, -1), 0.0) ** 64
    base = np.array([0.12, 0.18, 0.3], np.float32)
    sph_rgb = base[None] + 0.9 * spec[:, None]
    sigma += sph
    rgb_acc += sph[:, None] * sph_rgb

    rgb = rgb_acc / np.maximum(sigma[:, None], 1e-8)
    return sigma.astype(np.float32), np.clip(rgb, 0.0, 1.0)


def _march_viewdep(rays_o, rays_d, t_norm, near, far, n_steps=512,
                   chunk=262144):
    """Dense-ray-march GT for the view-dependent hostile field (numpy).
    512 steps resolve the 0.056-thick bars at ~10 samples each."""
    out = np.zeros((len(rays_o), 3), np.float32)
    for s in range(0, len(rays_o), chunk):
        o, d = rays_o[s:s + chunk], rays_d[s:s + chunk]
        t = np.linspace(near, far, n_steps, dtype=np.float32)
        delta = (far - near) / (n_steps - 1)
        pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
        dn = d / np.maximum(np.linalg.norm(d, -1, keepdims=True), 1e-8)
        dirs = np.broadcast_to(dn[:, None, :], pts.shape)
        sigma, rgb = _hostile_field(
            pts.reshape(-1, 3), dirs.reshape(-1, 3), t_norm)
        sigma = sigma.reshape(len(o), n_steps)
        rgb = rgb.reshape(len(o), n_steps, 3)
        alpha = 1.0 - np.exp(-sigma * delta)
        T = np.cumprod(1.0 - alpha + 1e-10, -1)
        T = np.concatenate([np.ones_like(T[:, :1]), T[:, :-1]], -1)
        w = alpha * T
        out[s:s + chunk] = np.sum(w[..., None] * rgb, 1).astype(np.float32)
    return out


def hostile_scene(n_views=8, wh=(96, 96), dynamic=False, num_frames=8,
                  num_keyframes=4, cam_distance=2.0, n_steps=512):
    """Hostile procedural scene: same camera rig / ray layout / aabb as
    `gaussian_blob_scene` (drop-in for the Pareto ladder experiments)
    but with thin occluders, high-frequency texture, and specular
    view-dependent content — see `_hostile_field`."""
    W, H = wh
    f = 1.2 * W
    K = [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]
    dirs = get_ray_directions_K(H, W, K, centered_pixels=True)

    coords_list, rgb_list = [], []
    frames = range(num_frames) if dynamic else [0]
    for view in range(n_views):
        ang = (view / max(n_views - 1, 1) - 0.5) * 0.6
        cx, cy = np.sin(ang) * 0.5, np.cos(ang) * 0.1 - 0.05
        c2w = np.array([
            [1.0, 0.0, 0.0, cx],
            [0.0, 1.0, 0.0, cy],
            [0.0, 0.0, 1.0, cam_distance],
        ], np.float32)
        rays_o, rays_d = get_rays(dirs, c2w)
        for fi in frames:
            t_norm = fi / max(num_frames - 1, 1)
            rgb = _march_viewdep(rays_o, rays_d, t_norm,
                                 near=0.5, far=3.5, n_steps=n_steps)
            if dynamic:
                coords = np.concatenate([
                    rays_o, rays_d,
                    np.full((len(rays_o), 1), view, np.float32),
                    np.full((len(rays_o), 1), t_norm, np.float32),
                ], -1)
            else:
                coords = np.concatenate([rays_o, rays_d], -1)
            coords_list.append(coords.astype(np.float32))
            rgb_list.append(rgb)

    return RayDataset(
        all_coords=np.concatenate(coords_list, 0),
        all_rgb=np.concatenate(rgb_list, 0),
        img_wh=wh,
        num_images=n_views * len(list(frames)),
        num_keyframes=num_keyframes if dynamic else 1,
        num_frames=num_frames if dynamic else 1,
        num_views=n_views,
        near=0.5,
        far=3.5,
        depth_range=(0.5, 3.5),
    )


def random_ray_dataset(n_rays=65536, dynamic=False, seed=0):
    """Pure random rays + random colors (for perf benchmarks where content
    doesn't matter; analog of datasets/random.py)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    o[:, 2] += 2.0
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cols = [o, d]
    if dynamic:
        cols.append(rng.integers(0, 8, (n_rays, 1)).astype(np.float32))
        cols.append(rng.uniform(0, 1, (n_rays, 1)).astype(np.float32))
    coords = np.concatenate(cols, -1)
    rgb = rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)
    return RayDataset(
        all_coords=coords, all_rgb=rgb, img_wh=(256, 256),
        num_images=n_rays // 65536 + 1,
        num_keyframes=4 if dynamic else 1,
        num_frames=8 if dynamic else 1,
        num_views=8,
        near=0.5, far=3.5, depth_range=(0.5, 3.5),
    )
