"""Geometry export + occupancy mask (reference: utils/tensorf_utils.py
AlphaGridMask :459-484 and marching-cubes PLY export :170-229).

`export_mesh_ply` is the reference-parity path: dense density-field
evaluation -> isosurface triangle mesh (pure-numpy marching tetrahedra,
since skimage/plyfile aren't in this image) -> PLY with faces.
`export_density_ply` additionally writes the thresholded occupied-voxel
point cloud (quick inspection without a mesh viewer). `AlphaGridMask` is
the functional occupancy-mask module (trilinear alpha lookup)."""

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.grid_sample import grid_sample_3d
from hyperreel_tpu.ops.marching_cubes import (
    marching_tetrahedra, write_ply_mesh)


class AlphaGridMask:
    """Trilinear occupancy lookup over a binary alpha volume
    (reference utils/tensorf_utils.py:459-484)."""

    def __init__(self, aabb, alpha_volume):
        """aabb [2, 3]; alpha_volume [D, H, W] with D=z, H=y, W=x."""
        self.aabb = jnp.asarray(aabb, jnp.float32)
        self.alpha_volume = jnp.asarray(alpha_volume)[..., None]

    def sample_alpha(self, xyz):
        inv = 2.0 / (self.aabb[1] - self.aabb[0])
        norm = (xyz - self.aabb[0]) * inv - 1.0
        return grid_sample_3d(self.alpha_volume, norm)[..., 0]


def eval_density_grid(net, params_color, grid_size=(128, 128, 128)):
    """Dense density-field evaluation on the net's aabb: returns
    (sigma [gx, gy, gz] float32, pts [gx, gy, gz, 3] world coords)."""
    gx, gy, gz = grid_size
    aabb = np.asarray(net.aabb)
    xs = np.linspace(0, 1, gx)
    ys = np.linspace(0, 1, gy)
    zs = np.linspace(0, 1, gz)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
    pts = aabb[0] * (1 - grid) + aabb[1] * grid

    sig = np.zeros((gx, gy * gz), np.float32)
    for i in range(gx):
        row = jnp.asarray(pts[i].reshape(-1, 3), jnp.float32)
        xyz = net.normalize_coord(row)
        if hasattr(net, "_sample_density_t"):
            xyzt = jnp.concatenate(
                [xyz, jnp.zeros_like(xyz[..., :1])], -1)
            feat = np.asarray(
                net._sample_density_t(params_color, xyzt))[..., 0]
        else:
            feat = np.asarray(net._sample_density(params_color, xyz))
        sig[i] = np.asarray(net.feature2density(jnp.asarray(feat)))
    return sig.reshape(gx, gy, gz), pts.astype(np.float32)


def export_mesh_ply(path, net, params_color, grid_size=(128, 128, 128),
                    alpha_thresh=0.005, step_size=0.01):
    """Reference-parity mesh export (utils/tensorf_utils.py:170-229 +
    export path in nlf/nets/tensorf_base.py): dense sigma -> per-voxel
    alpha = 1 - exp(-sigma * distance_scale * step) -> isosurface at
    `alpha_thresh` -> triangle PLY. Returns (num_verts, num_faces)."""
    sigma, _ = eval_density_grid(net, params_color, grid_size)
    scale = float(getattr(net, "distance_scale", 1.0)) * step_size
    alpha = 1.0 - np.exp(-sigma * scale)
    verts, faces = marching_tetrahedra(
        alpha, level=alpha_thresh, bbox=np.asarray(net.aabb))
    write_ply_mesh(path, verts, faces)
    return len(verts), len(faces)


def export_density_ply(path, net, params_color, grid_size=(128, 128, 128),
                       sigma_thresh=0.005):
    """Evaluate the density field on a dense grid and write occupied voxel
    centers (with density as gray value) to ASCII PLY."""
    gx, gy, gz = grid_size
    sigma, pts = eval_density_grid(net, params_color, grid_size)
    out_pts = []
    out_sigma = []
    for i in range(gx):
        s = sigma[i].reshape(-1)
        mask = s > sigma_thresh
        out_pts.append(pts[i].reshape(-1, 3)[mask])
        out_sigma.append(s[mask])

    points = np.concatenate(out_pts, 0)
    sigmas = np.concatenate(out_sigma, 0)
    gray = np.clip(sigmas / max(sigmas.max(), 1e-8) * 255, 0,
                   255).astype(np.uint8)

    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, g in zip(points, gray):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {g} {g} {g}\n")
    return len(points)
