"""Subdivision schemes (reference: nlf/subdivision.py — VESTIGIAL).

The reference registers five schemes (depth, depth_embed, voxel_embed,
nerf, radial; subdivision.py:581-587) but **no shipped config sets
`cfg.model.subdivision.type`** (verified by the config census, SURVEY.md
§2.10/A.9), so these never run. They are provided here in minimal
functional form for API parity with custom configs; the piecewise
`LightfieldModel` wiring treats each cell as an independent ray range.
"""

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.intersect_math import intersect_axis_plane


def voxels_from_bb(min_point, max_point, voxel_size):
    """Regular voxel centers covering a bounding box
    (reference subdivision.py:564-578)."""
    min_point = np.asarray(min_point, np.float32)
    max_point = np.asarray(max_point, np.float32)
    counts = np.maximum(
        np.ceil((max_point - min_point) / voxel_size).astype(int), 1)
    axes = [min_point[i] + (np.arange(counts[i]) + 0.5) * voxel_size
            for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    return grid


@dataclass
class DepthSubdivision:
    """Reparameterize rays per depth slab
    (reference subdivision.py:111-167)."""

    cfg: dict

    def __post_init__(self):
        self.near = float(self.cfg.get("near", 0.0))
        self.far = float(self.cfg.get("far", 1.0))
        self.n_slabs = int(self.cfg.get("n_slabs",
                                        self.cfg.get("max_hits", 4)))
        self.depths = np.linspace(self.near, self.far, self.n_slabs + 1)

    def intersect(self, rays):
        """Distances to each slab boundary: [B, n_slabs+1]."""
        return intersect_axis_plane(
            rays[:, None, :], jnp.asarray(self.depths)[None, :], 2)

    def reparam(self, rays):
        """Per-slab ray segments [B, n_slabs, 6]: origin advanced to the
        slab entry plane."""
        t = self.intersect(rays)[..., :-1]
        o = rays[:, None, :3] + rays[:, None, 3:6] * t[..., None]
        d = jnp.broadcast_to(rays[:, None, 3:6], o.shape)
        return jnp.concatenate([o, d], -1)


@dataclass
class RadialSubdivision:
    """Concentric radial shells (reference subdivision.py:493-560)."""

    cfg: dict

    def __post_init__(self):
        self.radii = np.asarray(
            self.cfg.get("radii",
                         np.linspace(1.0, 8.0,
                                     int(self.cfg.get("n_shells", 4)))),
            np.float32)

    def intersect(self, rays):
        from hyperreel_tpu.ops.intersect_math import intersect_sphere
        return intersect_sphere(
            rays[:, None, :], jnp.zeros(3), jnp.asarray(self.radii)[None, :])


@dataclass
class VoxelSubdivision:
    """Voxel-cell subdivision (reference subdivision.py:245-399): rays are
    assigned to the voxels they traverse; here the voxel grid only provides
    cell centers + membership for per-cell embeddings."""

    cfg: dict

    def __post_init__(self):
        self.voxel_size = float(self.cfg.get("voxel_size", 1.0))
        self.centers = voxels_from_bb(
            self.cfg.get("min_point", [-1, -1, -1]),
            self.cfg.get("max_point", [1, 1, 1]),
            self.voxel_size)

    def cell_of(self, points):
        rel = (points - jnp.asarray(self.centers[0])) / self.voxel_size
        return jnp.round(rel).astype(jnp.int32)


subdivision_dict = {
    "depth": DepthSubdivision,
    "depth_embed": DepthSubdivision,
    "voxel_embed": VoxelSubdivision,
    "nerf": DepthSubdivision,
    "radial": RadialSubdivision,
}


def build_subdivision(cfg):
    if cfg is None or "type" not in cfg:
        return None
    return subdivision_dict[cfg["type"]](cfg=dict(cfg))
