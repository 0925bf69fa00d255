"""Tests for geometry export, AlphaGridMask, and the System multiscale
schedule."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_static, convert_epochs_to_iters
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.train.export import AlphaGridMask, export_density_ply


class TestAlphaGridMask:
    def test_sample_alpha(self):
        vol = np.zeros((4, 4, 4), np.float32)
        vol[2, 2, 2] = 1.0
        mask = AlphaGridMask([[-1, -1, -1], [1, 1, 1]], vol)
        # center of the occupied cell in world coords
        # volume is [D(z), H(y), W(x)]; cell (2,2,2) -> norm coord 1/3
        pt = jnp.asarray([[1 / 3, 1 / 3, 1 / 3]])
        assert float(mask.sample_alpha(pt)[0]) > 0.9
        far = jnp.asarray([[-0.9, -0.9, -0.9]])
        assert float(mask.sample_alpha(far)[0]) < 0.1


class TestExport:
    def test_density_ply(self, tmp_path):
        cfg = convert_epochs_to_iters(tiny_static(), 100)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "density.ply")
        n = export_density_ply(path, model.color_net, params["color"],
                               grid_size=(8, 8, 8), sigma_thresh=0.0)
        assert os.path.exists(path)
        with open(path) as f:
            header = f.readline().strip()
        assert header == "ply"
        assert n > 0


class TestMarchingTetrahedra:
    """Isosurface extraction replacing the reference's skimage marching
    cubes (utils/tensorf_utils.py:170-229)."""

    @staticmethod
    def _sphere(n=33, r=0.6):
        ax = np.linspace(-1, 1, n)
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        return r - np.sqrt(x * x + y * y + z * z)  # >0 inside

    def test_sphere_watertight_and_oriented(self):
        from hyperreel_tpu.ops.marching_cubes import marching_tetrahedra
        vol = self._sphere()
        bbox = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
        verts, faces = marching_tetrahedra(vol, 0.0, bbox=bbox)
        assert len(verts) > 100 and len(faces) > 100

        # every vertex lies on the r=0.6 sphere (linear interp error only)
        rad = np.linalg.norm(verts, axis=1)
        assert np.abs(rad - 0.6).max() < 0.02

        # watertight: every undirected edge is shared by exactly 2 faces
        e = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
        e = np.sort(e, 1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()

        # outward orientation + divergence-theorem volume ~ sphere volume
        v = verts[faces].astype(np.float64)
        signed = np.einsum(
            "ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2])) / 6.0
        vol_mesh = signed.sum()
        want = 4 / 3 * np.pi * 0.6 ** 3
        assert abs(vol_mesh - want) / want < 0.05
        # outward-wound triangles: centroid dotted with normal positive
        # for a star-shaped body for nearly all faces
        n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        c = v.mean(1)
        assert (np.einsum("ij,ij->i", n, c) > 0).mean() > 0.99

    def test_empty_and_full(self):
        from hyperreel_tpu.ops.marching_cubes import marching_tetrahedra
        verts, faces = marching_tetrahedra(np.zeros((4, 4, 4)), 0.5)
        assert len(verts) == 0 and len(faces) == 0
        verts, faces = marching_tetrahedra(np.ones((4, 4, 4)), 0.5)
        assert len(verts) == 0 and len(faces) == 0

    def test_export_mesh_ply(self, tmp_path):
        from hyperreel_tpu.train.export import export_mesh_ply
        cfg = convert_epochs_to_iters(tiny_static(), 100)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "mesh.ply")
        nv, nf = export_mesh_ply(path, model.color_net, params["color"],
                                 grid_size=(12, 12, 12), alpha_thresh=1e-4)
        text = open(path).read()
        assert text.startswith("ply")
        assert f"element vertex {nv}" in text
        assert f"element face {nf}" in text


class TestMultiscale:
    def test_update_data_switches_scale(self):
        from hyperreel_tpu.config import load_config
        from hyperreel_tpu.system import System
        cfg = load_config(overrides=[
            "dataset.name=synthetic_blobs", "dataset.n_views=2",
            "dataset.wh=[16,16]", "model=tiny_static",
            "training.multiscale=true", "training.scales=[2,1]",
            "training.scale_epochs=[0,5]", "training.num_iters=10",
        ])
        system = System(cfg)
        changed = system.update_data(0)
        assert changed
        assert tuple(system.train_dataset.img_wh) == (8, 8)
        changed = system.update_data(5)
        assert changed
        assert tuple(system.train_dataset.img_wh) == (16, 16)
        # no further change
        assert not system.update_data(6)


class TestSpiralRender:
    def test_render_path_poses_from_real_poses(self):
        """Spiral anchors on dataset poses with percentile radii
        (reference datasets/base.py:447-459)."""
        from hyperreel_tpu.config import load_config
        from hyperreel_tpu.system import System
        cfg = load_config(overrides=[
            "dataset.name=synthetic_blobs", "dataset.n_views=2",
            "dataset.wh=[8,8]", "model=tiny_static",
            "training.num_iters=2",
        ])
        system = System(cfg)
        ds = system.train_dataset
        # attach real-ish poses the way llff/neural_3d/technicolor do
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
        poses[:, :, 3] = rng.normal(0, 0.3, (4, 3)).astype(np.float32)
        ds.poses = poses
        ds.intrinsics = np.array(
            [[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
        out, K = system.render_path_poses(n_poses=6)
        assert len(out) == 6
        assert np.allclose(K, ds.intrinsics)
        # radii follow the train-pose translation percentiles, so the spiral
        # stays near the rig rather than the synthetic unit ring
        radii = np.percentile(np.abs(poses[..., 3]), 90, axis=0)
        center = np.mean(poses[..., 3], 0)
        dists = np.linalg.norm(
            np.asarray([p[:3, 3] for p in out]) - center, -1)
        assert dists.max() <= np.linalg.norm(radii) * 2.0 + 1e-3

        interp, _ = system.render_path_poses(n_poses=5, interpolate=True)
        assert len(interp) >= 5

    def test_render_spiral_writes_video(self, tmp_path):
        from hyperreel_tpu.config import load_config
        from hyperreel_tpu.system import System
        cfg = load_config(overrides=[
            "dataset.name=synthetic_blobs", "dataset.n_views=2",
            "dataset.wh=[8,8]", "model=tiny_static",
            "training.num_iters=2", "training.ray_chunk=64",
            f"params.save_dir={tmp_path}",
        ])
        system = System(cfg)
        state = system.trainer.init_state(jax.random.PRNGKey(0))
        frames = system.render_spiral(state, n_poses=2)
        assert len(frames) == 2
        assert frames[0].shape == (8, 8, 3)
        vid = os.path.join(system.save_dir, "spiral", "spiral.mp4")
        assert os.path.exists(vid) and os.path.getsize(vid) > 0

    def test_ndc_params_roundtrip(self):
        """NDC loaders record (fx, fy, near) so spiral rays are generated in
        the training ray space."""
        from hyperreel_tpu.data.base import RayDataset
        ds = RayDataset(
            all_coords=np.zeros((4, 7), np.float32),
            all_rgb=np.zeros((4, 3), np.float32),
            ndc_params=(10.0, 10.0, 1.0))
        assert ds.ndc_params == (10.0, 10.0, 1.0)

    def test_spiral_rays_use_ndc_transform(self):
        """When the dataset records ndc_params, spiral path rays are pushed
        through the same NDC transform as training rays (reference
        get_coords_from_camera applies to_ndc, datasets/base.py:496-516)."""
        from hyperreel_tpu.config import load_config
        from hyperreel_tpu.system import System
        from hyperreel_tpu.ops.ray_math import (
            get_ray_directions_K, get_rays, get_ndc_rays_fx_fy)
        cfg = load_config(overrides=[
            "dataset.name=synthetic_blobs", "dataset.n_views=2",
            "dataset.wh=[8,8]", "model=tiny_static",
            "training.num_iters=2", "training.ray_chunk=64",
        ])
        system = System(cfg)
        ds = system.train_dataset
        ds.ndc_params = (10.0, 10.0, 1.0)
        captured = {}
        orig = system.renderer.render_image

        def spy(params, rays, wh, it=0, fields=()):
            captured["rays"] = np.array(rays)
            return orig(params, rays, wh, it=it, fields=fields)

        system.renderer.render_image = spy
        state = system.trainer.init_state(jax.random.PRNGKey(0))
        system.render_spiral(state, n_poses=1, save_frames=False,
                             save_video=False)
        rays = captured["rays"]
        # recompute what the un-transformed rays would be; they must differ
        # and the captured origins must satisfy the NDC o_z convention
        poses, K = system.render_path_poses(n_poses=1)
        W, H = ds.img_wh
        dirs = get_ray_directions_K(H, W, K, centered_pixels=True)
        ro, rd = get_rays(dirs, poses[0][:3, :4])
        raw = np.concatenate([ro, rd], -1).astype(np.float32)
        ndc = get_ndc_rays_fx_fy(H, W, 10.0, 10.0, 1.0, raw)
        assert np.allclose(rays[:, :6], np.asarray(ndc), atol=1e-5)
        assert not np.allclose(rays[:, :6], raw, atol=1e-3)
