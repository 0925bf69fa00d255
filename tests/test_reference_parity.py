"""Golden-value parity against the actual reference implementation.

The reference's pure-math modules (torch-only) are imported directly from
/root/reference and compared with this repo's jnp reimplementations on
identical random inputs. Modules needing uninstalled deps (kornia,
pytorch_lightning, pytorch3d) get lightweight stand-ins where feasible.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = "/root/reference"


def _load_ref_module(relpath, name, pre_stub=None):
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if pre_stub:
        pre_stub()
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.path[:]
    sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path[:] = old
    return mod


@pytest.fixture(scope="module")
def ref_intersect():
    return _load_ref_module("utils/intersect_utils.py", "ref_intersect")


@pytest.fixture(scope="module")
def ref_sh():
    return _load_ref_module("utils/sh_utils.py", "ref_sh")


@pytest.fixture(scope="module")
def ref_pose():
    return _load_ref_module("utils/pose_utils.py", "ref_pose")


@pytest.fixture(scope="module")
def ref_ray():
    def stub_kornia():
        if "kornia" in sys.modules:
            return

        def create_meshgrid(H, W, normalized_coordinates=False,
                            device="cpu"):
            ys, xs = torch.meshgrid(
                torch.arange(H, dtype=torch.float32),
                torch.arange(W, dtype=torch.float32), indexing="ij")
            return torch.stack([xs, ys], -1)[None]

        fake = types.ModuleType("kornia")
        fake.create_meshgrid = create_meshgrid
        sys.modules["kornia"] = fake

    return _load_ref_module("utils/ray_utils.py", "ref_ray", stub_kornia)


def _rand_rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([o, d], -1)


class TestIntersectParity:
    def test_axis_plane(self, ref_intersect):
        from hyperreel_tpu.ops.intersect_math import intersect_axis_plane
        rays = _rand_rays()
        ref = ref_intersect.intersect_axis_plane(
            torch.from_numpy(rays), 0.5, 2).numpy()
        got = np.asarray(intersect_axis_plane(jnp.asarray(rays), 0.5, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_sphere(self, ref_intersect):
        from hyperreel_tpu.ops.intersect_math import intersect_sphere
        rays = _rand_rays(seed=1)
        ref = ref_intersect.intersect_sphere(
            torch.from_numpy(rays), torch.zeros(3), torch.tensor(1.5)
        ).numpy()
        got = np.asarray(intersect_sphere(
            jnp.asarray(rays), jnp.zeros(3), 1.5))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_cylinder(self, ref_intersect):
        from hyperreel_tpu.ops.intersect_math import intersect_cylinder
        rays = _rand_rays(seed=2)
        ref = ref_intersect.intersect_cylinder(
            torch.from_numpy(rays), torch.zeros(3), torch.tensor(1.2)
        ).numpy()
        got = np.asarray(intersect_cylinder(
            jnp.asarray(rays), jnp.zeros(3), 1.2))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_sort(self, ref_intersect):
        from hyperreel_tpu.ops.intersect_math import sort_z, sort_with
        rng = np.random.default_rng(3)
        z = rng.standard_normal((8, 16)).astype(np.float32)
        vals = rng.standard_normal((8, 16, 3)).astype(np.float32)
        ref_z, ref_idx = ref_intersect.sort_z(torch.from_numpy(z), 1, False)
        ref_v = ref_intersect.sort_with(ref_idx, torch.from_numpy(vals))
        got_z, got_idx = sort_z(jnp.asarray(z))
        got_v = sort_with(got_idx, jnp.asarray(vals))
        np.testing.assert_allclose(np.asarray(got_z), ref_z.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v), ref_v.numpy(),
                                   atol=1e-6)

    def test_min_sphere_radius(self, ref_intersect):
        from hyperreel_tpu.ops.intersect_math import min_sphere_radius
        rays = _rand_rays(seed=4)
        ref = ref_intersect.min_sphere_radius(
            torch.from_numpy(rays), torch.zeros(3)).numpy()
        got = np.asarray(min_sphere_radius(jnp.asarray(rays), jnp.zeros(3)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestSHParity:
    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_bases(self, ref_sh, deg):
        from hyperreel_tpu.ops.sh import eval_sh_bases
        rng = np.random.default_rng(deg)
        dirs = rng.standard_normal((32, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = ref_sh.eval_sh_bases(deg, torch.from_numpy(dirs)).numpy()
        got = np.asarray(eval_sh_bases(deg, jnp.asarray(dirs)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestPoseParity:
    def test_average_and_center(self, ref_pose):
        from hyperreel_tpu.ops.pose_math import average_poses, center_poses
        rng = np.random.default_rng(7)
        # build valid-ish poses: orthonormal rotations + translations
        poses = []
        for i in range(5):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            t = rng.uniform(-1, 1, (3, 1))
            poses.append(np.concatenate([q, t], 1))
        poses = np.stack(poses)
        ref_avg = ref_pose.average_poses(poses)
        got_avg = average_poses(poses)
        np.testing.assert_allclose(got_avg, ref_avg, rtol=1e-5, atol=1e-6)
        ref_centered, ref_inv = ref_pose.center_poses(poses.copy())
        got_centered, got_inv = center_poses(poses.copy())
        np.testing.assert_allclose(got_centered, ref_centered,
                                   rtol=1e-5, atol=1e-6)

    def test_correct_poses_bounds(self, ref_pose):
        from hyperreel_tpu.ops.pose_math import correct_poses_bounds
        rng = np.random.default_rng(8)
        poses = []
        for i in range(4):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            t = rng.uniform(-1, 1, (3, 1))
            poses.append(np.concatenate([q, t], 1))
        poses = np.stack(poses)
        bounds = rng.uniform(1.0, 5.0, (4, 2))
        ref_p, ref_ref, ref_b = ref_pose.correct_poses_bounds(
            poses.copy(), bounds.copy())
        got_p, got_ref, got_b = correct_poses_bounds(
            poses.copy(), bounds.copy())
        np.testing.assert_allclose(got_p, ref_p, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_b, ref_b, rtol=1e-5, atol=1e-6)

    def test_spiral_poses(self, ref_pose):
        from hyperreel_tpu.ops.pose_math import create_spiral_poses
        rng = np.random.default_rng(11)
        poses = []
        for i in range(4):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            t = rng.uniform(-0.5, 0.5, (3, 1))
            poses.append(np.concatenate([q, t], 1))
        poses = np.stack(poses)
        rads = [0.5, 0.4, 0.3]
        ref = np.stack(ref_pose.create_spiral_poses(poses, rads, 1.5, N=12))
        got = create_spiral_poses(poses, rads, 1.5, N=12)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestRayParity:
    def test_directions_and_rays(self, ref_ray):
        from hyperreel_tpu.ops.ray_math import (
            get_ray_directions_K, get_rays)
        K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
        ref_dirs = ref_ray.get_ray_directions_K(
            24, 32, torch.from_numpy(K), centered_pixels=True)
        got_dirs = get_ray_directions_K(24, 32, K, centered_pixels=True)
        np.testing.assert_allclose(got_dirs, ref_dirs.numpy(),
                                   rtol=1e-5, atol=1e-5)

        c2w = np.array([[1.0, 0, 0, 0.2], [0, 1, 0, -0.1],
                        [0, 0, 1, 1.0]], np.float32)
        ref_o, ref_d = ref_ray.get_rays(ref_dirs.float(),
                                        torch.from_numpy(c2w))
        got_o, got_d = get_rays(np.asarray(got_dirs, np.float32), c2w)
        np.testing.assert_allclose(got_o, ref_o.numpy(), atol=1e-5)
        np.testing.assert_allclose(got_d, ref_d.numpy(), atol=1e-5)

    def test_ndc(self, ref_ray):
        from hyperreel_tpu.ops.ray_math import get_ndc_rays_fx_fy
        rays = _rand_rays(64, seed=9)
        rays[:, 5] = -np.abs(rays[:, 5]) - 0.2  # forward-facing (-z)
        ref = ref_ray.get_ndc_rays_fx_fy(
            24, 32, 40.0, 40.0, 1.0, torch.from_numpy(rays)).numpy()
        got = np.asarray(get_ndc_rays_fx_fy(24, 32, 40.0, 40.0, 1.0, rays))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_lightfield_rays(self, ref_ray):
        from hyperreel_tpu.ops.ray_math import get_lightfield_rays
        ref = ref_ray.get_lightfield_rays(8, 6, 0.3, -0.2, 1.5,
                                          st_scale=0.8).numpy()
        got = np.asarray(get_lightfield_rays(8, 6, 0.3, -0.2, 1.5,
                                             st_scale=0.8))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
