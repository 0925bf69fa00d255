"""Dataset loader tests against generated fixture trees (no downloads):
synthetic LLFF / Blender / DoNeRF / Technicolor directory structures are
written to tmp dirs and loaded back (SURVEY.md §2.6 contracts)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from hyperreel_tpu.data.llff import load_llff
from hyperreel_tpu.data.blender import load_blender
from hyperreel_tpu.data.donerf import load_donerf
from hyperreel_tpu.data.technicolor import load_technicolor
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.ops.ray_math import (
    get_ray_directions_K, get_ndc_rays_fx_fy)


def _write_img(path, wh=(32, 24), seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 255, (wh[1], wh[0], 3))).astype(np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def llff_tree(tmp_path):
    d = tmp_path / "fern"
    (d / "images").mkdir(parents=True)
    n = 6
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        pose = np.eye(4)[:3]
        pose[0, 3] = i * 0.1
        hwf = np.array([24.0, 32.0, 30.0])
        # LLFF layout: [3x4 pose | hwf] flattened, then near/far
        poses_bounds[i, :15] = np.concatenate(
            [pose, hwf[:, None]], 1).reshape(-1)
        poses_bounds[i, 15:] = [1.0, 5.0]
        _write_img(d / "images" / f"img_{i:03d}.png", seed=i)
    np.save(d / "poses_bounds.npy", poses_bounds)
    return str(d)


class TestLLFF:
    def test_load_train(self, llff_tree):
        ds = load_llff(llff_tree, "train", downsample=1, val_skip=3)
        # 6 images, val every 3rd -> 2 val, 4 train
        assert ds.num_images == 4
        W, H = ds.img_wh
        assert ds.all_coords.shape == (4 * W * H, 7)
        assert ds.all_rgb.shape == (4 * W * H, 3)
        assert np.all(np.isfinite(ds.all_coords))
        assert ds.all_rgb.min() >= 0 and ds.all_rgb.max() <= 1

    def test_val_split_disjoint(self, llff_tree):
        tr = load_llff(llff_tree, "train", downsample=1, val_skip=3)
        va = load_llff(llff_tree, "val", downsample=1, val_skip=3)
        assert va.num_images == 2
        assert tr.num_rays + va.num_rays == 6 * tr.img_wh[0] * tr.img_wh[1]

    def test_ndc_rays_bounded(self, llff_tree):
        ds = load_llff(llff_tree, "train", downsample=1, use_ndc=True)
        # NDC origins should be in a bounded range
        assert np.abs(ds.all_coords[:, :3]).max() < 10.0


@pytest.fixture
def blender_tree(tmp_path):
    d = tmp_path / "lego"
    (d / "train").mkdir(parents=True)
    frames = []
    for i in range(3):
        pose = np.eye(4)
        pose[2, 3] = 4.0
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": pose.tolist()})
        rng = np.random.default_rng(i)
        arr = (rng.uniform(0, 255, (20, 20, 4))).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(d / "train" / f"r_{i}.png")
    with open(d / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return str(d)


class TestBlender:
    def test_load(self, blender_tree):
        ds = load_blender(blender_tree, "train", img_wh=(20, 20))
        assert ds.all_coords.shape == (3 * 400, 7)
        assert ds.all_rgb.shape == (3 * 400, 3)
        # white composite: alpha-blended values stay in [0, 1]
        assert ds.all_rgb.min() >= 0 and ds.all_rgb.max() <= 1
        # directions normalized
        norms = np.linalg.norm(ds.all_coords[:, 3:6], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.fixture
def technicolor_tree(tmp_path):
    d = tmp_path / "painter"
    (d / "images").mkdir(parents=True)
    rows = cols = 2
    n_cams = rows * cols
    n_frames = 3
    header = "focal cx cy aspect skew qw qx qy qz d1 d2 tx ty tz\n"
    lines = [header]
    for c in range(n_cams):
        lines.append(
            f"1000.0 1024.0 544.0 1.0 0.0 1.0 0.0 0.0 0.0 0.0 0.0 "
            f"{0.1 * c} 0.0 0.0\n")
    with open(d / "cameras_parameters.txt", "w") as f:
        f.writelines(lines)
    for fidx in range(n_frames):
        for c in range(n_cams):
            _write_img(d / "images" / f"frame_{fidx:04d}_cam_{c:02d}.png",
                       wh=(32, 16), seed=fidx * 10 + c)
    return str(d)


class TestTechnicolor:
    def test_load_train(self, technicolor_tree):
        ds = load_technicolor(
            technicolor_tree, "train", collection="painter",
            img_wh=(32, 16), num_frames=3, rows=2, cols=2,
            load_full_step=2, subsample_keyframe_step=1,
            subsample_keyframe_frac=0.5, subsample_frac=0.25,
            val_pairs=((1, 1),), keyframe_step=1)
        assert ds.all_coords.shape[-1] == 8
        # times in [0, 1]
        t = ds.all_coords[:, -1]
        assert t.min() >= 0 and t.max() <= 1
        # camera ids within rig
        cams = ds.all_coords[:, -2]
        assert set(np.unique(cams)).issubset({0.0, 1.0, 2.0, 3.0})
        # the held-out camera (row 1, col 1 -> idx 3) never in train
        assert 3.0 not in np.unique(cams)
        assert ds.num_keyframes == 3

    def test_subsampling_reduces_rays(self, technicolor_tree):
        full = load_technicolor(
            technicolor_tree, "train", collection="painter",
            img_wh=(32, 16), num_frames=3, rows=2, cols=2,
            load_full_step=1, val_pairs=(), keyframe_step=1)
        sub = load_technicolor(
            technicolor_tree, "train", collection="painter",
            img_wh=(32, 16), num_frames=3, rows=2, cols=2,
            load_full_step=2, subsample_keyframe_step=1,
            subsample_keyframe_frac=0.25, subsample_frac=0.25,
            val_pairs=(), keyframe_step=1)
        assert sub.num_rays < full.num_rays


@pytest.fixture
def donerf_tree(tmp_path):
    d = tmp_path / "classroom"
    d.mkdir()
    frames = []
    for i in range(2):
        pose = np.eye(4)
        pose[2, 3] = 2.0
        frames.append({"file_path": f"img_{i}",
                       "transform_matrix": pose.tolist()})
        rng = np.random.default_rng(i)
        arr = (rng.uniform(0, 255, (800, 800, 3))).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
        depth = rng.uniform(0.5, 5.0, (800, 800)).astype(np.float32)
        np.savez(d / f"img_{i}_depth.npz", depth=depth)
    meta = {"frames": frames}
    for split in ("train", "val", "test"):
        with open(d / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    with open(d / "dataset_info.json", "w") as f:
        json.dump({"camera_angle_x": 0.6911, "depth_range": [0.5, 6.0],
                   "view_cell_center": [0, 0, 0],
                   "view_cell_size": [1, 1, 1]}, f)
    return str(d)


class TestDoNeRF:
    def test_load_with_depth(self, donerf_tree):
        ds = load_donerf(donerf_tree, "train", img_wh=(100, 100))
        assert ds.all_coords.shape == (2 * 100 * 100, 7)
        assert "depth" in ds.extras and "points" in ds.extras
        d = ds.extras["depth"]
        # depths clamped to 0 outside [near, far], rest positive
        assert d.min() >= 0
        valid = d[:, 0] > 0
        assert valid.any()
        # points = o + d*dist for valid entries
        pts = ds.extras["points"][valid]
        o = ds.all_coords[valid, :3]
        dd = ds.all_coords[valid, 3:6]
        np.testing.assert_allclose(
            pts, o + dd * d[valid], rtol=1e-4, atol=1e-4)


class TestSynthetic:
    def test_blob_scene_shapes(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        assert ds.all_coords.shape == (2 * 64, 6)
        assert ds.all_rgb.shape == (2 * 64, 3)
        assert ds.all_rgb.max() <= 1.0 + 1e-5

    def test_dynamic_blob_scene(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8), dynamic=True,
                                 num_frames=3, num_keyframes=3)
        assert ds.all_coords.shape == (2 * 3 * 64, 8)
        # content actually changes over time
        f0 = ds.all_rgb[:64]
        f2 = ds.all_rgb[2 * 64:3 * 64]
        assert not np.allclose(f0, f2)

    def test_batch_iterator(self):
        ds = gaussian_blob_scene(n_views=2, wh=(8, 8))
        it = ds.batch_iterator(32, seed=0)
        b = next(it)
        assert b["rays"].shape == (32, 6)
        assert b["rgb"].shape == (32, 3)
        assert b["weights"].shape == (32, 1)


def test_llff_exposes_render_path_fields(llff_tree):
    from hyperreel_tpu.data.llff import load_llff
    ds = load_llff(llff_tree, "train", downsample=1, img_wh=(16, 12))
    assert ds.poses is not None and ds.poses.shape[1:] == (3, 4)
    assert ds.intrinsics is not None and ds.intrinsics.shape == (3, 3)
    # world near used by the NDC projection = bounds.min()*0.95
    # (reference llff.py:83; pinned by test_reference_loader_parity)
    assert ds.ndc_params is not None and ds.ndc_params[2] > 0.0
