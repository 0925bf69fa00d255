"""Video dataset loader tests with synthesized mp4 fixtures (cv2)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hyperreel_tpu.data.neural_3d import load_neural_3d
from hyperreel_tpu.data.immersive import load_immersive


def _write_video(path, n_frames, wh=(64, 48), seed=0):
    rng = np.random.default_rng(seed)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, 30, wh)
    assert vw.isOpened(), "cv2 VideoWriter failed to open"
    base = (rng.uniform(0, 255, (wh[1], wh[0], 3))).astype(np.uint8)
    for f in range(n_frames):
        frame = np.roll(base, f * 2, axis=1)
        vw.write(frame)
    vw.release()


@pytest.fixture
def n3d_tree(tmp_path):
    d = tmp_path / "flame"
    d.mkdir()
    n_cams = 3
    poses_bounds = np.zeros((n_cams, 17))
    for i in range(n_cams):
        pose = np.eye(4)[:3]
        pose[0, 3] = i * 0.2
        hwf = np.array([48.0, 64.0, 50.0])
        poses_bounds[i, :15] = np.concatenate(
            [pose, hwf[:, None]], 1).reshape(-1)
        poses_bounds[i, 15:] = [1.0, 6.0]
        _write_video(str(d / f"cam{i:02d}.mp4"), n_frames=6, seed=i)
    np.save(d / "poses_bounds.npy", poses_bounds)
    return str(d)


class TestNeural3D:
    def test_load_train(self, n3d_tree):
        ds = load_neural_3d(
            n3d_tree, "train", img_wh=(32, 24), num_frames=4,
            keyframe_step=2, load_full_step=2, subsample_keyframe_step=1,
            subsample_keyframe_frac=0.5, subsample_frac=0.25,
            val_set=(0,))
        assert ds.all_coords.shape[-1] == 8
        assert ds.num_keyframes == 2
        t = ds.all_coords[:, -1]
        assert t.min() == 0.0 and t.max() == 1.0
        cams = np.unique(ds.all_coords[:, -2])
        assert 0.0 not in cams  # holdout camera excluded
        assert np.isfinite(ds.all_coords).all()
        assert 0.0 <= ds.all_rgb.min() and ds.all_rgb.max() <= 1.0
        # render-path fields (spiral generation anchors on these)
        assert ds.poses is not None and ds.poses.shape[1:] == (3, 4)
        assert ds.intrinsics is not None and ds.intrinsics.shape == (3, 3)
        assert ds.ndc_params is not None and len(ds.ndc_params) == 3

    def test_val_split_uses_holdout(self, n3d_tree):
        ds = load_neural_3d(
            n3d_tree, "val", img_wh=(32, 24), num_frames=2,
            load_full_step=1, val_set=(0,))
        cams = np.unique(ds.all_coords[:, -2])
        assert list(cams) == [0.0]

    def test_importance_subsampling(self, n3d_tree):
        ds = load_neural_3d(
            n3d_tree, "train", img_wh=(32, 24), num_frames=4,
            load_full_step=4, subsample_keyframe_step=2,
            subsample_keyframe_frac=0.25, subsample_frac=0.125,
            val_set=(0,), subsample_mode="importance")
        full = load_neural_3d(
            n3d_tree, "train", img_wh=(32, 24), num_frames=4,
            load_full_step=1, val_set=(0,))
        assert ds.num_rays < full.num_rays


@pytest.fixture
def immersive_tree(tmp_path):
    import json
    d = tmp_path / "02_Flames"
    d.mkdir()
    cams = []
    for i in range(3):
        name = f"camera_{i:04d}"
        cams.append({
            "name": name,
            "focal_length": 1000.0,
            "principal_point": [1280.0, 960.0],
            "radial_distortion": [0.1, 0.01, 0.0, 0.0],
            "orientation": [0.0, 0.0, 0.0],
            "position": [0.1 * i, 0.0, 0.0],
        })
        _write_video(str(d / f"{name}.mp4"), n_frames=4, seed=i)
    with open(d / "models.json", "w") as f:
        json.dump(cams, f)
    return str(d)


class TestImmersive:
    def test_load_with_fisheye(self, immersive_tree):
        ds = load_immersive(
            immersive_tree, "train", collection="02_Flames",
            img_wh=(64, 48), num_frames=3, keyframe_step=1,
            load_full_step=1)
        assert ds.all_coords.shape[-1] == 8
        # camera_0001 held out
        cams = np.unique(ds.all_coords[:, -2])
        assert 1.0 not in cams
        # undistorted directions are unit-norm
        norms = np.linalg.norm(ds.all_coords[:, 3:6], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert float(ds.near) == 1.0 and float(ds.far) == 10.0

    def test_val_is_center_camera(self, immersive_tree):
        ds = load_immersive(
            immersive_tree, "val", collection="02_Flames",
            img_wh=(64, 48), num_frames=2, load_full_step=1)
        # validation forces camera_id 1 (reference immersive.py:494-507)
        cams = np.unique(ds.all_coords[:, -2])
        assert list(cams) == [1.0]
