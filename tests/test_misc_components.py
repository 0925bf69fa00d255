"""Tests for auxiliary components: subdivision schemes, viewer camera,
visualizers, aux datasets, profiling utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.subdivision import (
    build_subdivision, voxels_from_bb)
from hyperreel_tpu.viewer import OrbitCamera
from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.data.aux_datasets import (
    fourier_dataset, random_ray_view_dataset, random_pixel_dataset)
from hyperreel_tpu.train.visualizers import (
    get_warp_dimensions, visualize_warp, build_visualizers)
from hyperreel_tpu.utils.profiling import Timer


class TestSubdivision:
    def test_voxels_from_bb(self):
        centers = voxels_from_bb([-1, -1, -1], [1, 1, 1], 1.0)
        assert centers.shape == (8, 3)
        np.testing.assert_allclose(np.abs(centers), 0.5)

    def test_depth_subdivision(self):
        sub = build_subdivision({"type": "depth", "near": 0.0, "far": 4.0,
                                 "n_slabs": 4})
        rays = jnp.asarray([[0.0, 0.0, -1.0, 0.0, 0.0, 1.0]])
        t = sub.intersect(rays)
        np.testing.assert_allclose(np.asarray(t)[0], [1, 2, 3, 4, 5],
                                   atol=1e-5)
        segs = sub.reparam(rays)
        assert segs.shape == (1, 4, 6)

    def test_none_when_unset(self):
        assert build_subdivision(None) is None
        assert build_subdivision({}) is None


class TestOrbitCamera:
    def test_pose_orthonormal(self):
        cam = OrbitCamera(64, 64, r=2.0)
        cam.orbit(30, 10)
        cam.pan(5, -3)
        pose = cam.pose
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_scale_changes_radius(self):
        cam = OrbitCamera(64, 64, r=2.0)
        cam.scale(1)
        assert cam.radius < 2.0


class TestInteractiveRenderer:
    def test_render_frame_smoke(self):
        """End-to-end viewer frame on CPU: tiny dynamic model with the
        fused CF path + prepared tables (the serving default)."""
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.viewer import InteractiveRenderer

        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(cfg, dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        r = InteractiveRenderer(m, params, base_wh=(64, 64), ray_width=8)
        if m._cf_eval is not None:
            assert r._prepared is not None
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 2.0
        img, dt = r.render_frame(pose, t=0.3)
        assert img.dtype == np.uint8 and img.shape[-1] == 3
        assert np.isfinite(dt)

    def test_render_frame_coherent_gather(self):
        """Viewer frame with a patch_model (the --coherent-gather CLI
        flag): the patch path is auto-gated per ladder level by the
        analytic coverage bound."""
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters, with_coherent_gather)
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.viewer import InteractiveRenderer

        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        cfg["color"]["net"]["bf16_tables"] = True
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(cfg, dataset_info=ds.info())
        m_p = build_model(with_coherent_gather(cfg),
                          dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        r = InteractiveRenderer(m, params, base_wh=(64, 64), ray_width=8,
                                patch_model=m_p)
        assert r._patch_fwd is not None
        assert len(r._patch_prepared) == 4
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 2.0
        # the bound must reject a 64px-wide frame (tiny focal) and
        # accept a high-density one
        assert not r._patch_ok(64 * 1.2, pose)
        assert r._patch_ok(64000.0, pose)
        img, dt = r.render_frame(pose, t=0.3)
        assert img.dtype == np.uint8 and img.shape[-1] == 3
        assert np.isfinite(dt)
        # the 64px frame fails the analytic bound, so render_frame ran
        # the empirical probe (patch-vs-quad parity on worst-case block
        # rows) and cached a verdict for this (W, H, radius) bucket
        assert len(r._patch_gate_cache) == 1
        assert isinstance(r.last_used_patch, bool)

    def test_in_graph_ray_gen_matches_host_path(self):
        """VERDICT r4 item 5: the viewer's compiled pose->frame path
        generates rays IN-GRAPH from (K, pose) (viewer._frame_fn, ~60 B
        per-frame upload); it must agree ray-for-ray with the host
        ops/ray_math build (get_ray_directions_K centered_pixels +
        get_rays) through the same model. uint8 outputs may differ by
        1 LSB at quantization boundaries (the frame path also rides the
        uniform-time premix, exact-class 5e-5)."""
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.viewer import InteractiveRenderer

        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        cfg["color"]["net"]["fused_render"] = True
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(cfg, dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        r = InteractiveRenderer(m, params, base_wh=(64, 64), ray_width=8)
        r._level = 0
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 2.0
        W, H = r._wh_for(0)
        focal = H / (2.0 * np.tan(np.radians(60.0) / 2.0))
        K = np.asarray([[focal, 0, W / 2], [0, focal, H / 2],
                        [0, 0, 1]], np.float32)
        img, _ = r.render_frame(pose, t=0.3, cam_id=1.0)
        assert img.shape == (H, W, 3)

        rays = r._host_rays(W, H, K, pose, t=0.3, cam_id=1.0)
        _jf, k, cs, pad = r._frame_fns[(W, H, False, 8)]
        if pad:
            rays = np.concatenate(
                [rays, np.repeat(rays[-1:], pad, 0)], 0)
        rgb = np.asarray(r._fwd(
            r.params, r._prepared,
            jnp.asarray(rays.reshape(k, cs, -1))))
        host_u8 = (np.clip(rgb.reshape(-1, 3)[:W * H], 0.0, 1.0)
                   * 255.0).astype(np.uint8).reshape(H, W, 3)
        diff = np.abs(img.astype(int) - host_u8.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff == 0).mean() > 0.99

    def test_fast_mode_probe_gate(self):
        """Scene-dependent quality gate for the viewer auto fast mode
        (round-4 hostile ladder: compact16 collapses 25.0 -> 9.7 dB on
        occluder scenes, so auto must verify on the actual checkpoint)."""
        import jax.tree_util as jtu
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.viewer import fast_mode_probe

        cfg = convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50)
        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                                 num_frames=4, num_keyframes=2)
        m = build_model(cfg, dataset_info=ds.info())
        params = m.init(jax.random.PRNGKey(0))
        ok, d = fast_mode_probe(m, params, m, params,
                                ds.all_coords, it=100, n_rays=256)
        assert ok and d > 35.0  # identical renders pass trivially
        # a fast model whose render diverges must FAIL the gate
        bad = jtu.tree_map(lambda x: x * 0.0, params)
        ok, d = fast_mode_probe(m, params, m, bad,
                                ds.all_coords, it=100, n_rays=256)
        assert not ok and d < 35.0


class TestAuxDatasets:
    def test_fourier(self):
        base = gaussian_blob_scene(n_views=2, wh=(8, 8))
        ds = fourier_dataset(base)
        assert "fft" in ds.extras
        assert ds.extras["fft"].shape == (2 * 64, 3)

    def test_random_ray_view(self):
        base = gaussian_blob_scene(n_views=2, wh=(8, 8))
        ds = random_ray_view_dataset(base, n_rays=256)
        assert ds.all_coords.shape == (256, 6)
        norms = np.linalg.norm(ds.all_coords[:, 3:6], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_random_pixel(self):
        base = gaussian_blob_scene(n_views=2, wh=(8, 8))
        ds = random_pixel_dataset(base, n_rays=128)
        assert ds.all_coords.shape == (128, 6)
        assert ds.all_rgb.shape == (128, 3)


class TestVisualizers:
    def test_warp_dimensions(self):
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((8, 8, 5)).astype(np.float32)
        emb[..., 2] *= 100  # dominant variance channel
        dims = get_warp_dimensions(emb, k=3)
        assert dims[0] == 2
        img = visualize_warp(emb, dims)
        assert img.shape == (8, 8, 3)
        assert img.min() >= 0 and img.max() <= 1

    def test_build_registry(self):
        vis = build_visualizers({"epi": {"type": "epipolar"},
                                 "cv": {"type": "closest_view"}})
        assert len(vis) == 2


class TestProfiling:
    def test_timer(self):
        t = Timer()
        with t.time("op"):
            _ = sum(range(1000))
        s = t.summary()
        assert "op" in s and s["op"]["n"] == 1


class TestMultiChunkRenderer:
    def test_multi_chunk_matches_single(self):
        """lax.map multi-chunk rendering is numerically identical to
        per-chunk dispatch and handles padding / small inputs."""
        import numpy as np
        import jax
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters)
        from hyperreel_tpu.data.synthetic import gaussian_blob_scene
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.train.render import Renderer

        ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True)
        cfg = convert_epochs_to_iters(tiny_dynamic(), 100)
        model = build_model(cfg, dataset_info=ds.info())
        params = model.init(jax.random.PRNGKey(0))
        rays = np.random.default_rng(0).normal(
            size=(1000, 8)).astype(np.float32)
        multi = Renderer(model, ray_chunk=128, chunks_per_call=4)
        single = Renderer(model, ray_chunk=128, chunks_per_call=1)
        a = multi.render_rays(params, rays)
        b = single.render_rays(params, rays)
        for k in a:
            assert np.allclose(a[k], b[k], atol=1e-6)
        assert multi.render_rays(params, rays[:50])["rgb"].shape[0] == 50
        assert multi.render_rays(params, rays[:512])["rgb"].shape[0] == 512


class TestEPIFocusVisualizers:
    """End-to-end EPI/focus visualizer runs against a tiny system
    (reference nlf/visualizers/epipolar.py:20-141, focus.py:13-160)."""

    @staticmethod
    def _system():
        from hyperreel_tpu.config import load_config
        from hyperreel_tpu.system import System
        import jax
        cfg = load_config(overrides=[
            "dataset.name=synthetic_blobs", "dataset.n_views=2",
            "dataset.wh=[8,8]", "model=tiny_static",
            "training.num_iters=2", "training.ray_chunk=64",
        ])
        system = System(cfg)
        state = system.trainer.init_state(jax.random.PRNGKey(0))
        batch = system.train_dataset.image(0)
        return system, state, batch

    def test_epi_pred_and_gt(self):
        from hyperreel_tpu.train.visualizers import EPIVisualizer
        system, state, batch = self._system()
        # fake a 2x1 lightfield grid so the GT-EPI path runs
        ds = system.train_dataset
        ds.num_rows, ds.num_cols = 1, 2
        vis = EPIVisualizer(cfg={"v": 0.0, "t": 0.0, "H": 6})
        images = vis.render(system, state, batch["rays"], ds.img_wh)
        W, H = ds.img_wh
        assert images["epi_pred"].shape == (6, W, 3)
        assert np.all(np.isfinite(images["epi_pred"]))
        assert "epi_gt" in images
        assert images["epi_gt"].shape == (2, W, 3)
        # GT row is the center scanline of each grid image
        want = ds.all_rgb.reshape(1, 2, H, W, 3)[0, :, H // 2, :, :]
        np.testing.assert_allclose(images["epi_gt"], want, atol=1e-6)

    def test_focus_cone_and_ray(self):
        from hyperreel_tpu.train.visualizers import FocusVisualizer
        system, state, batch = self._system()
        ds = system.train_dataset
        vis = FocusVisualizer(cfg={"focal": -0.5, "ds": 0.5, "dt": 0.5,
                                   "aperture_samples": 2})
        images = vis.render(system, state, batch["rays"], ds.img_wh)
        W, H = ds.img_wh
        for key in ("focus_rgb_ray", "focus_rgb_cone"):
            assert images[key].shape == (H, W, 3)
            assert np.all(np.isfinite(images[key]))
            assert images[key].min() >= 0 and images[key].max() <= 1
        # the aperture average must differ from the pinhole render
        assert not np.allclose(images["focus_rgb_ray"],
                               images["focus_rgb_cone"], atol=1e-5)
