"""Reference-checkpoint import: orientation and end-to-end mapping tests.

The orientation test reproduces the reference's exact sampling call
(F.grid_sample(plane [1, C, H, W], coords [1, N, 1, 2] with x = matMode0,
y = matMode1, align_corners=True) — nlf/nets/tensorf_base.py:664-702) on a
random torch plane, imports that plane with the converter, samples with our
grid_sample_2d, and demands equality.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hyperreel_tpu.tools.import_reference_ckpt import (
    import_reference_state_dict, _plane, _line, _linear_w)


class TestOrientation:
    def test_plane_matches_torch_grid_sample(self):
        rng = np.random.default_rng(0)
        C, H, W = 5, 7, 9
        ref_plane = torch.tensor(
            rng.normal(size=(1, C, H, W)).astype(np.float32))
        pts = rng.uniform(-0.95, 0.95, size=(64, 2)).astype(np.float32)

        # reference sampling (tensorf_base.py:684-688)
        coords = torch.tensor(pts).view(1, -1, 1, 2)
        want = F.grid_sample(ref_plane, coords, align_corners=True)
        want = want.view(C, -1).numpy()

        from hyperreel_tpu.ops.grid_sample import grid_sample_2d_cf
        ours = _plane(ref_plane)  # [H, W, C]
        got = np.asarray(grid_sample_2d_cf(jnp.asarray(ours),
                                           jnp.asarray(pts)))
        assert np.allclose(got, want, atol=1e-5)

    def test_line_matches_torch_grid_sample(self):
        rng = np.random.default_rng(1)
        C, L = 4, 11
        ref_line = torch.tensor(
            rng.normal(size=(1, C, L, 1)).astype(np.float32))
        z = rng.uniform(-0.95, 0.95, size=(32,)).astype(np.float32)

        # reference line sampling: coords (0, z) (tensorf_base.py:680-693)
        coords = torch.stack(
            [torch.zeros(len(z)), torch.tensor(z)], -1).view(1, -1, 1, 2)
        want = F.grid_sample(ref_line, coords,
                             align_corners=True).view(C, -1).numpy()

        from hyperreel_tpu.ops.grid_sample import grid_sample_1d_cf
        ours = _line(ref_line)  # [L, C]
        got = np.asarray(grid_sample_1d_cf(jnp.asarray(ours),
                                           jnp.asarray(z)))
        assert np.allclose(got, want, atol=1e-5)


class TestImportMapping:
    def test_dynamic_model_import(self):
        """A synthetic reference state_dict (lightning-style prefixes,
        reference shapes) lands in the right slots and the model still
        runs forward."""
        from hyperreel_tpu.configs.presets import (
            tiny_dynamic, convert_epochs_to_iters)
        from hyperreel_tpu.data.synthetic import gaussian_blob_scene
        from hyperreel_tpu.models.model import build_model
        from hyperreel_tpu.models.ctx import make_ctx

        ds = gaussian_blob_scene(n_views=2, wh=(8, 8), dynamic=True)
        model = build_model(
            convert_epochs_to_iters(tiny_dynamic(), 100),
            dataset_info=ds.info())
        params = model.init(jax.random.PRNGKey(0))

        rng = np.random.default_rng(2)
        c = params["color"]
        H, W, C = c["density"]["space_0"].shape
        F_, Wt, _ = c["density"]["time_0"].shape
        Ca = c["app"]["space_0"].shape[-1]
        Cin, Cout = np.shape(c["basis_mat"]["w"])
        pre = "render_fn.model.color_model.net."
        sd = {
            pre + "density_plane_space.0": torch.tensor(
                rng.normal(size=(1, C, H, W)).astype(np.float32)),
            pre + "density_plane_time.0": torch.tensor(
                rng.normal(size=(1, C, F_, Wt)).astype(np.float32)),
            pre + "app_plane_space.0": torch.tensor(
                rng.normal(size=(1, Ca, H, W)).astype(np.float32)),
            pre + "app_plane_time.0": torch.tensor(
                rng.normal(size=(1, Ca, F_, Wt)).astype(np.float32)),
            pre + "basis_mat.weight": torch.tensor(
                rng.normal(size=(Cout, Cin)).astype(np.float32)),
        }
        # ray-prediction MLP with our exact layer signature
        emb = params["embedding"]["ray_prediction_0"]["net"]
        mpre = "render_fn.model.embedding_model.net."
        for i in range(len(emb)):
            w = emb[f"layer_{i}"]["w"]
            sd[mpre + f"layers.{i}.weight"] = torch.tensor(
                rng.normal(size=(w.shape[1], w.shape[0])).astype(np.float32))
            sd[mpre + f"layers.{i}.bias"] = torch.tensor(
                rng.normal(size=(w.shape[1],)).astype(np.float32))

        new_params, report = import_reference_state_dict(sd, params)
        mapped_targets = {t for _, t in report["mapped"]}
        assert "density/space_0" in mapped_targets
        assert "app/time_0" in mapped_targets
        assert "basis_mat/w" in mapped_targets
        assert any("layer_0/w" in t for t in mapped_targets)
        assert not report["skipped"], report["skipped"]

        # values actually landed (transposed)
        want = np.asarray(sd[pre + "density_plane_space.0"][0]
                          ).transpose(1, 2, 0)
        assert np.allclose(new_params["color"]["density"]["space_0"], want)
        assert np.allclose(
            new_params["color"]["basis_mat"]["w"],
            np.asarray(sd[pre + "basis_mat.weight"]).T)

        # model still runs with imported params
        rays = jnp.asarray(
            rng.normal(size=(32, 8)).astype(np.float32))
        out = model.apply(new_params, rays,
                          make_ctx(it=jnp.asarray(0), training=False))
        assert np.all(np.isfinite(np.asarray(out["rgb"])))

    def test_static_vm_split_keys(self):
        """TensorVMSplit-style keys (plane/line per axis) map to the static
        model's slots."""
        from hyperreel_tpu.configs.presets import (
            tiny_static, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model

        model = build_model(convert_epochs_to_iters(tiny_static(), 100))
        params = model.init(jax.random.PRNGKey(0))
        c = params["color"]
        rng = np.random.default_rng(3)
        sd = {}
        for i in range(3):
            H, W, C = c["density"][f"plane_{i}"].shape
            L, _ = c["density"][f"line_{i}"].shape
            sd[f"net.density_plane.{i}"] = torch.tensor(
                rng.normal(size=(1, C, H, W)).astype(np.float32))
            sd[f"net.density_line.{i}"] = torch.tensor(
                rng.normal(size=(1, C, L, 1)).astype(np.float32))
            Ha, Wa, Ca = c["app"][f"plane_{i}"].shape
            La, _ = c["app"][f"line_{i}"].shape
            sd[f"net.app_plane.{i}"] = torch.tensor(
                rng.normal(size=(1, Ca, Ha, Wa)).astype(np.float32))
            sd[f"net.app_line.{i}"] = torch.tensor(
                rng.normal(size=(1, Ca, La, 1)).astype(np.float32))
        new_params, report = import_reference_state_dict(sd, params)
        grid_maps = [t for _, t in report["mapped"]]
        assert len(grid_maps) == 12
        assert not report["skipped"]
        want = np.asarray(sd["net.density_line.0"])[0, :, :, 0].T
        assert np.allclose(new_params["color"]["density"]["line_0"], want)


class TestRenderMLPImport:
    def test_mlp_render_fea_keys(self):
        """MLPRender_Fea Sequential keys (mlp.0/2/4, reference
        tensorf_base.py:46-56) land in color/render/l{0,1,2}."""
        from hyperreel_tpu.configs.presets import (
            tiny_static, convert_epochs_to_iters)
        from hyperreel_tpu.models.model import build_model

        cfg = convert_epochs_to_iters(tiny_static(), 100)
        cfg["color"]["net"]["shadingMode"] = "MLP_Fea"
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0))
        render = params["color"]["render"]
        rng = np.random.default_rng(4)
        sd = {}
        for j, name in ((0, "l0"), (2, "l1"), (4, "l2")):
            w = render[name]["w"]
            sd[f"net.renderModule.mlp.{j}.weight"] = torch.tensor(
                rng.normal(size=(w.shape[1], w.shape[0])).astype(np.float32))
            sd[f"net.renderModule.mlp.{j}.bias"] = torch.tensor(
                rng.normal(size=(w.shape[1],)).astype(np.float32))
        new_params, report = import_reference_state_dict(sd, params)
        assert len(report["mapped"]) == 6, report
        assert not report["skipped"], report["skipped"]
        want = np.asarray(sd["net.renderModule.mlp.0.weight"]).T
        assert np.allclose(new_params["color"]["render"]["l0"]["w"], want)
