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
