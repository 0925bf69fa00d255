"""LPIPS graph tests (weights absent in this env — DATASETS.md — so the
graph is validated with STUBBED weights: random VGG16-shaped filters saved
through the documented npz schema, cross-checked against an independent
torch replica of the lpips forward)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyperreel_tpu.train import lpips as L


def _stub_weights(tmp_path, seed=0):
    rng = np.random.RandomState(seed)
    out = {}
    cin = 3
    ci = 0
    taps = []
    for spec in L._VGG_PLAN:
        if spec is None:
            continue
        out[f"conv_{ci}_w"] = rng.randn(3, 3, cin, spec).astype(
            np.float32) * (1.0 / np.sqrt(9 * cin))
        out[f"conv_{ci}_b"] = rng.randn(spec).astype(np.float32) * 0.01
        if ci in L._TAPS:
            taps.append(spec)
        cin = spec
        ci += 1
    for k, c in enumerate(taps):
        out[f"lin_{k}_w"] = rng.rand(c).astype(np.float32)
    path = str(tmp_path / "lpips_stub.npz")
    np.savez(path, **out)
    return path


def _torch_lpips(params, a, b):
    """Independent torch replica of the lpips(net='vgg') eval forward."""
    import torch

    def prep(im):
        x = torch.from_numpy(im) * 2 - 1
        x = (x - torch.from_numpy(L._SHIFT)) / torch.from_numpy(L._SCALE)
        return x.permute(2, 0, 1)[None]

    def taps(x):
        outs = []
        ci = 0
        for spec in L._VGG_PLAN:
            if spec is None:
                x = torch.nn.functional.max_pool2d(x, 2)
                continue
            w = torch.from_numpy(
                np.asarray(params[f"conv_{ci}_w"])).permute(3, 2, 0, 1)
            bb = torch.from_numpy(np.asarray(params[f"conv_{ci}_b"]))
            x = torch.nn.functional.conv2d(x, w, bb, padding=1)
            x = torch.relu(x)
            if ci in L._TAPS:
                outs.append(x)
            ci += 1
        return outs

    ta, tb = taps(prep(a)), taps(prep(b))
    total = 0.0
    for k, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(
            np.asarray(params[f"lin_{k}_w"]))[None, :, None, None]
        total = total + (d * w).sum(1).mean()
    return float(total)


class TestLpips:
    def test_identity_is_zero_and_distance_positive(self, tmp_path):
        path = _stub_weights(tmp_path)
        params = L.load_weights(path)
        rng = np.random.RandomState(1)
        a = rng.rand(33, 37, 3).astype(np.float32)
        b = rng.rand(33, 37, 3).astype(np.float32)
        d_aa = float(L.lpips(params, jnp.asarray(a), jnp.asarray(a)))
        d_ab = float(L.lpips(params, jnp.asarray(a), jnp.asarray(b)))
        assert d_aa == pytest.approx(0.0, abs=1e-6)
        assert d_ab > 1e-4
        # symmetric
        d_ba = float(L.lpips(params, jnp.asarray(b), jnp.asarray(a)))
        assert d_ab == pytest.approx(d_ba, rel=1e-5)

    def test_matches_torch_replica(self, tmp_path):
        path = _stub_weights(tmp_path)
        params = L.load_weights(path)
        rng = np.random.RandomState(2)
        a = rng.rand(32, 32, 3).astype(np.float32)
        b = np.clip(a + rng.randn(32, 32, 3).astype(np.float32) * 0.1,
                    0, 1)
        ours = float(L.lpips(params, jnp.asarray(a), jnp.asarray(b)))
        ref = _torch_lpips(params, a, b)
        assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)

    def test_convert_torch_weights_roundtrip(self, tmp_path):
        import torch
        rng = np.random.RandomState(3)
        vgg_sd = {}
        feat_idx = 0
        cin = 3
        ci = 0
        taps = []
        for spec in L._VGG_PLAN:
            if spec is None:
                feat_idx += 1
                continue
            vgg_sd[f"features.{feat_idx}.weight"] = torch.from_numpy(
                rng.randn(spec, cin, 3, 3).astype(np.float32))
            vgg_sd[f"features.{feat_idx}.bias"] = torch.from_numpy(
                rng.randn(spec).astype(np.float32))
            if ci in L._TAPS:
                taps.append(spec)
            cin = spec
            ci += 1
            feat_idx += 2
        lin_sd = {f"lin{k}.model.1.weight": torch.from_numpy(
            rng.rand(1, c, 1, 1).astype(np.float32))
            for k, c in enumerate(taps)}
        path = str(tmp_path / "conv.npz")
        L.convert_torch_weights(vgg_sd, lin_sd, path)
        params = L.load_weights(path)
        w0 = np.asarray(params["conv_0_w"])
        want = vgg_sd["features.0.weight"].numpy().transpose(2, 3, 1, 0)
        assert np.allclose(w0, want)
        assert params["lin_0_w"].shape == (64,)
