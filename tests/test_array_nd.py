"""Learned-array / tensor-factorization net family
(reference nlf/nets/array_nd.py + nlf/nets/tensor.py), including golden
parity of ArrayND sampling vs torch grid_sample(align_corners=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.array_nd import (
    ArrayND, ArrayNDMultiple, ArrayNDSubdivided,
    TensorProduct, TensorConcat, TensorPassthrough, TensorReduce)


def _x(n=64, c=4, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, (n, c)).astype(np.float32))


class TestArrayND:
    def test_torch_grid_sample_parity(self):
        """ArrayND sampling == torch F.grid_sample(align_corners=False,
        padding_mode=zeros) on in-range coords
        (reference array_nd.py:100-118)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        H, W, C = 7, 9, 5
        grid = rng.standard_normal((H, W, C)).astype(np.float32)
        coords = rng.uniform(-0.98, 0.98, (50, 2)).astype(np.float32)

        arr = ArrayND(cfg={"input_channels": [0, 1], "size": [W, H]},
                      in_channels=2, out_channels=C)
        params = {"grid": jnp.asarray(grid)}
        ours = np.asarray(arr.apply(params, jnp.asarray(coords)))

        t_grid = torch.tensor(grid).permute(2, 0, 1)[None]  # [1, C, H, W]
        t_coords = torch.tensor(coords)[None, :, None, :]   # [1, N, 1, 2]
        want = F.grid_sample(t_grid, t_coords, mode="bilinear",
                             padding_mode="zeros", align_corners=False)
        want = want[0, :, :, 0].permute(1, 0).numpy()
        np.testing.assert_allclose(ours, want, atol=2e-5)

    def test_out_of_range_zero(self):
        arr = ArrayND(cfg={"input_channels": [0, 1], "size": [8, 8],
                           "range": [[-1, 1], [-1, 1]]},
                      in_channels=2, out_channels=3)
        params = arr.init(jax.random.PRNGKey(0))
        x = jnp.asarray([[2.0, 0.0], [0.0, 0.0]])
        out = np.asarray(arr.apply(params, x))
        assert np.all(out[0] == 0.0)
        assert not np.all(out[1] == 0.0)

    def test_group_init_scale(self):
        c = ArrayND(cfg={"input_channels": [0], "size": [16],
                         "group": "color"}, in_channels=1, out_channels=4)
        e = ArrayND(cfg={"input_channels": [0], "size": [16],
                         "group": "embedding"}, in_channels=1,
                    out_channels=4)
        gc = np.asarray(c.init(jax.random.PRNGKey(0))["grid"])
        ge = np.asarray(e.init(jax.random.PRNGKey(0))["grid"])
        assert np.abs(gc).max() > 0.5       # uniform(-1, 1)
        assert np.abs(ge).max() <= 0.011    # uniform(-0.01, 0.01)

    def test_activation(self):
        arr = ArrayND(cfg={"input_channels": [0, 1], "size": [8, 8],
                           "activation": "sigmoid"},
                      in_channels=2, out_channels=3)
        params = arr.init(jax.random.PRNGKey(0))
        out = np.asarray(arr.apply(params, _x(16, 2)))
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestArrayNDMultiple:
    def test_product_equals_manual(self):
        cfg = {"input_channels": [0, 1, 2, 3], "size": [8, 6],
               "num_factors": 2,
               "range": [[-1, 1], [-1, 1], [-2, 2], [-2, 2]],
               "product_mode": "product"}
        arr = ArrayNDMultiple(cfg=cfg, in_channels=4, out_channels=3)
        params = arr.init(jax.random.PRNGKey(0))
        x = _x(32, 4)
        out = np.asarray(arr.apply(params, x))
        assert out.shape == (32, 3)

        # manual: factor f samples grid[f] at its own normalized coords
        singles = []
        for f in range(2):
            sub = ArrayND(cfg={"input_channels": [2 * f, 2 * f + 1],
                               "size": [8, 6],
                               "range": cfg["range"][2 * f:2 * f + 2]},
                          in_channels=4, out_channels=3)
            singles.append(np.asarray(
                sub.apply({"grid": params["grid"][f]}, x)))
        np.testing.assert_allclose(out, singles[0] * singles[1], atol=1e-5)

    def test_concat_mode(self):
        cfg = {"input_channels": [0, 1, 2, 3], "size": [8, 6],
               "num_factors": 2, "range": [[-1, 1]] * 4,
               "product_mode": "concat"}
        arr = ArrayNDMultiple(cfg=cfg, in_channels=4, out_channels=3)
        params = arr.init(jax.random.PRNGKey(0))
        out = arr.apply(params, _x(16, 4))
        assert out.shape == (16, 6)


class TestArrayNDSubdivided:
    def test_cells_are_independent(self):
        cfg = {"input_channels": [0, 1], "size": [8, 8],
               "range": [[-1, 1], [-1, 1], [-1, 1]],
               "grid_size": [2, 2, 2]}
        arr = ArrayNDSubdivided(cfg=cfg, in_channels=3, out_channels=2)
        params = arr.init(jax.random.PRNGKey(0))
        assert params["grid"].shape == (8, 4, 4, 2)
        # two points in different voxels read different tiles
        x = jnp.asarray([[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]])
        out = np.asarray(arr.apply(params, x))
        assert out.shape == (2, 2)
        assert np.all(np.isfinite(out))
        assert not np.allclose(out[0], out[1])

    def test_gradients(self):
        cfg = {"input_channels": [0, 1], "size": [8, 8],
               "range": [[-1, 1]] * 3, "grid_size": [2, 2, 2]}
        arr = ArrayNDSubdivided(cfg=cfg, in_channels=3, out_channels=2)
        params = arr.init(jax.random.PRNGKey(0))

        def loss(p):
            return jnp.sum(arr.apply(p, _x(16, 3)) ** 2)

        g = jax.grad(loss)(params)
        assert np.all(np.isfinite(np.asarray(g["grid"])))


class TestTensorNets:
    TENSORS = {"a": {"type": "array_nd", "input_channels": [0, 1],
                     "size": [8, 8]},
               "b": {"type": "array_nd", "input_channels": [2, 3],
                     "size": [8, 8]}}

    def test_product_plain(self):
        net = TensorProduct(cfg={"num_basis": 4, "tensors": self.TENSORS},
                            in_channels=4, out_channels=3)
        params = net.init(jax.random.PRNGKey(0))
        out = net.apply(params, _x(16, 4))
        assert out.shape == (16, 3)

    def test_product_opacity_split(self):
        net = TensorProduct(
            cfg={"num_basis": 4, "num_opacity_basis": 2,
                 "tensors": self.TENSORS},
            in_channels=4, out_channels=4)
        params = net.init(jax.random.PRNGKey(0))
        out = net.apply(params, _x(16, 4))
        assert out.shape == (16, 4)

    def test_product_with_basis_mlp(self):
        net = TensorProduct(
            cfg={"num_basis": 4, "num_opacity_basis": 2,
                 "basis": {"type": "base", "depth": 2,
                           "hidden_channels": 16},
                 "tensors": self.TENSORS},
            in_channels=4, out_channels=4)
        params = net.init(jax.random.PRNGKey(0))
        out = net.apply(params, _x(16, 4))
        assert out.shape == (16, 4)
        g = jax.grad(lambda p: jnp.sum(net.apply(p, _x(16, 4)) ** 2))(
            params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree.leaves(g))

    def test_concat_passthrough_reduce(self):
        for cls, out_ch, want in ((TensorConcat, 4, (16, 4)),
                                  (TensorPassthrough, 3, (16, 3)),
                                  (TensorReduce, 3, (16, 3))):
            net = cls(cfg={"num_basis": 2, "tensors": self.TENSORS},
                      in_channels=4, out_channels=out_ch)
            params = net.init(jax.random.PRNGKey(0))
            out = net.apply(params, _x(16, 4))
            assert out.shape == want, cls.__name__

    def test_build_net_dispatch(self):
        from hyperreel_tpu.models.mlp import build_net
        net = build_net(4, 3, {"type": "array_nd",
                               "input_channels": [0, 1], "size": [8, 8]})
        assert isinstance(net, ArrayND)
        net = build_net(4, 3, {"type": "tensor_reduce",
                               "tensors": self.TENSORS})
        assert isinstance(net, TensorReduce)
