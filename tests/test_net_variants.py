"""Net-variant coverage: MultipleNet cascade, standalone TensoRF marching,
ColorTransform embedding with camera ids, joint/CP variants through the
builder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.tensorf import build_color_net
from hyperreel_tpu.models.ctx import make_ctx


BASE = {
    "aabb": [[-2, -2, -2], [2, 2, 2]],
    "N_voxel_init": 16 ** 3, "N_voxel_final": 16 ** 3, "upsamp_list": [],
    "update_AlphaMask_list": [], "fea2denseAct": "relu",
    "distance_scale": 16.0, "density_shift": 0.0,
    "shadingMode": "SH", "data_dim_color": 27,
    "rm_weight_mask_thre": 0, "bf16_tables": False,
}


def _x(B=6, S=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": jnp.asarray(
            rng.uniform(-0.9, 0.9, (B, S, 3)).astype(np.float32)),
        "distances": jnp.asarray(np.sort(
            rng.uniform(0.1, 2, (B, S, 1)).astype(np.float32), axis=1)),
        "viewdirs": jnp.asarray(
            rng.standard_normal((B, S, 3)).astype(np.float32)),
        "weights": jnp.ones((B, S, 1)),
    }


def test_multiple_net_cascade_gating():
    cfg = {
        "type": "multiple",
        "nets": [
            dict(BASE, type="tensor_vm_split_no_sample",
                 n_lamb_sigma=[2, 2, 2], n_lamb_sh=[2, 2, 2],
                 wait_iters=0, stop_iters=100),
            dict(BASE, type="tensor_vm_split_no_sample",
                 n_lamb_sigma=[2, 2, 2], n_lamb_sh=[2, 2, 2],
                 wait_iters=100, stop_iters=10 ** 9),
        ],
    }
    net = build_color_net(cfg)
    p = net.init(jax.random.PRNGKey(0))
    x = _x()
    early = net.apply(p, dict(x), make_ctx(10, training=False),
                      {})["rgb"]
    late = net.apply(p, dict(x), make_ctx(500, training=False),
                     {})["rgb"]
    assert early.shape == (6, 3)
    # different nets active at different iterations -> different outputs
    assert not np.allclose(np.asarray(early), np.asarray(late))


def test_standalone_marching_trains():
    cfg = dict(BASE, type="tensor_vm_split", n_lamb_sigma=[4, 2, 2],
               n_lamb_sh=[4, 2, 2], near_far=[0.5, 3.5], nSamples=16)
    net = build_color_net(cfg)
    p = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    rays = np.concatenate(
        [rng.uniform(-0.3, 0.3, (8, 3)),
         rng.uniform(-0.2, 0.2, (8, 3))], -1).astype(np.float32)
    rays[:, 5] = 1.0
    rays[:, 2] -= 2.0
    rays = jnp.asarray(rays)

    def loss(p):
        out = net.march(p, rays, make_ctx(0, training=True))
        return jnp.mean(out["rgb"] ** 2)

    val, g = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_color_transform_embedding_global():
    from hyperreel_tpu.models.embeddings import build_embedding_chain
    cfg = {"embeddings": {
        "pred": {
            "type": "ray_prediction",
            "params": {"ray": {"start": 0, "end": 6,
                               "param": {"n_dims": 4, "fn": "two_plane"}}},
            "net": {"type": "base", "depth": 3, "hidden_channels": 32,
                    "skips": []},
            "z_channels": 4,
            "outputs": {"z_vals": {"channels": 1},
                        "sigma": {"channels": 1,
                                  "activation": "sigmoid"}},
        },
        "isect": {"type": "ray_intersect", "z_channels": 4,
                  "intersect": {"type": "z_plane", "sort": True,
                                "use_sigma": True,
                                "initial": -1.0, "end": 1.0}},
        "ct": {"type": "color_transform"},
        "extract": {"type": "extract_fields",
                    "fields": ["points", "distances", "weights",
                               "color_transform_global",
                               "color_shift_global"]},
    }}
    chain = build_embedding_chain(cfg, {"num_views": 4})
    params = chain.init(jax.random.PRNGKey(0))
    # give cameras distinct transforms
    params["ct"]["shift"] = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    rng = np.random.default_rng(2)
    rays = np.concatenate(
        [rng.uniform(-0.3, 0.3, (8, 3)),
         rng.uniform(-0.2, 0.2, (8, 3)),
         rng.integers(0, 4, (8, 1)).astype(np.float64),
         rng.uniform(0, 1, (8, 1))], -1).astype(np.float32)
    rays[:, 5] = 1.0
    out = chain.apply(params, jnp.asarray(rays), make_ctx(0))
    assert out["color_shift_global"].shape == (8, 4, 3)
    shifts = np.asarray(out["color_shift_global"])[:, 0, :]
    cams = rays[:, -2].astype(int)
    expected = np.arange(12, dtype=np.float32).reshape(4, 3)[cams]
    np.testing.assert_allclose(shifts, expected, atol=1e-6)


@pytest.mark.parametrize("t,extra", [
    ("tensor_vm", {"n_lamb_sigma": 4, "n_lamb_sh": 8}),
    ("tensor_cp", {"n_lamb_sigma": 16, "n_lamb_sh": 16}),
])
def test_variant_builders_train(t, extra):
    cfg = dict(BASE, type=t, **extra)
    net = build_color_net(cfg)
    p = net.init(jax.random.PRNGKey(0))
    x = _x()

    def loss(p):
        out = net.apply(p, dict(x), make_ctx(100, training=True), {})
        return jnp.mean(out["rgb"] ** 2)

    val, g = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))