"""Angular-flow advection path (reference AdvectPointsEmbedding
use_angular_flow, nlf/embedding/point.py:802-815): rotation about a
predicted anchor scaled by the keyframe time offset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_dynamic, convert_epochs_to_iters
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.models.ctx import make_ctx


@pytest.fixture(scope="module")
def angular_model():
    cfg = convert_epochs_to_iters(tiny_dynamic(), 100)
    emb = cfg["embedding"]["embeddings"]
    emb["ray_prediction_0"]["outputs"]["angular_flow"] = {
        "channels": 6, "activation": {"type": "identity", "outer_fac": 0.1}}
    emb["flow_0"]["use_angular_flow"] = True
    info = {"num_keyframes": 2, "num_frames": 4, "num_views": 4}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _rays(n=16, seed=0):
    rng = np.random.default_rng(seed)
    r = np.concatenate([
        rng.uniform(-0.3, 0.3, (n, 3)),
        rng.uniform(-0.2, 0.2, (n, 3)),
        rng.integers(0, 4, (n, 1)).astype(np.float64),
        rng.uniform(0, 1, (n, 1))], -1).astype(np.float32)
    r[:, 5] = 1.0
    r[:, 2] -= 1.5
    return jnp.asarray(r)


def test_forward_and_grads(angular_model):
    model, params = angular_model
    rays = _rays()
    out = model.apply(params, rays, make_ctx(1000, training=False))
    assert out["rgb"].shape == (16, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))

    def loss(p):
        return jnp.mean(model.apply(p, rays,
                                    make_ctx(10, training=True))["rgb"] ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_rotation_fields_exposed(angular_model):
    model, params = angular_model
    rays = _rays(8, seed=1)
    x = model.embed(params, rays, make_ctx(1000, training=False),
                    {"fields": ["angular_flow_rot", "angular_flow_anchor"]})
    assert "angular_flow_rot" in x and "angular_flow_anchor" in x
    assert x["angular_flow_rot"].shape[-1] == 3
