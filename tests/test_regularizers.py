"""Regularizer behavior tests: weight schedules, finite gradients, and the
tensorf L1 switch (reference semantics, SURVEY.md §2.8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.configs.presets import tiny_static, convert_epochs_to_iters
from hyperreel_tpu.data.synthetic import random_ray_dataset
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.train.regularizers import (
    build_regularizers, schedule_weight, tv_4000_defaults)


@pytest.fixture(scope="module")
def setup():
    cfg = convert_epochs_to_iters(tiny_static(), 100)
    ds = random_ray_dataset(n_rays=512)
    model = build_model(cfg, dataset_info=ds.info())
    params = model.init(jax.random.PRNGKey(0))
    batch = next(ds.batch_iterator(64, seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return model, params, batch


def test_schedule_weight_window():
    cfg = {"weight": 2.0, "wait_iters": 10, "warmup_iters": 10,
           "stop_iters": 100}
    it = jnp.asarray
    assert float(schedule_weight(cfg, it(5))) == 0.0
    assert float(schedule_weight(cfg, it(15))) == pytest.approx(1.0)
    assert float(schedule_weight(cfg, it(50))) == pytest.approx(2.0)
    assert float(schedule_weight(cfg, it(100))) == 0.0


def test_tensorf_l1_switch(setup):
    model, params, batch = setup
    regs = build_regularizers(tv_4000_defaults())
    (_, reg), = regs
    early = float(reg.loss(model, params, batch, make_ctx(100)))
    late = float(reg.loss(model, params, batch, make_ctx(5000)))
    assert early > 0 and late > 0
    # L1 weight halves after the first alpha-mask iter (8e-5 -> 4e-5);
    # TV part unchanged, so late < early for identical params
    assert late < early


@pytest.mark.parametrize("reg_cfg", [
    {"type": "simple_ray_density", "weight": 1.0,
     "jitter": {"pos_std": 0.01, "dir_std": 0.01}},
    {"type": "ray_density", "weight": 1.0},
    {"type": "point", "weight": 1.0},
    {"type": "flow", "weight": 1.0},
    {"type": "voxel_sparsity", "weight": 1.0},
    {"type": "fourier", "weight": 1.0},
    {"type": "coarse", "weight": 1.0},
])
def test_extra_regularizers_finite_grads(setup, reg_cfg):
    model, params, batch = setup
    (_, reg), = build_regularizers({"r": reg_cfg})

    def loss(p):
        return reg.loss(model, p, batch, make_ctx(100, training=True))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree.leaves(grads))


def test_teacher_regularizer(setup):
    model, params, batch = setup
    (_, reg), = build_regularizers({"teacher": {"type": "teacher",
                                                "weight": 1.0}})
    # without a teacher -> zero
    assert float(reg.loss(model, params, batch, make_ctx(0))) == 0.0
    teacher_params = model.init(jax.random.PRNGKey(9))
    reg.set_teacher(model, teacher_params)
    val = float(reg.loss(model, params, batch, make_ctx(0, training=True)))
    assert np.isfinite(val) and val > 0
