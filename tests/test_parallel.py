"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4.4):
ray-sharded training step, replicated params, sharded eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hyperreel_tpu.configs.presets import tiny_static, convert_epochs_to_iters
from hyperreel_tpu.data.synthetic import random_ray_dataset
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.parallel.mesh import (
    make_mesh, ShardedTrainer, shard_batch, replicate, make_sharded_render)
from hyperreel_tpu.train.trainer import Trainer


def _training_cfg():
    group = {"optimizer": "adam", "lr": 0.02, "lr_scheduler": "exp",
             "decay_epoch": 100, "decay_gamma": 0.125}
    return {
        "loss": {"type": "mse"},
        "optimizers": {
            "color": dict(group),
            "color_impl": dict(group, lr=0.001),
            "embedding": dict(group, lr=0.01),
            "embedding_impl": dict(group, lr=0.00075),
        },
    }


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
    ds = random_ray_dataset(n_rays=2048, dynamic=False)
    model = build_model(cfg, dataset_info=ds.info())
    trainer = Trainer(model, _training_cfg(), iters_per_epoch=50)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    return model, trainer, state, mesh, ds


def test_sharded_step_runs_and_matches_single_device(setup):
    model, trainer, state, mesh, ds = setup
    batch = next(ds.batch_iterator(512, seed=3))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # single-device reference step (fresh state: the step donates its
    # params/opt-state buffers, so the shared fixture state must not be used)
    s1 = trainer.init_state(jax.random.PRNGKey(0))
    step1, _ = trainer.make_train_step(s1.params)
    p1, o1, m1 = step1(s1.params, s1.opt_state, batch,
                       jnp.asarray(0, jnp.int32), jax.random.PRNGKey(7))

    # sharded step on the 8-device mesh
    sharded = ShardedTrainer(trainer, mesh)
    st = sharded.place_state(trainer.init_state(jax.random.PRNGKey(0)))
    step8, _ = sharded.make_train_step(st.params)
    sb = shard_batch(batch, mesh)
    p8, o8, m8 = step8(st.params, st.opt_state, sb,
                       jnp.asarray(0, jnp.int32), jax.random.PRNGKey(7))

    assert np.isfinite(float(m8["loss"]))
    # same initial params + same batch => same loss & updated params
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(p1)
    l8 = jax.tree.leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_batch_actually_sharded(setup):
    model, trainer, state, mesh, ds = setup
    batch = next(ds.batch_iterator(512, seed=1))
    sb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    shards = sb["rays"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 512 // 8


def test_sharded_render(setup):
    model, trainer, state, mesh, ds = setup
    render = make_sharded_render(model, mesh)
    rays = ds.all_coords[:1024]
    params = replicate(state.params, mesh)
    out = render(params, rays, 0)
    assert out["rgb"].shape == (1024, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))


def test_sharded_render_coherent_gather(setup):
    """Patch-gather mode composes with the sharded eval render: per-
    device ray shards keep 4-consecutive-ray blocks intact (shard sizes
    divide by 4) and parity vs the unsharded patch render holds."""
    from hyperreel_tpu.configs.presets import (
        tiny_dynamic, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.ctx import StepCtx

    model, trainer, state, mesh, ds0 = setup
    cfg = with_coherent_gather(
        convert_epochs_to_iters(tiny_dynamic(), iters_per_epoch=50))
    cfg["color"]["net"]["fused_render"] = True
    cfg["color"]["net"]["bf16_tables"] = True
    ds = gaussian_blob_scene(n_views=2, wh=(16, 16), dynamic=True,
                             num_frames=4, num_keyframes=2)
    m = build_model(cfg, dataset_info=ds.info())
    assert m._cf_eval is not None and m._cf_eval.patch_cfg is not None
    params0 = m.init(jax.random.PRNGKey(0))
    rays = ds.all_coords[:1024]
    render = make_sharded_render(m, mesh)
    out = render(replicate(params0, mesh), rays, 0)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    ctx = StepCtx(it=jnp.int32(0), rng=jax.random.PRNGKey(0),
                  training=False)
    ref = m.apply(params0, jnp.asarray(rays), ctx)["rgb"]
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref),
                               rtol=2e-3, atol=2e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_scan_run(setup):
    """ShardedTrainer.run with steps_per_call>1 advances k steps per device
    call over the mesh and lands on the right iteration count."""
    model, trainer, state, mesh, ds = setup
    sharded = ShardedTrainer(trainer, mesh)
    st = trainer.init_state(jax.random.PRNGKey(1))
    batches = (
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in ds.batch_iterator(512, seed=5))
    out, metrics = sharded.run(st, batches, num_iters=10,
                               rng=jax.random.PRNGKey(2), steps_per_call=4)
    assert out.it == 10
    assert np.isfinite(float(metrics["loss"]))
