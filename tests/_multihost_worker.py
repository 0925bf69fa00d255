"""Worker process for the 2-process multi-host CPU test
(tests/test_multihost.py). Each process owns 2 virtual CPU devices; the
global mesh spans 4. Validates initialize_multihost, per-host seeding, a
cross-process psum, and a ShardedTrainer-style global batch placement.

Run: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hyperreel_tpu.parallel.mesh import (  # noqa: E402
    host_shard_seed, initialize_multihost, make_mesh)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    idx, cnt = initialize_multihost(f"localhost:{port}", nproc, pid)
    assert idx == pid and cnt == nproc, (idx, cnt)

    mesh = make_mesh(devices=jax.devices())  # global: nproc * 2 devices
    n_global = len(jax.devices())
    assert n_global == nproc * 2, n_global

    # per-host distinct data seed (replaces PL per-rank sampler seeding)
    seed = host_shard_seed(7)

    # global data-sharded array assembled from process-local shards:
    # host i contributes rows filled with (i + 1)
    local = np.full((2, 4), idx + 1, np.float32)
    sharding = NamedSharding(mesh, P("data"))
    arr = jax.make_array_from_process_local_data(sharding, local,
                                                 (n_global, 4))

    # cross-process reduction: sum over the data axis -> replicated result
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    total = float(np.asarray(total))

    # expected: sum_i 2 rows * 4 cols * (i + 1)
    expect = float(8 * sum(i + 1 for i in range(nproc)))
    assert total == expect, (total, expect)

    # one REAL data-parallel training step over the global mesh: params
    # replicated, each host feeding its own seed's rays (shard_batch uses
    # make_array_from_process_local_data under multi-process)
    from hyperreel_tpu.configs.presets import (
        tiny_static, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import random_ray_dataset
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.parallel.mesh import ShardedTrainer, shard_batch
    from hyperreel_tpu.train.trainer import Trainer

    group = {"optimizer": "adam", "lr": 0.02, "lr_scheduler": "exp",
             "decay_epoch": 100, "decay_gamma": 0.125}
    tcfg = {"loss": {"type": "mse"},
            "optimizers": {"color": dict(group),
                           "color_impl": dict(group, lr=0.001),
                           "embedding": dict(group, lr=0.01),
                           "embedding_impl": dict(group, lr=0.00075)}}
    cfg = convert_epochs_to_iters(tiny_static(), iters_per_epoch=50)
    ds = random_ray_dataset(n_rays=512, dynamic=False)
    model = build_model(cfg, dataset_info=ds.info())
    trainer = Trainer(model, tcfg, iters_per_epoch=50)
    sharded = ShardedTrainer(trainer, mesh)
    state = sharded.place_state(trainer.init_state(jax.random.PRNGKey(0)))
    step, _ = sharded.make_train_step(state.params)
    batch = next(ds.batch_iterator(64, seed=seed))  # per-host local shard
    sb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    p2, o2, metrics = step(state.params, state.opt_state, sb,
                           jnp.asarray(0, jnp.int32), jax.random.PRNGKey(7))
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss

    print(f"RESULT pid={pid} total={total} seed={seed} loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
