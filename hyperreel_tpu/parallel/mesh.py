"""Multi-chip execution (SURVEY.md §2.11 "TPU-native equivalent").

The reference scales with PyTorch-Lightning DDP over NCCL (main.py:174,
186-204). Here: a `jax.sharding.Mesh` with a `data` axis — rays are
embarrassingly parallel — and parameters replicated (factored grids are tens
of MB). Arrays are placed explicitly (`device_put` with NamedShardings) and
a plain `jax.jit` lets XLA propagate shardings: the gradient reduction
appears as a psum over ICI because the replicated-parameter update consumes
data-sharded per-ray losses.

Eval shards image rows the same way (replacing the reference's DDP
rank-striping, nlf/__init__.py:896). Multi-host would add
`jax.distributed.initialize()` + per-host ray shards; the batch iterator
seeds by `jax.process_index()`.
"""

from typing import Optional

import numpy as np
import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperreel_tpu.models.ctx import StepCtx


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host bring-up (the portable replacement for the reference's
    torch-elastic launch, main.py:186-204): `jax.distributed.initialize`
    connects this host to the JAX coordinator; the mesh then spans all
    hosts' devices and per-host batch shards are addressed by
    jax.process_index()."""
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def host_shard_seed(seed):
    """Per-host data seed (replaces PL's per-rank sampler seeding)."""
    return int(seed) * 1000003 + jax.process_index()


def make_mesh(n_devices: Optional[int] = None, axis_name="data",
              devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch sharded over the mesh's data axis. Under a
    multi-process (multi-host) mesh the local batch is THIS host's shard —
    each host feeds rays from its own host_shard_seed'ed iterator and the
    global batch is their concatenation (the reference's per-rank
    DistributedSampler equivalent, main.py:186-204)."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


class ShardedTrainer:
    """Wraps a Trainer with data-parallel placement over a mesh."""

    def __init__(self, trainer, mesh, axis_name="data"):
        self.trainer = trainer
        self.mesh = mesh
        self.axis_name = axis_name
        self._step_cache = {}

    def place_state(self, state):
        from hyperreel_tpu.train.trainer import TrainState
        return TrainState(
            params=replicate(state.params, self.mesh),
            opt_state=replicate(state.opt_state, self.mesh),
            it=state.it,
        )

    def make_train_step(self, params_example):
        optimizer = self.trainer._make_optimizer(params_example)

        def step(params, opt_state, batch, it, rng):
            ctx = StepCtx(it=it, rng=rng, training=True)
            (_, metrics), grads = jax.value_and_grad(
                self.trainer._loss_and_metrics, has_aux=True)(
                    params, batch, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1)), optimizer

    def make_train_step_scan(self, params_example, k):
        """k data-parallel steps per device call (see
        Trainer.make_train_step_scan): stacked batches [k, B, ...] are
        sharded on the BATCH axis (axis 1), iteration numbers and rngs ride
        in as scan inputs, and the psum over the data axis happens inside
        each scan step exactly as in the single-step program."""
        optimizer = self.trainer._make_optimizer(params_example)

        def one(carry, xs):
            params, opt_state = carry
            batch, it, rng = xs
            ctx = StepCtx(it=it, rng=rng, training=True)
            (_, metrics), grads = jax.value_and_grad(
                self.trainer._loss_and_metrics, has_aux=True)(
                    params, batch, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        def scan_step(params, opt_state, batches, its, rngs):
            (params, opt_state), metrics = jax.lax.scan(
                one, (params, opt_state), (batches, its, rngs), length=k)
            return params, opt_state, metrics

        return jax.jit(scan_step, donate_argnums=(0, 1)), optimizer

    def get_train_step(self, params_example):
        """Compiled-step cache keyed on param shapes: shape-preserving
        events (alpha-mask-only) must not recompile a segment (the remote
        AOT helper costs 5-20 min per compile)."""
        from hyperreel_tpu.train.trainer import params_fingerprint
        key = ("step", params_fingerprint(params_example))
        if key not in self._step_cache:
            self._step_cache[key] = self.make_train_step(params_example)
        return self._step_cache[key]

    def get_train_step_scan(self, params_example, k):
        from hyperreel_tpu.train.trainer import params_fingerprint
        key = ("scan", k, params_fingerprint(params_example))
        if key not in self._step_cache:
            self._step_cache[key] = self.make_train_step_scan(
                params_example, k)
        return self._step_cache[key]

    def shard_stacked_batch(self, batch):
        """Place a [k, B, ...] stacked batch with B sharded over the mesh."""
        sharding = NamedSharding(self.mesh, P(None, self.axis_name))
        return {key: jax.device_put(v, sharding) for key, v in batch.items()}

    def run(self, state, batch_iter, num_iters, rng, steps_per_call=None):
        """One segment of sharded training (grid events go through the inner
        trainer between calls)."""
        import jax.numpy as jnp
        from hyperreel_tpu.train.trainer import TrainState
        state = self.place_state(state)
        params, opt_state = state.params, state.opt_state
        metrics = None
        spc = int(steps_per_call
                  if steps_per_call is not None
                  else self.trainer.training_cfg.get("steps_per_call", 1))
        it = state.it

        if spc > 1 and num_iters >= spc:
            scan_step, _ = self.get_train_step_scan(params, spc)

            def next_chunk():
                bs = [next(batch_iter) for _ in range(spc)]
                out = {}
                for key in bs[0]:
                    if isinstance(bs[0][key], np.ndarray):
                        out[key] = np.stack([b[key] for b in bs])
                    else:
                        # device-resident batches: stack on device (a
                        # np.asarray here is a device->host readback per
                        # batch per key — see Trainer.fit's note)
                        out[key] = jnp.stack([b[key] for b in bs])
                return self.shard_stacked_batch(out)

            pending = next_chunk()
            while (state.it + num_iters) - it >= spc:
                chunk = pending
                if (state.it + num_iters) - it >= 2 * spc:
                    pending = next_chunk()
                rng, sub = jax.random.split(rng)
                its = jnp.arange(it, it + spc, dtype=jnp.int32)
                rngs = jax.random.split(sub, spc)
                params, opt_state, metrics = scan_step(
                    params, opt_state, chunk, its, rngs)
                metrics = {key: v[-1] for key, v in metrics.items()}
                it += spc

        if it < state.it + num_iters:
            step, _ = self.get_train_step(params)
            while it < state.it + num_iters:
                batch = shard_batch(next(batch_iter), self.mesh,
                                    self.axis_name)
                rng, sub = jax.random.split(rng)
                params, opt_state, metrics = step(
                    params, opt_state, batch,
                    jnp.asarray(it, jnp.int32), sub)
                it += 1
        return TrainState(params, opt_state, it), metrics

    def fit(self, state, batch_iter, num_iters, rng,
            log_every=0, callback=None):
        """Segment loop with grid events, mirroring Trainer.fit but with
        every step data-parallel over the mesh. Events (upsample / alpha
        mask / shrink) run host-side on the replicated params exactly as in
        the single-chip path."""
        end_it = state.it + num_iters
        history = []
        while state.it < end_it:
            events = self.trainer.pending_events(state.it, end_it)
            seg_end = events[0] if events else end_it
            state, metrics = self.run(state, batch_iter,
                                      seg_end - state.it, rng)
            rng, _ = jax.random.split(rng)
            if metrics is not None:
                m = {k: float(v) for k, v in metrics.items()}
                m["it"] = state.it
                history.append(m)
                if callback:
                    callback(m)
            if events and state.it == seg_end:
                state = self.trainer.apply_event(state, seg_end)
        return state, history


def make_sharded_render(model, mesh, axis_name="data"):
    """Eval forward with rays sharded across devices; outputs stay sharded
    on rays (gather host-side with np.asarray)."""
    data = NamedSharding(mesh, P(axis_name))

    def fwd(params, rays, it):
        ctx = StepCtx(it=it, rng=jax.random.PRNGKey(0), training=False)
        return model.apply(params, rays, ctx)

    jitted = jax.jit(fwd)

    def render(params, rays, it):
        import jax.numpy as jnp
        rays = jax.device_put(jnp.asarray(rays), data)
        return jitted(params, rays, jnp.asarray(it, jnp.int32))

    return render
