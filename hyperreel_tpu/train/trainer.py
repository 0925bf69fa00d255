"""Training orchestration (reference: nlf/__init__.py INRSystem +
TensorBase.set_iter grid events).

TPU-first structure: one jitted `train_step` per *segment*; grid-shape
events (upsample @ upsamp_list, alpha-mask/shrink @ update_AlphaMask_list)
are host-side rebuild points between segments — param shapes change, the
optimizer state is re-initialized (reference reset_opt_list), and XLA
recompiles once per segment. Inside a segment everything (losses,
regularizers, schedules) is traced with the iteration as data.
"""

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hyperreel_tpu.models.ctx import StepCtx
from hyperreel_tpu.models.tensorf import n_to_reso
from hyperreel_tpu.train.losses import get_loss
from hyperreel_tpu.train.optim import build_optimizer
from hyperreel_tpu.train.regularizers import build_regularizers


@dataclass
class TrainState:
    params: dict
    opt_state: object
    it: int  # host-side integer


def params_fingerprint(params):
    """Hashable (treedef, shapes, dtypes) key for the compiled-step cache.

    Grid events that change no shapes (e.g. a second alpha-mask update,
    reference tensorf_base.py:509-553) must NOT recompile: through the
    remote AOT helper a recompile costs 5-20 min per segment."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return (treedef,
            tuple((tuple(l.shape), np.dtype(l.dtype).str) for l in leaves))


class Trainer:
    """Single-model trainer with segment-based grid events."""

    def __init__(self, model, training_cfg, regularizer_cfgs=None,
                 iters_per_epoch=4000, mesh=None, donate=True):
        self.model = model
        self.training_cfg = training_cfg
        self.iters_per_epoch = iters_per_epoch
        self.loss_fn = get_loss(training_cfg.get("loss", {"type": "mse"}))
        self.regularizers = build_regularizers(regularizer_cfgs)
        self.optimizers_cfg = training_cfg["optimizers"]
        self.mesh = mesh
        self.donate = donate
        self._cached_step = None
        self._step_cache = {}
        # back-reference set by System: regularizers that synthesize rays
        # from train-camera statistics (ray_density, reference
        # nlf/regularizers/ray_density.py) read dataset poses through it
        self.system = None

        net = model.color_net
        self.upsamp_list = list(net.upsamp_list)
        self.alpha_list = list(net.update_alphamask_list)
        self.n_voxel_list = list(net.n_voxel_list)

    # -- state -------------------------------------------------------------

    def init_state(self, key, it=0):
        params = self.model.init(key)
        wi = self.training_cfg.get("weight_init")
        if wi and wi.get("type", "none") != "none":
            from hyperreel_tpu.train.optim import apply_weight_init
            params = apply_weight_init(params, wi,
                                       jax.random.fold_in(key, 77))
        opt = self._make_optimizer(params)
        return TrainState(params=params, opt_state=opt.init(params), it=it)

    def _make_optimizer(self, params):
        labels = self.model.param_groups(params)
        return build_optimizer(self.optimizers_cfg, labels,
                               self.iters_per_epoch)

    # -- the jitted step ---------------------------------------------------

    def _loss_and_metrics(self, params, batch, ctx):
        out = self.model.apply(params, batch["rays"], ctx)
        rgb = out["rgb"]
        target = batch["rgb"]
        weights = batch.get("weights", None)
        if weights is not None:
            image_loss = self.loss_fn(rgb * weights, target * weights)
        else:
            image_loss = self.loss_fn(rgb, target)
        total = image_loss
        for name, reg in self.regularizers:
            total = total + reg.loss(self.model, params, batch, ctx,
                                     system=self.system)
        mse = jnp.mean((rgb - target) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        return total, {"loss": total, "image_loss": image_loss, "psnr": psnr}

    def make_train_step(self, params_example):
        optimizer = self._make_optimizer(params_example)

        def train_step(params, opt_state, batch, it, rng):
            ctx = StepCtx(it=it, rng=rng, training=True)
            (_, metrics), grads = jax.value_and_grad(
                self._loss_and_metrics, has_aux=True)(params, batch, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        donate = (0, 1) if self.donate else ()
        return jax.jit(train_step, donate_argnums=donate), optimizer

    def make_train_step_scan(self, params_example, k):
        """k steps per device call via lax.scan over stacked batches.

        Amortizes host dispatch (the dominant wall-clock cost when the
        device sits behind a network tunnel) — one jitted call advances k
        optimizer steps. Iteration numbers and per-step rngs ride in as
        scan inputs so schedules stay exact.
        """
        optimizer = self._make_optimizer(params_example)

        def one(carry, xs):
            params, opt_state = carry
            batch, it, rng = xs
            ctx = StepCtx(it=it, rng=rng, training=True)
            (_, metrics), grads = jax.value_and_grad(
                self._loss_and_metrics, has_aux=True)(params, batch, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        def scan_step(params, opt_state, batches, its, rngs):
            (params, opt_state), metrics = jax.lax.scan(
                one, (params, opt_state), (batches, its, rngs), length=k)
            return params, opt_state, metrics

        donate = (0, 1) if self.donate else ()
        return jax.jit(scan_step, donate_argnums=donate), optimizer

    # -- compiled-step cache -------------------------------------------------

    def get_train_step(self, params_example):
        """make_train_step, memoized on param shapes (see
        params_fingerprint): shape-preserving grid events reuse the
        compiled step instead of re-jitting every segment."""
        key = ("step", params_fingerprint(params_example))
        if key not in self._step_cache:
            self._step_cache[key] = self.make_train_step(params_example)
        return self._step_cache[key]

    def get_train_step_scan(self, params_example, k):
        key = ("scan", k, params_fingerprint(params_example))
        if key not in self._step_cache:
            self._step_cache[key] = self.make_train_step_scan(
                params_example, k)
        return self._step_cache[key]

    # -- host-side grid events (reference tensorf_base.py:509-553) ----------

    def pending_events(self, start_it, end_it):
        """Event iterations in (start_it, end_it]."""
        evts = sorted(set(
            [i for i in self.upsamp_list if start_it < i <= end_it]
            + [i for i in self.alpha_list if start_it < i <= end_it]))
        return evts

    def apply_event(self, state: TrainState, it: int) -> TrainState:
        """Mirror TensorBase.set_iter at iteration `it`: alpha-mask update
        (+shrink on the first), then upsample, then optimizer reset."""
        net = self.model.color_net
        params = state.params
        changed = False

        if it in self.alpha_list:
            reso = tuple(min(g, 200) for g in net.grid_size)
            binary, new_aabb = net.compute_alpha_grid(params["color"], reso)
            new_aabb = np.asarray(new_aabb)
            self.alpha_grid = np.asarray(binary)
            if it == self.alpha_list[0] and np.all(np.isfinite(new_aabb)):
                params = dict(params,
                              color=net.shrink(params["color"], new_aabb))
                changed = True

        upsampled = False
        if it in self.upsamp_list and self.n_voxel_list:
            idx = self.upsamp_list.index(it)
            n_voxels = self.n_voxel_list[idx]
            reso = n_to_reso(n_voxels, net.aabb)
            params = dict(params, color=net.upsample(params["color"], reso))
            changed = True
            upsampled = True

        # reference semantics: optimizer reset at upsample iters when
        # lr_upsample_reset (tensorf_base.py:546-551); any shape change
        # (shrink) forces a rebuild regardless
        if changed or (upsampled and net.lr_upsample_reset):
            opt = self._make_optimizer(params)
            opt_state = opt.init(params)
        else:
            opt_state = state.opt_state
        return TrainState(params=params, opt_state=opt_state, it=it)

    # -- the segment loop --------------------------------------------------

    def fit(self, state: TrainState, batch_iter, num_iters, rng,
            log_every=0, callback=None):
        """Run `num_iters` steps from state.it, handling grid events.
        `batch_iter` yields batches (dicts of jnp arrays)."""
        end_it = state.it + num_iters
        history = []
        spc = int(self.training_cfg.get("steps_per_call", 1))

        def log(metrics, it, idx=None):
            m = {k: float(v if idx is None else v[idx])
                 for k, v in metrics.items()}
            m["it"] = it
            history.append(m)
            if callback:
                callback(m)

        while state.it < end_it:
            events = self.pending_events(state.it, end_it)
            seg_end = events[0] if events else end_it
            params, opt_state = state.params, state.opt_state

            if spc > 1 and (seg_end - state.it) >= spc:
                scan_step, _ = self.get_train_step_scan(params, spc)

                def next_chunk():
                    bs = [next(batch_iter) for _ in range(spc)]
                    out = {}
                    for k in bs[0]:
                        if isinstance(bs[0][k], np.ndarray):
                            out[k] = jax.device_put(
                                np.stack([b[k] for b in bs]))
                        else:
                            # device-resident batches: stack ON device —
                            # np.stack here triggered a device->host
                            # readback PER BATCH PER KEY through the
                            # tunnel (~10-50 ms each; measured 153-202
                            # ms/step vs ~17 for spc=1)
                            out[k] = jnp.stack([b[k] for b in bs])
                    return out

                # NOTE (negative result, round 2): moving next_chunk onto a
                # ThreadPoolExecutor worker did not help either (the slow
                # step was the hidden readbacks above, and threaded
                # device_put serializes against in-flight dispatch).
                pending = next_chunk()
                while (seg_end - state.it) >= spc:
                    chunk = pending
                    if (seg_end - state.it) >= 2 * spc:
                        pending = next_chunk()
                    rng, sub = jax.random.split(rng)
                    its = jnp.arange(state.it, state.it + spc, dtype=jnp.int32)
                    rngs = jax.random.split(sub, spc)
                    params, opt_state, metrics = scan_step(
                        params, opt_state, chunk, its, rngs)
                    prev_it = state.it
                    state = TrainState(params, opt_state, state.it + spc)
                    if log_every:
                        for j in range(spc):
                            if (prev_it + j + 1) % log_every == 0:
                                log(metrics, prev_it + j + 1, j)

            if state.it < seg_end:
                step, _ = self.get_train_step(params)
                # one-batch prefetch: device_put is async, so the next batch
                # uploads while the current step computes (host->device goes
                # through a tunnel here; unoverlapped it costs ~a step's
                # time)
                pending = jax.device_put(next(batch_iter))
                while state.it < seg_end:
                    batch = pending
                    if state.it + 1 < seg_end:
                        pending = jax.device_put(next(batch_iter))
                    rng, sub = jax.random.split(rng)
                    params, opt_state, metrics = step(
                        params, opt_state, batch,
                        jnp.asarray(state.it, jnp.int32), sub)
                    state = TrainState(params, opt_state, state.it + 1)
                    if log_every and state.it % log_every == 0:
                        log(metrics, state.it)
            if events and state.it == seg_end:
                state = self.apply_event(state, seg_end)
        return state, history
