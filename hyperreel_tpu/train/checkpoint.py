"""Checkpoint/resume (reference: main.py:106-157 INRModelCheckpoint +
nlf/__init__.py:433-479 grid-shape-aware load_state_dict).

Grid shapes change at upsample/shrink events, so checkpoints carry the
current grid resolution + aabb as metadata; restore rebuilds the host-side
net state before loading arrays (SURVEY.md §5 checkpoint/resume)."""

import json
import os
from typing import Optional

import numpy as np
import jax

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _meta_for(trainer_state, model):
    net = model.color_net
    return {
        "it": int(trainer_state.it),
        "grid_size": [int(g) for g in net.grid_size],
        "aabb": np.asarray(net.aabb).tolist(),
    }


def save_checkpoint(path, trainer_state, model, weights_only=False):
    """Write params (+ optimizer state unless weights_only) and metadata."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    meta = _meta_for(trainer_state, model)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)

    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "params"), trainer_state.params,
                   force=True)
        if not weights_only:
            ckptr.save(os.path.join(path, "opt_state"),
                       jax.tree.map(np.asarray, trainer_state.opt_state),
                       force=True)
    else:  # flat-npz fallback
        flat, treedef = jax.tree.flatten(trainer_state.params)
        np.savez(os.path.join(path, "params.npz"),
                 *[np.asarray(x) for x in flat])
    return path


def restore_params(path, model, key=None):
    """Params-only restore for frozen auxiliary models (teacher
    regularizers, reference nlf/regularizers/teacher.py:140-148): rebuild
    the net's host grid state from metadata, re-init, load arrays."""
    import jax.numpy as jnp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    net = model.color_net
    net.grid_size = list(meta["grid_size"])
    net.aabb = np.asarray(meta["aabb"], np.float32)
    template = model.init(key if key is not None else jax.random.PRNGKey(0))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        np_tmpl = jax.tree.map(np.asarray, template)
        rargs = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), np_tmpl)
        params = ckptr.restore(os.path.join(path, "params"), item=np_tmpl,
                               restore_args=rargs)
    else:
        flat, treedef = jax.tree.flatten(template)
        data = np.load(os.path.join(path, "params.npz"))
        params = jax.tree.unflatten(
            treedef, [data[k] for k in data.files])
    return jax.tree.map(jnp.asarray, params)


def restore_checkpoint(path, trainer, key=None):
    """Rebuild model host state from metadata, re-init, then load arrays.
    Returns a TrainState at the checkpointed iteration (optimizer state is
    freshly initialized if it wasn't saved — the reference resets optimizers
    at grid events anyway, reset_opt_list)."""
    import jax.numpy as jnp
    from hyperreel_tpu.train.trainer import TrainState

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    net = trainer.model.color_net
    net.grid_size = list(meta["grid_size"])
    net.aabb = np.asarray(meta["aabb"], np.float32)

    key = key if key is not None else jax.random.PRNGKey(0)
    template = trainer.model.init(key)

    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()

        def _restore_np(ckpt_path, tmpl):
            # restore as host numpy regardless of the topology the
            # checkpoint was saved on (a TPU-saved checkpoint must load in
            # CPU eval jobs and vice versa); jnp.asarray places on the
            # current default device afterwards
            np_tmpl = jax.tree.map(np.asarray, tmpl)
            rargs = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), np_tmpl)
            return ckptr.restore(ckpt_path, item=np_tmpl,
                                 restore_args=rargs)

        params = _restore_np(os.path.join(path, "params"), template)
        params = jax.tree.map(jnp.asarray, params)
        opt_path = os.path.join(path, "opt_state")
        opt = trainer._make_optimizer(params)
        if os.path.exists(opt_path):
            opt_state = _restore_np(opt_path, opt.init(params))
            opt_state = jax.tree.map(jnp.asarray, opt_state)
        else:
            opt_state = opt.init(params)
    else:
        flat, treedef = jax.tree.flatten(template)
        data = np.load(os.path.join(path, "params.npz"))
        params = jax.tree.unflatten(
            treedef, [jnp.asarray(data[k]) for k in data.files])
        opt_state = trainer._make_optimizer(params).init(params)

    return TrainState(params=params, opt_state=opt_state, it=meta["it"])
