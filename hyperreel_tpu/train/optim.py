"""Named optimizer groups (reference: utils/__init__.py:49-130 and
conf/experiment/training/*_tensorf.yaml `optimizers:` blocks).

The reference keeps one torch optimizer per named group (color, color_impl,
embedding, embedding_impl), each with its own lr + per-epoch exp decay, and
rebuilds them at grid-upsample iters. Here: one `optax.multi_transform` over
group labels, per-group scale-by-schedule, and `init_opt_state` re-run by the
segment runner at reset iters (reference INRSystem.reset_optimizers,
nlf/__init__.py:529-578).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(group_cfg, iters_per_epoch):
    """Per-epoch-stepped schedules (reference utils/__init__.py:78-126).

    exp: lr * gamma^(epoch/decay_epoch), zero after stop_epoch.
    steplr: lr * gamma^(epoch >= decay_epoch).
    poly: lr * (1 - epoch/num_epochs)^poly_exp.
    cosine: cosine annealing to ~0 over num_epochs.
    Optional linear warmup over warmup_epochs with warmup_multiplier.
    """
    kind = group_cfg.get("lr_scheduler", "exp")
    lr0 = float(group_cfg["lr"])
    gamma = float(group_cfg.get("decay_gamma", 1.0))
    decay_epoch = float(group_cfg.get("decay_epoch", 100))
    stop_epoch = float(group_cfg.get("stop_epoch", float("inf")))
    num_epochs = float(group_cfg.get("num_epochs", 100))
    poly_exp = float(group_cfg.get("poly_exp", 1.0))
    warmup_epochs = float(group_cfg.get("warmup_epochs", 0))
    warmup_mult = float(group_cfg.get("warmup_multiplier", 1.0))

    def schedule(it):
        epoch = jnp.floor(it / iters_per_epoch)
        if kind == "exp":
            lr = lr0 * gamma ** (epoch / decay_epoch)
            if stop_epoch != float("inf"):
                lr = jnp.where(epoch > stop_epoch, 0.0, lr)
        elif kind == "steplr":
            lr = lr0 * jnp.where(epoch >= decay_epoch, gamma, 1.0)
        elif kind == "poly":
            lr = lr0 * jnp.maximum(1.0 - epoch / num_epochs, 0.0) ** poly_exp
        elif kind == "cosine":
            lr = 1e-8 + (lr0 - 1e-8) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * jnp.minimum(epoch / num_epochs, 1.0)))
        else:
            raise ValueError(f"unknown lr_scheduler {kind}")
        if warmup_epochs > 0:
            # linear ramp from lr/multiplier to lr over warmup_epochs
            # (reference utils/warmup_scheduler.py:10-53; shipped configs use
            # warmup_epochs=0 so this path is parity-extra)
            frac = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
            lr = lr * (1.0 + (warmup_mult - 1.0) * frac) / warmup_mult
        return lr

    return schedule


def _group_transform(group_cfg, iters_per_epoch):
    opt = group_cfg.get("optimizer", "adam")
    schedule = make_lr_schedule(group_cfg, iters_per_epoch)
    chain = []
    if group_cfg.get("clip", False):
        chain.append(optax.clip_by_global_norm(
            float(group_cfg.get("clip_amount", 1.0))))
    if opt == "adam":
        # reference betas (0.9, 0.99), eps 1e-8 (utils/__init__.py:62-67)
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8))
    elif opt == "sgd":
        m = float(group_cfg.get("momentum", 0.0))
        if m > 0:
            chain.append(optax.trace(decay=m))
    elif opt == "rmsprop":
        chain.append(optax.scale_by_rms(
            decay=float(group_cfg.get("alpha", 0.99)), eps=1e-8))
    else:
        raise ValueError(f"unknown optimizer {opt}")
    wd = float(group_cfg.get("weight_decay", 0.0))
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.scale_by_schedule(lambda it: -schedule(it)))
    return optax.chain(*chain)


def build_optimizer(optimizers_cfg: Dict, group_labels, iters_per_epoch):
    """Build optax.multi_transform over the model's param-group labels.

    Any label without a config entry falls back to a zero transform (frozen).
    """
    transforms = {
        name: _group_transform(cfg, iters_per_epoch)
        for name, cfg in optimizers_cfg.items()
    }
    labels_present = set(jax.tree.leaves(group_labels))
    for label in labels_present:
        if label not in transforms:
            transforms[label] = optax.set_to_zero()
    return optax.multi_transform(transforms, group_labels)


def apply_weight_init(params, cfg, key):
    """weight_init_dict (reference utils/__init__.py:19-45): none /
    uniform / xavier / kaiming re-initialization of every linear `w` leaf."""
    kind = (cfg or {}).get("type", "none")
    if kind in (None, "none"):
        return params
    counter = [0]

    def reinit(path_leaf):
        def walk(node):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if k == "w" and hasattr(v, "shape") and v.ndim == 2:
                        counter[0] += 1
                        sub = jax.random.fold_in(key, counter[0])
                        fan_in, fan_out = v.shape
                        if kind == "uniform":
                            a = float(cfg.get("a", 0.1))
                            out[k] = jax.random.uniform(
                                sub, v.shape, v.dtype, -a, a)
                        elif kind == "xavier":
                            s = (6.0 / (fan_in + fan_out)) ** 0.5
                            out[k] = jax.random.uniform(
                                sub, v.shape, v.dtype, -s, s)
                        elif kind == "kaiming":
                            s = (2.0 / fan_in) ** 0.5
                            out[k] = jax.random.normal(
                                sub, v.shape, v.dtype) * s
                        else:
                            out[k] = v
                    else:
                        out[k] = walk(v)
                return out
            return node

        return walk(path_leaf)

    return reinit(params)


def reset_groups_in_state(opt_state, params, optimizer):
    """Fresh optimizer state — reference resets Adam moments at every
    upsample iteration (reset_opt_list; nlf/__init__.py:529-578). Grid
    shapes change at the same boundaries so a full re-init matches."""
    return optimizer.init(params)
