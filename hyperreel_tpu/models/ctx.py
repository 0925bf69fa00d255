"""Step context threaded through every stage.

The reference mutates `cur_iter` attributes on modules via `set_iter`
(e.g. nlf/embedding/embedding.py:119-126); here the iteration is a traced
scalar so one compiled function serves the entire training segment, and
randomness flows through an explicit PRNG key (SURVEY.md §7 hard part 5).
"""

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class StepCtx:
    """it: traced int32 iteration; rng: PRNG key; training is static."""

    it: jnp.ndarray
    rng: jnp.ndarray
    training: bool = True


jax.tree_util.register_dataclass(
    StepCtx, data_fields=["it", "rng"], meta_fields=["training"]
)


def make_ctx(it=0, rng=None, training=True):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return StepCtx(it=jnp.asarray(it, jnp.int32), rng=rng, training=training)


def split_rng(ctx: StepCtx, n: int = 1):
    keys = jax.random.split(ctx.rng, n + 1)
    return replace(ctx, rng=keys[0]), keys[1:]
