"""Exponential moving average of model state as a pure pytree transform.

Counterpart of the reference's ModelEMA (utils/model_utils.py:153-202) which
deep-copies the model and mutates its state_dict per step. Here EMA is just a
second pytree updated inside the jitted train step:

    decay(t) = base_decay * (1 - exp(-t / 2000))
    ema      = decay * ema + (1 - decay) * value

Both params and batch_stats are averaged (the reference EMAs the full
state_dict including BN buffers). Evaluating with EMA weights is simply
applying the model with the EMA pytree — no deepcopy-per-validation-step
like the reference (det_trainer.py:65, base_trainer.py:126-133).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    updates: jnp.ndarray   # int32 step count
    tree: Any              # averaged {params, batch_stats}


def ema_init(tree) -> EMAState:
    # copy=True: the EMA must own distinct buffers, otherwise donating a
    # TrainState donates the same buffer twice (params and ema alias).
    return EMAState(
        updates=jnp.zeros((), jnp.int32),
        tree=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree),
    )


def ema_update(state: EMAState, tree, base_decay: float = 0.9999) -> EMAState:
    updates = state.updates + 1
    d = base_decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    new_tree = jax.tree_util.tree_map(
        lambda e, v: d * e + (1.0 - d) * v.astype(e.dtype), state.tree, tree
    )
    return EMAState(updates=updates, tree=new_tree)
