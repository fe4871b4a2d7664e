"""Sharded training step over a (data, vocab) mesh.

The full SPMD training step for multi-chip/multi-host runs (SURVEY.md §3.3,
BASELINE config 5): batch rows sharded over ``data``, output head sharded
over ``vocab`` (the vocab-parallel CE of
:mod:`jlm_tpu.parallel.sharded_head`), LSTM/embedding replicated.  The same
program runs on any mesh shape — 1 chip, 1 host, N hosts — with XLA
compiling the collectives onto ICI/DCN.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from jlm_tpu.config import Config
from jlm_tpu.models.lstm import forward_hidden, initial_state
from jlm_tpu.parallel.mesh import DATA_AXIS
from jlm_tpu.parallel.sharded_head import (
    param_shardings,
    shard_params,
    vocab_parallel_nll,
)


def make_sharded_train_step(
    mesh: jax.sharding.Mesh,
    config: Config,
    optimizer: optax.GradientTransformation,
    precision: str = "default",
) -> Callable:
    """Returns jitted ``step(params, opt_state, state, x, y) -> (...)``.

    ``x``/``y`` are ``[B, T]`` with rows sharded over ``data``; the LSTM
    state is likewise batch-sharded.  The loss's internal ``pmean`` over
    ``data`` makes gradients global-batch means, so no separate grad
    all-reduce is needed.
    """
    loss_head = vocab_parallel_nll(mesh, config, precision)

    def loss_fn(params, state, x, y):
        hs, new_state = forward_hidden(params, config, x, state, precision)
        return loss_head(params, hs, y), new_state

    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    state_sharding = NamedSharding(mesh, P(None, DATA_AXIS))

    @jax.jit
    def step(params, opt_state, state, x, y):
        x = jax.lax.with_sharding_constraint(x, data_sharding)
        y = jax.lax.with_sharding_constraint(y, data_sharding)
        state = jax.tree.map(
            lambda s: jax.lax.with_sharding_constraint(s, state_sharding), state
        )
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, x, y
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    return step


def init_sharded_training(
    params: Any,
    config: Config,
    mesh: jax.sharding.Mesh,
    optimizer: optax.GradientTransformation,
) -> Tuple[Any, Any]:
    """Shard params per the layout and build matching sharded opt state."""
    sharded = shard_params(jax.tree.map(jnp.asarray, params), config, mesh)
    opt_state = jax.jit(
        optimizer.init,
        # opt state mirrors param shardings leaf-wise via propagation
    )(sharded)
    return sharded, opt_state
