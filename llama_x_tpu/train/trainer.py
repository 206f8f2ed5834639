"""Train-step factory: one jitted function = forward + backward + accumulate + clip +
optimizer update (the reference's hot loop train_metamathqa.py:217-254, minus Python).

Gradient accumulation is a ``lax.scan`` over a leading microbatch axis *inside* the
jitted step — the TPU-native replacement for the reference's Python accumulate loop
(train_metamathqa.py:218-228): one dispatch per optimizer step, constant memory in the
number of microbatches.

Freezing: params are partitioned by the trainable mask; only the trainable subtree is
differentiated and carried in the optimizer. Frozen params ride along untouched (no
zero-grad buffers, no masked updates).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from llama_x_tpu.utils.tree import merge, partition

TrainState = dict[str, Any]  # {"trainable", "frozen", "opt_state", "step"}


def init_train_state(params, mask, tx: optax.GradientTransformation) -> TrainState:
    trainable, frozen = partition(params, mask)
    return {
        "trainable": trainable,
        "frozen": frozen,
        "opt_state": tx.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def full_params(state: TrainState):
    return merge(state["trainable"], state["frozen"])


def make_train_step(
    loss_fn: Callable[[Any, Any], tuple[jnp.ndarray, jnp.ndarray]],
    tx: optax.GradientTransformation,
):
    """loss_fn(params, microbatch) -> (scalar loss, n_label_tokens).

    Returns train_step(state, batch) -> (state, metrics); every leaf of ``batch`` must
    have a leading [accum] microbatch axis (use accum=1 for no accumulation).
    Metrics: loss (mean over microbatches), grad_norm (post-accumulation, pre-clip),
    n_tokens (sum of non-pad label tokens — feeds the toks/s meter,
    ≡ train_metamathqa.py:228,247).
    """

    def train_step(state: TrainState, batch):
        frozen = state["frozen"]
        accum = jax.tree.leaves(batch)[0].shape[0]

        def micro(carry, mb):
            loss_sum, ntok_sum, grad_acc = carry

            def lfn(t):
                return loss_fn(merge(t, frozen), mb)

            (loss, ntok), grads = jax.value_and_grad(lfn, has_aux=True)(state["trainable"])
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            return (loss_sum + loss, ntok_sum + ntok, grad_acc), None

        zero_grads = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state["trainable"])
        (loss_sum, ntok, grads), _ = jax.lax.scan(
            micro, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), zero_grads), batch
        )
        grads = jax.tree.map(lambda g: (g / accum).astype(jnp.float32), grads)
        grad_norm = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state["opt_state"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        trainable = jax.tree.map(lambda new, old: new.astype(old.dtype), trainable, state["trainable"])

        new_state = {
            "trainable": trainable,
            "frozen": frozen,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics = {
            "loss": loss_sum / accum,
            "grad_norm": grad_norm,
            "n_tokens": ntok,
        }
        return new_state, metrics

    return train_step
