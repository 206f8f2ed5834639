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
    # Optimizer state is created from FP32-cast params so its dtypes match the fp32
    # grads fed to tx.update every step. This keeps the state pytree dtype-stable
    # across steps, which is what lets XLA alias the donated state buffers — a dtype
    # flip after step 1 (bf16 init state vs f32 updated state) silently defeats
    # donation and blew the step time up ~50x on v5e (measured).
    return {
        "trainable": trainable,
        "frozen": frozen,
        "opt_state": tx.init(jax.tree.map(lambda p: p.astype(jnp.float32), trainable)),
        "step": jnp.zeros((), jnp.int32),
    }


def full_params(state: TrainState):
    return merge(state["trainable"], state["frozen"])


def make_train_step(
    loss_fn: Callable[[Any, Any], tuple[jnp.ndarray, jnp.ndarray]],
    tx: optax.GradientTransformation,
    skip_nonfinite: bool = False,
):
    """loss_fn(params, microbatch) -> (scalar loss, n_label_tokens).

    Returns train_step(state, batch) -> (state, metrics); every leaf of ``batch`` must
    have a leading [accum] microbatch axis (use accum=1 for no accumulation).
    Metrics: loss (mean over microbatches), grad_norm (post-accumulation, pre-clip),
    n_tokens (sum of non-pad label tokens — feeds the toks/s meter,
    ≡ train_metamathqa.py:228,247), skipped (1.0 when skip_nonfinite suppressed the
    update).

    skip_nonfinite: failure containment for long unattended runs — when the global grad
    norm is NaN/Inf (bad batch, overflow) the whole update (params AND optimizer state)
    is suppressed for that step instead of poisoning the run. The reference has no such
    guard (SURVEY §5 'failure detection: none'); on TPU a single skipped step is far
    cheaper than restoring a checkpoint.
    """

    def train_step(state: TrainState, batch):
        frozen = state["frozen"]
        accum = jax.tree.leaves(batch)[0].shape[0]

        def micro_grads(mb):
            def lfn(t):
                return loss_fn(merge(t, frozen), mb)

            return jax.value_and_grad(lfn, has_aux=True)(state["trainable"])

        if accum == 1:
            # No accumulation → no scan. A scan with a full-size fp32 grad carry defeats
            # XLA's ability to fuse the grad accumulate into the backward (measured 25x
            # slower on v5e for a 1B model); the direct path compiles to the plain
            # fused fwd+bwd.
            (loss_sum, ntok), grads = micro_grads(jax.tree.map(lambda x: x[0], batch))
        else:

            def micro(carry, mb):
                loss_sum, ntok_sum, grad_acc = carry
                (loss, ntok), grads = micro_grads(mb)
                grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
                return (loss_sum + loss, ntok_sum + ntok, grad_acc), None

            zero_grads = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state["trainable"])
            (loss_sum, ntok, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), zero_grads), batch
            )
        grads = jax.tree.map(lambda g: (g.astype(jnp.float32) / accum), grads)
        grad_norm = optax.global_norm(grads)

        # fp32 optimizer math over bf16 master weights; cast the params view to f32 so
        # every update-chain dtype matches the f32 opt state (see init_train_state).
        params_f32 = jax.tree.map(lambda p: p.astype(jnp.float32), state["trainable"])
        updates, opt_state = tx.update(grads, state["opt_state"], params_f32)
        trainable = jax.tree.map(
            lambda p, pf, u: (pf + u).astype(p.dtype), state["trainable"], params_f32, updates
        )

        skipped = jnp.zeros((), jnp.float32)
        if skip_nonfinite:
            ok = jnp.isfinite(grad_norm)
            trainable = jax.tree.map(lambda new, old: jnp.where(ok, new, old), trainable, state["trainable"])
            opt_state = jax.tree.map(lambda new, old: jnp.where(ok, new, old), opt_state, state["opt_state"])
            skipped = jnp.where(ok, 0.0, 1.0)

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
            "skipped": skipped,
        }
        return new_state, metrics

    return train_step
