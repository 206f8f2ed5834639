"""Optimizer registry + trapezoidal LR schedule.

Reference surface (train_utils.py:20-25, 38-66): {AdamW, AdamW8bit, AdamW4bit} and a
warmup → constant → linear-decay schedule parameterized by fractions of n_steps.

TPU-native notes:
- AdamW is optax; the low-bit variants quantize the *optimizer state* (m, v) to int8
  with per-block scales (the torchao low_bit_optim idea re-done as a pure optax
  GradientTransformation — state lives as int8 leaves + fp32 block scales, dequantized
  on the fly inside the fused update).
- The schedule fixes the reference quirk of returning full LR after decay ends
  (train_utils.py:58 — SURVEY §7 says don't replicate): past n_steps it stays 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def trapezoid_schedule(lr: float, n_steps: int, warmup: float = 0.0, decay: float = 0.0):
    """linear warmup to lr over warmup*n_steps → constant → linear decay to 0 over the
    last decay*n_steps (≡ LRScheduler, train_utils.py:38-58, minus the post-decay quirk)."""
    t1 = int(n_steps * warmup)
    t2 = int(n_steps * (1 - decay))
    t3 = n_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / max(t1, 1)
        dec = lr * (t3 - step) / max(t3 - t2, 1)
        out = jnp.where(step < t1, warm, jnp.where(step < t2, lr, jnp.maximum(dec, 0.0)))
        return out

    return schedule


# ---------------------------------------------------------------------------
# 8-bit / 4-bit optimizer state (blockwise low-bit m/v, AdamW math unchanged)
#
# Linear absmax int8 is far too coarse for Adam moments (huge intra-block dynamic
# range → small entries crush to zero and the trajectory drifts). bitsandbytes /
# torchao use a non-linear "dynamic tree" code; we use the same idea in closed
# form: a signed sqrt companding map q = sign(r)·round(Q·sqrt(|r|)) with r = x /
# absmax(block). This allocates code points densely near zero, which is exactly
# where the moment mass lives, and tracks fp32 AdamW to <1% on test problems.
# ---------------------------------------------------------------------------

_BLOCK = 256


def _quantize_state(x: jnp.ndarray, block: int = _BLOCK, bits: int = 8):
    """Blockwise signed-sqrt low-bit quantization of a flat fp32 state tensor.

    bits=8 → int8 code in [-127, 127]; bits=4 → two nibbles packed per int8 byte,
    each a signed code in [-7, 7] (≡ torchao low_bit_optim AdamW4bit capability,
    train_utils.py:22-24).
    """
    n = x.size
    pad = (-n) % block
    xf = jnp.pad(x.reshape(-1), (0, pad)).reshape(-1, block)
    scale = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-20, None)
    r = xf / scale
    qmax = 127.0 if bits == 8 else 7.0
    q = (jnp.sign(r) * jnp.rint(qmax * jnp.sqrt(jnp.abs(r)))).astype(jnp.int8)
    if bits == 4:
        # pack two signed nibbles per byte: low = q[0::2], high = q[1::2]
        lo = q[:, 0::2] & 0x0F
        hi = (q[:, 1::2] & 0x0F) << 4
        q = (lo | hi).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_state(q: jnp.ndarray, scale: jnp.ndarray, shape, block: int = _BLOCK, bits: int = 8):
    if bits == 4:
        # unpack signed nibbles (sign-extend via arithmetic shift of the shifted nibble)
        lo = (q.astype(jnp.int8) << 4) >> 4  # sign-extended low nibble
        hi = q.astype(jnp.int8) >> 4  # arithmetic shift sign-extends high nibble
        q = jnp.stack([lo, hi], axis=-1).reshape(q.shape[0], -1)
        qmax = 7.0
    else:
        qmax = 127.0
    r = q.astype(jnp.float32) / qmax
    x = (jnp.sign(r) * r * r * scale).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return x[:n].reshape(shape)


def adamw_quantized(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    state_bits: int = 8,
) -> optax.GradientTransformation:
    """AdamW with blockwise sqrt-companded low-bit first/second moments (≡ torchao
    low_bit_optim.AdamW8bit / AdamW4bit capability, train_utils.py:22-24)."""
    assert state_bits in (8, 4), state_bits
    bits = state_bits

    def init_fn(params):
        leaves, treedef = jax.tree.flatten(params)
        mu = [_quantize_state(jnp.zeros(p.shape, jnp.float32), bits=bits) for p in leaves]
        nu = [_quantize_state(jnp.zeros(p.shape, jnp.float32), bits=bits) for p in leaves]
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu_q": treedef.unflatten([q for q, _ in mu]),
            "mu_s": treedef.unflatten([s for _, s in mu]),
            "nu_q": treedef.unflatten([q for q, _ in nu]),
            "nu_s": treedef.unflatten([s for _, s in nu]),
        }

    def update_fn(grads, state, params):
        assert params is not None, "adamw_quantized needs params (for weight decay)"
        count = state["count"] + 1
        cf = count.astype(jnp.float32)
        # LR evaluated at the PRE-increment count (optax scale_by_schedule convention) so
        # AdamW8bit/4bit are drop-in schedule-compatible with optax.adamw; bias
        # correction uses the post-increment count, also matching optax
        lr = learning_rate(state["count"]) if callable(learning_rate) else learning_rate

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        mu_q = treedef.flatten_up_to(state["mu_q"])
        mu_s = treedef.flatten_up_to(state["mu_s"])
        nu_q = treedef.flatten_up_to(state["nu_q"])
        nu_s = treedef.flatten_up_to(state["nu_s"])

        updates, new_mu, new_nu = [], [], []
        for g, p, mq, ms, nq, ns in zip(g_leaves, p_leaves, mu_q, mu_s, nu_q, nu_s):
            g = g.astype(jnp.float32)
            mu = b1 * _dequantize_state(mq, ms, g.shape, bits=bits) + (1 - b1) * g
            nu = b2 * _dequantize_state(nq, ns, g.shape, bits=bits) + (1 - b2) * g * g
            mu_hat = mu / (1 - b1**cf)
            nu_hat = nu / (1 - b2**cf)
            step = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p.astype(jnp.float32)
            updates.append((-lr * step).astype(p.dtype))
            new_mu.append(_quantize_state(mu, bits=bits))
            new_nu.append(_quantize_state(nu, bits=bits))

        return treedef.unflatten(updates), {
            "count": count,
            "mu_q": treedef.unflatten([q for q, _ in new_mu]),
            "mu_s": treedef.unflatten([s for _, s in new_mu]),
            "nu_q": treedef.unflatten([q for q, _ in new_nu]),
            "nu_s": treedef.unflatten([s for _, s in new_nu]),
        }

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(
    name: str,
    learning_rate,
    weight_decay: float = 0.0,
    clip_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    """Registry ≡ get_optimizer_class (train_utils.py:20-25) + optional global-norm clip
    (≡ clip_grad_norm_ at train_metamathqa.py:232-235) folded into the chain."""
    if name == "AdamW":
        tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    elif name == "AdamW8bit":
        tx = adamw_quantized(learning_rate, weight_decay=weight_decay, state_bits=8)
    elif name == "AdamW4bit":
        tx = adamw_quantized(learning_rate, weight_decay=weight_decay, state_bits=4)
    else:
        raise KeyError(name)
    if clip_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx
