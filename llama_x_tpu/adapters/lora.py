"""LoRA / DoRA as pure param-tree transforms.

The reference swaps nn.Linear.__class__ in place and freezes the base weight
(modelling/lora.py:8-44); here the adapter is *data added to the tree* and freezing is a
boolean mask consumed by the trainer (no mutable module state). Applied to the layers
subtree only — embeddings and LM head stay untouched, matching the call sites
(train_metamathqa.py:179 applies to model.layers; the TODO at :180 notes the head is
handled separately).

Math (modelling/lora.py:19-62):
- lora_a ~ kaiming_normal(a=sqrt(5)) over fan_in, lora_b = 0, scale = alpha/rank
- forward delta: x @ A @ B * scale (zero at init => adapted model == base model)
- DoRA adds m = ||W||_2 per out-feature; output rescaled by m / ||W + BA s||_col with
  the delta detached inside the norm (see ops/linear.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_linear(node) -> bool:
    return isinstance(node, dict) and ("kernel" in node or "int_data" in node)


def _map_linears(tree, fn, path=()):
    """Apply fn to every linear param-dict in the tree (returns a new tree)."""
    if _is_linear(tree):
        return fn(tree, "/".join(path))
    if isinstance(tree, dict):
        return {k: _map_linears(v, fn, path + (k,)) for k, v in tree.items()}
    return tree


def _base_kernel_in_out(lin: dict) -> tuple[int, int]:
    if "kernel" in lin:
        return lin["kernel"].shape[-2], lin["kernel"].shape[-1]
    # int_data is [..., out, in]
    return lin["int_data"].shape[-1], lin["int_data"].shape[-2]


def _dequant_stacked(lin: dict) -> jnp.ndarray:
    """Base weight(s) as float [..., in, out]."""
    if "kernel" in lin:
        return lin["kernel"].astype(jnp.float32)
    w = lin["int_data"].astype(jnp.float32) * lin["scale"].astype(jnp.float32)[..., None]
    return jnp.swapaxes(w, -1, -2)


def apply_linear_adapter(
    layers_params: dict,
    adapter: str | None,
    key: jax.Array,
    rank: int = 8,
    alpha: float = 8.0,
    dtype=jnp.bfloat16,
) -> dict:
    """Return a new layers subtree with lora_a/lora_b/lora_scale (+ m for dora) added to
    every linear. adapter in {None, "lora", "dora"} (≡ apply_linear_adapter_,
    modelling/lora.py:8-16). Leading stacked-layer axes are handled transparently."""
    if adapter is None:
        return layers_params
    assert adapter in ("lora", "dora"), adapter
    if rank <= 0:
        return layers_params

    keys = iter(jax.random.split(key, 64))

    def add_adapter(lin: dict, path: str) -> dict:
        fan_in, fan_out = _base_kernel_in_out(lin)
        lead = lin["kernel"].shape[:-2] if "kernel" in lin else lin["int_data"].shape[:-2]
        # kaiming_normal(a=sqrt(5)): gain = sqrt(2/(1+5)), std = gain/sqrt(fan_in)
        std = (2.0 / 6.0) ** 0.5 / fan_in**0.5
        a = jax.random.normal(next(keys), (*lead, fan_in, rank), jnp.float32) * std
        new = dict(lin)
        new["lora_a"] = a.astype(dtype)
        new["lora_b"] = jnp.zeros((*lead, rank, fan_out), dtype)
        # shaped like the leading (stacked-layer) axes so lax.scan can slice it
        new["lora_scale"] = jnp.full(lead, alpha / rank, jnp.float32)
        if adapter == "dora":
            # m initialized to the column norms of the base weight (modelling/lora.py:51)
            w = _dequant_stacked(lin)  # [..., in, out]
            new["m"] = jnp.linalg.norm(w, axis=-2).astype(dtype)  # [..., out]
        return new

    return _map_linears(layers_params, add_adapter)


# ---------------------------------------------------------------------------
# freezing
# ---------------------------------------------------------------------------

_ADAPTER_TRAINABLE = ("lora_a", "lora_b", "m")


def trainable_mask(params: dict, freeze_prefixes: tuple[str, ...] = ()) -> dict:
    """Boolean pytree: which leaves get gradients/optimizer state.

    Rules (replicating the reference's composed requires_grad semantics):
    - int8 leaves (int_data int dtype) and their scale: frozen (quantized base is frozen
      by construction, subclasses/int8.py:123-130)
    - lora_scale: constant, frozen; lora_a/lora_b/m: trainable
    - kernel/bias inside a linear that has an adapter: frozen (modelling/lora.py:21-23)
    - any leaf whose '/'-path starts with a freeze_prefix: frozen
      (≡ freeze_params, train_utils.py:6-17)
    - everything else: trainable
    """

    def walk(node, path):
        if isinstance(node, dict):
            is_lin = _is_linear(node)
            has_adapter = is_lin and "lora_a" in node
            out = {}
            for k, v in node.items():
                p = path + (k,)
                name = "/".join(p)
                if isinstance(v, dict):
                    out[k] = walk(v, p)
                    continue
                frozen = False
                if any(name == pre or name.startswith(pre + "/") or name.startswith(pre + ".") for pre in freeze_prefixes):
                    frozen = True
                elif k in ("int_data",):
                    frozen = True
                elif is_lin and k == "scale" and "int_data" in node:
                    frozen = True
                elif k == "lora_scale":
                    frozen = True
                elif k in _ADAPTER_TRAINABLE:
                    frozen = False
                elif has_adapter and k in ("kernel", "bias"):
                    frozen = True
                out[k] = not frozen
            return out
        return True

    return walk(params, ())
