"""Per-leaf sharding rules: param-tree path → PartitionSpec over the (dp, fsdp, tp) mesh.

Megatron-style TP over attention heads and FFN hidden dim; FSDP (ZeRO-3) sharding of the
remaining big weight dimension; batch over (dp, fsdp). Declared once here; jit + GSPMD
insert the collectives. Rules are matched on the '/'-joined leaf path (utils/tree.py
naming), most-specific-first.

Layout recap (stacked layer axis L leads every layers/ leaf):
  tok_embeddings/weight      [V, D]        → (tp, fsdp)   vocab-parallel embedding
  layers/attention/w{q,k,v}  [L, D, H*hd]  → (None, fsdp, tp)   column-parallel
  layers/attention/wo        [L, H*hd, D]  → (None, tp, fsdp)   row-parallel
  layers/feed_forward/w{1,3} [L, D, F]     → (None, fsdp, tp)
  layers/feed_forward/w2     [L, F, D]     → (None, tp, fsdp)
  output/kernel              [D, V]        → (fsdp, tp)    vocab-parallel head
  norms                      [.., D]       → replicated
  int8: int_data [.., out, in] → out follows the fp kernel's tp/fsdp placement
  LoRA: lora_a follows the kernel's input dim, lora_b the output dim; rank replicated
  audio stem convs: replicated (tiny)
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama_x_tpu.utils.tree import named_leaves

# (path regex, spec builder). Specs written for the *unstacked* trailing dims; a leading
# layer axis is handled by prepending None when the leaf has one extra dim.
_RULES: list[tuple[str, P]] = [
    (r"tok_embeddings/weight$", P("tp", "fsdp")),
    (r"(attention/w[qkv]|feed_forward/w[13])/kernel$", P("fsdp", "tp")),
    (r"(attention/wo|feed_forward/w2)/kernel$", P("tp", "fsdp")),
    # int8: int_data is [out, in] = kernel transposed → swap the kernel spec
    (r"(attention/w[qkv]|feed_forward/w[13])/int_data$", P("tp", "fsdp")),
    (r"(attention/wo|feed_forward/w2)/int_data$", P("fsdp", "tp")),
    (r"(attention/w[qkv]|feed_forward/w[13])/scale$", P("tp")),
    (r"(attention/wo|feed_forward/w2)/scale$", P("fsdp")),
    # LoRA: a maps input dim (shard like kernel dim 0), b maps output dim
    (r"(attention/w[qkv]|feed_forward/w[13])/lora_a$", P("fsdp", None)),
    (r"(attention/w[qkv]|feed_forward/w[13])/lora_b$", P(None, "tp")),
    (r"(attention/wo|feed_forward/w2)/lora_a$", P("tp", None)),
    (r"(attention/wo|feed_forward/w2)/lora_b$", P(None, "fsdp")),
    (r"/m$", P("tp")),
    (r"output/kernel$", P("fsdp", "tp")),
]


def _spec_for(name: str, ndim: int, pp: bool = False) -> P:
    """pp=True: the stacked layer (leading) axis of layers/ leaves is sharded over the
    "pp" mesh axis — stage s holds layers [s·L/P, (s+1)·L/P), matching
    parallel/pipeline.py's layer_spec so pipeline_loss starts from aligned placement."""
    layer_axis = "pp" if (pp and name.startswith("layers/")) else None
    for pattern, spec in _RULES:
        if re.search(pattern, name):
            extra = ndim - len(spec)
            if extra > 0:  # stacked layer axis (+ any other leading axes)
                spec = P(layer_axis, *([None] * (extra - 1)), *spec)
            return spec
    if pp and name.startswith("layers/") and ndim > 0:
        return P(layer_axis)  # stacked norms etc.
    return P()  # replicate (norms, biases, lora_scale, audio stem, scalars)


def param_specs(params, pp: bool = False) -> dict:
    """Tree of PartitionSpec matching the params tree."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    names = [n for n, _ in named_leaves(params)]
    specs = [_spec_for(n, getattr(l, "ndim", 0), pp=pp) for n, l in zip(names, flat)]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place the param tree on the mesh according to the rules."""
    specs = param_specs(params, pp="pp" in mesh.shape and mesh.shape["pp"] > 1)
    return jax.tree.map(lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_sharding(mesh: Mesh, with_accum_axis: bool = True) -> NamedSharding:
    """Batch leaves are [accum, mb, ...] (trainer contract): shard the microbatch dim
    over (dp, fsdp), replicate the accum axis (it is scanned sequentially)."""
    spec = P(None, ("dp", "fsdp")) if with_accum_axis else P(("dp", "fsdp"))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
