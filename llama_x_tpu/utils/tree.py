"""Pytree partition/merge utilities.

These replace the reference's requires_grad_-based freezing (train_utils.py:6-17) and
module-surgery composition: a boolean mask over the param tree splits it into a
*trainable* subtree (differentiated, optimized) and a *frozen* subtree (closed over),
so frozen params never even get gradients computed.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def named_leaves(tree: Any) -> list[tuple[str, Any]]:
    """[("layers/attention/wq/kernel", leaf), ...] with '/'-joined dict-key paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(
            p.key if isinstance(p, jax.tree_util.DictKey) else str(getattr(p, "idx", p))
            for p in path
        )
        out.append((name, leaf))
    return out


def path_mask(tree: Any, predicate: Callable[[str, Any], bool]) -> Any:
    """Boolean pytree: predicate(path_name, leaf) per leaf."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    mask_leaves = []
    for path, leaf in flat:
        name = "/".join(
            p.key if isinstance(p, jax.tree_util.DictKey) else str(getattr(p, "idx", p))
            for p in path
        )
        mask_leaves.append(bool(predicate(name, leaf)))
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def partition(tree: Any, mask: Any) -> tuple[Any, Any]:
    """Split tree into (selected, rest) by boolean mask tree; non-selected slots are None."""
    sel = jax.tree.map(lambda m, x: x if m else None, mask, tree)
    rest = jax.tree.map(lambda m, x: None if m else x, mask, tree)
    return sel, rest


def merge(a: Any, b: Any) -> Any:
    """Inverse of partition: take the non-None leaf from either side."""
    return jax.tree.map(
        lambda x, y: x if x is not None else y, a, b, is_leaf=lambda x: x is None
    )


def tree_size(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if hasattr(x, "size"))


def trainable_param_count(params: Any, mask: Any) -> tuple[int, int]:
    """(trainable, frozen) param counts (≡ print_model_stats, train_utils.py:32-35)."""
    trainable = 0
    frozen = 0
    for m, x in zip(jax.tree.leaves(mask), jax.tree.leaves(params)):
        if m:
            trainable += x.size
        else:
            frozen += x.size
    return trainable, frozen
