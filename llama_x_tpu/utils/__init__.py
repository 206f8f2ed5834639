from llama_x_tpu.utils.tree import (  # noqa: F401
    merge,
    named_leaves,
    partition,
    path_mask,
    tree_size,
)
