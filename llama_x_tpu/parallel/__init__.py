from llama_x_tpu.parallel.mesh import current_mesh, init_distributed, make_mesh, use_mesh  # noqa: F401
from llama_x_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_specs,
    shard_params,
)


def context_parallel_attention(*args, **kwargs):  # lazy: avoids a cycle at import time
    from llama_x_tpu.parallel.context import context_parallel_attention as f

    return f(*args, **kwargs)


def ulysses_attention(*args, **kwargs):  # lazy: avoids a cycle at import time
    from llama_x_tpu.parallel.ulysses import ulysses_attention as f

    return f(*args, **kwargs)


def pipeline_loss(*args, **kwargs):  # lazy: avoids a cycle at import time
    from llama_x_tpu.parallel.pipeline import pipeline_loss as f

    return f(*args, **kwargs)
