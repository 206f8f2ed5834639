from llama_x_tpu.parallel.mesh import make_mesh  # noqa: F401
from llama_x_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_specs,
    shard_params,
)
