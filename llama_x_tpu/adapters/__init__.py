from llama_x_tpu.adapters.lora import apply_linear_adapter, trainable_mask  # noqa: F401
from llama_x_tpu.adapters.quantize import quantize_linear  # noqa: F401
