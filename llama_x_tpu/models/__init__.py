from llama_x_tpu.models.llama import Llama, LlamaConfig, tiny_config  # noqa: F401
