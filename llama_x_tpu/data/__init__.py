from llama_x_tpu.data.tokenizers import get_tokenizer  # noqa: F401
