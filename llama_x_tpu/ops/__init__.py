from llama_x_tpu.ops.rope import build_rope, apply_rope  # noqa: F401
from llama_x_tpu.ops.norms import rms_norm  # noqa: F401
from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention  # noqa: F401
from llama_x_tpu.ops.cross_entropy import cross_entropy_loss  # noqa: F401
from llama_x_tpu.ops.linear import apply_linear  # noqa: F401
