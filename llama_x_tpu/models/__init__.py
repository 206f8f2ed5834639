from llama_x_tpu.models.llama import Llama, LlamaConfig, tiny_config  # noqa: F401
from llama_x_tpu.models.audio import AudioConfig, LlamaAudio  # noqa: F401
from llama_x_tpu.models.vision import LlamaVision, VisionConfig  # noqa: F401
from llama_x_tpu.models.omni import LlamaOmni  # noqa: F401
from llama_x_tpu.models.generate import generate  # noqa: F401
