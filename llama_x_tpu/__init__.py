"""llama-x-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
gau-nernst/llama-x — early-fusion multimodal fine-tuning of Llama-3/3.1.

This is a from-scratch idiomatic-JAX redesign, not a port. See /root/repo/SURVEY.md for the
structural analysis of the PyTorch reference and BASELINE.md for the perf targets.

Layout (mirrors SURVEY.md §7's build plan):
  ops/       Pallas kernels + XLA reference implementations (rope, rmsnorm, attention,
             int8 GEMM, audio frontend, cross-entropy)
  models/    functional model definitions (Llama, LlamaAudio, LlamaVision), HF import,
             generation (jitted scan decode)
  adapters/  LoRA / DoRA as param-tree transforms
  parallel/  Mesh construction, sharding rules (DP/FSDP/TP/SP), ring-attention CP
  data/      tokenizers, MetaMathQA + LibriSpeech pipelines
  train/     optimizer registry, LR schedule, train-step factory, checkpointing, metrics
  utils/     pytree partition/merge, logging
"""

__version__ = "0.1.0"

from llama_x_tpu.models.llama import Llama, LlamaConfig  # noqa: F401
