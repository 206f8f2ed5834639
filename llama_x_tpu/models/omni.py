"""Mixed audio + image + text early-fusion prefix-LM (BASELINE config 5).

The union of the audio path (modelling/audio.py, rebuilt in models/audio.py) and the
Fuyu-style image path (models/vision.py): both modality stems emit token embeddings
that are prepended — audio first, then image, then text — with one rope over the whole
sequence and loss on the text positions only. Either modality may be absent per batch
(pass None); the attention prefix covers every modality token when prefix_lm=True.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama_x_tpu.models import fusion, llama
from llama_x_tpu.models.audio import AudioConfig, audio_embed, init_audio_stem
from llama_x_tpu.models.vision import VisionConfig, init_patch_embed, patch_embed


def forward(
    params: dict,
    config: llama.LlamaConfig,
    audio_config: AudioConfig,
    vision_config: VisionConfig,
    audio: jnp.ndarray | None,
    images: jnp.ndarray | None,
    tokens: jnp.ndarray,
    *,
    labels: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    kv_cache=None,
    input_pos=None,
    kv_len=None,
    dropout_rng=None,
):
    embed_dtype = params["tok_embeddings"]["weight"].dtype
    prefix = []
    if audio is not None:
        fn = lambda a: audio_embed(params["audio_embed"], audio_config, a, dtype=embed_dtype)  # noqa: E731
        if config.activation_checkpointing:
            fn = jax.checkpoint(fn)
        prefix.append(fn(audio))
    if images is not None:
        fn = lambda im: patch_embed(params["patch_embed"], vision_config, im, dtype=embed_dtype)  # noqa: E731
        if config.activation_checkpointing:
            fn = jax.checkpoint(fn)
        prefix.append(fn(images))
    return fusion.fuse_forward(
        params, config, prefix, tokens,
        labels=labels, prefix_lm=prefix_lm, kv_cache=kv_cache, input_pos=input_pos, kv_len=kv_len,
        dropout_rng=dropout_rng,
    )


class LlamaOmni:
    """Audio + image + text early-fusion model (BASELINE config 5)."""

    def __init__(
        self,
        params,
        config: llama.LlamaConfig,
        audio_config: AudioConfig = AudioConfig(),
        vision_config: VisionConfig = VisionConfig(),
    ):
        self.params = params
        self.config = config
        self.audio_config = audio_config
        self.vision_config = vision_config

    @classmethod
    def init(cls, key, config, audio_config=AudioConfig(), vision_config=VisionConfig(), dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(key, 3)
        params = llama.init(k1, config, dtype)
        params["audio_embed"] = init_audio_stem(k2, config, audio_config, dtype)
        params["patch_embed"] = init_patch_embed(k3, config, vision_config, dtype)
        return cls(params, config, audio_config, vision_config)

    @classmethod
    def from_hf(cls, model_id_or_path: str, seed: int = 0, dtype=jnp.bfloat16, **kwargs):
        from llama_x_tpu.models.hf import load_llama

        audio_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in AudioConfig.__dataclass_fields__}
        vis_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in VisionConfig.__dataclass_fields__}
        params, config = load_llama(model_id_or_path, dtype=dtype, **kwargs)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        audio_config = AudioConfig(**audio_kwargs)
        vision_config = VisionConfig(**vis_kwargs)
        params["audio_embed"] = init_audio_stem(k1, config, audio_config, dtype)
        params["patch_embed"] = init_patch_embed(k2, config, vision_config, dtype)
        return cls(params, config, audio_config, vision_config)

    def __call__(self, audio, images, tokens, **kw):
        return forward(
            self.params, self.config, self.audio_config, self.vision_config, audio, images, tokens, **kw
        )
