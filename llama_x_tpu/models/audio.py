"""Early-fusion audio-text Llama (≡ LlamaAudio, modelling/audio.py).

Whisper-style stem: log-mel (ops/audio_frontend.py) → Conv1d(n_mels→D, k3 s1 p1) → GELU
→ Conv1d(D→D, k3 s2 p1) → GELU (modelling/audio.py:26-31) — 100 mel frames/s in, 50
audio tokens/s out. Audio tokens are *prepended* to the text embeddings and share one
rope over the concatenated sequence (audio.py:63-65); after the trunk the audio
positions are sliced off so the loss covers text only (audio.py:72-74).

TPU-native extras:
- the whole frontend is inside jit (no dynamo-disable escape hatch needed, audio.py:36);
- optional **prefix-LM attention** (bidirectional over the audio prefix, causal over
  text) via MaskInfo.prefix_len — the reference README's stated plan that its code never
  implements (audio attention there is plain causal, audio.py:66-70). Default matches
  the reference (causal); set prefix_lm=True for the baseline's target behavior.
- convs run in NHC layout (feature-minor — the TPU-friendly layout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo
from llama_x_tpu.ops.audio_frontend import log_mel_cmn, mel_spectrogram


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """≡ AudioConfig (modelling/audio.py:12-17)."""

    sample_rate: int = 16_000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 128

    def num_audio_tokens(self, num_samples: int) -> int:
        """mel frames = 1 + samples//hop, last frame dropped, conv stride 2 (ceil)."""
        frames = num_samples // self.hop_length  # after [..., :-1]
        return (frames + 1) // 2


def _init_conv(key, width: int, c_in: int, c_out: int, dtype):
    """torch Conv1d default init: kaiming_uniform(a=sqrt(5)), bias U(±1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    fan_in = c_in * width
    bound = (6.0 / (6.0 * fan_in)) ** 0.5
    kernel = jax.random.uniform(k1, (width, c_in, c_out), jnp.float32, -bound, bound)
    bbound = 1.0 / fan_in**0.5
    bias = jax.random.uniform(k2, (c_out,), jnp.float32, -bbound, bbound)
    return {"kernel": kernel.astype(dtype), "bias": bias.astype(dtype)}


def init_audio_stem(key, config: llama.LlamaConfig, audio_config: AudioConfig, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _init_conv(k1, 3, audio_config.n_mels, config.embed_dim, dtype),
        "conv2": _init_conv(k2, 3, config.embed_dim, config.embed_dim, dtype),
    }


def _conv1d_nhc(x: jnp.ndarray, p: dict, stride: int) -> jnp.ndarray:
    """x [B, T, C_in], kernel [W, C_in, C_out], SAME-ish padding 1 (k=3)."""
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + p["bias"].astype(x.dtype)


def audio_embed(
    stem_params: dict,
    audio_config: AudioConfig,
    audio: jnp.ndarray,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """audio [B, T_samples] f32 → audio tokens [B, T_tokens, D].

    frontend (mel+log+CMN, fp32) → cast to embed dtype → conv stem
    (≡ modelling/audio.py:53-60).
    """
    mel = mel_spectrogram(
        audio,
        sample_rate=audio_config.sample_rate,
        n_fft=audio_config.n_fft,
        win_length=audio_config.win_length,
        hop_length=audio_config.hop_length,
        n_mels=audio_config.n_mels,
    )
    x = log_mel_cmn(mel, drop_last_frame=True, dtype=dtype)  # [B, n_mels, T]
    x = jnp.swapaxes(x, 1, 2)  # NHC
    # exact erf GELU (torch nn.GELU default) — the tanh approximation breaks
    # checkpoint parity with reference-trained stems
    x = jax.nn.gelu(_conv1d_nhc(x, stem_params["conv1"], stride=1), approximate=False)
    x = jax.nn.gelu(_conv1d_nhc(x, stem_params["conv2"], stride=2), approximate=False)
    return x  # [B, T//2, D]


def forward(
    params: dict,
    config: llama.LlamaConfig,
    audio_config: AudioConfig,
    audio: jnp.ndarray | None,
    tokens: jnp.ndarray,
    *,
    labels: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    kv_cache=None,
    input_pos=None,
    kv_len=None,
    dropout_rng=None,
):
    """≡ LlamaAudio.forward (modelling/audio.py:38-77). Returns loss/logits (+cache).

    Fusion mechanics (prepend → shared rope → strip → text-only loss) live in
    models/fusion.py, shared with the image and omni variants.
    """
    from llama_x_tpu.models import fusion

    embed_dtype = params["tok_embeddings"]["weight"].dtype
    prefix = []
    if audio is not None:
        embed_fn = lambda aa: audio_embed(params["audio_embed"], audio_config, aa, dtype=embed_dtype)  # noqa: E731
        if config.activation_checkpointing:
            embed_fn = jax.checkpoint(embed_fn)
        prefix.append(embed_fn(audio))
    return fusion.fuse_forward(
        params, config, prefix, tokens,
        labels=labels, prefix_lm=prefix_lm, kv_cache=kv_cache, input_pos=input_pos, kv_len=kv_len,
        dropout_rng=dropout_rng,
    )


class LlamaAudio:
    """Convenience wrapper (params, config, audio_config)."""

    def __init__(self, params, config: llama.LlamaConfig, audio_config: AudioConfig = AudioConfig()):
        self.params = params
        self.config = config
        self.audio_config = audio_config

    @classmethod
    def init(cls, key, config, audio_config=AudioConfig(), dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(key)
        params = llama.init(k1, config, dtype)
        params["audio_embed"] = init_audio_stem(k2, config, audio_config, dtype)
        return cls(params, config, audio_config)

    @classmethod
    def from_hf(cls, model_id_or_path: str, seed: int = 0, dtype=jnp.bfloat16, **kwargs):
        """Text weights from HF; audio stem freshly initialized
        (≡ LlamaAudio.from_hf, modelling/audio.py:79-101)."""
        from llama_x_tpu.models.hf import load_llama

        audio_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in AudioConfig.__dataclass_fields__}
        audio_config = AudioConfig(**audio_kwargs)
        params, config = load_llama(model_id_or_path, dtype=dtype, **kwargs)
        params["audio_embed"] = init_audio_stem(jax.random.PRNGKey(seed), config, audio_config, dtype)
        return cls(params, config, audio_config)

    def __call__(self, audio, tokens, **kw):
        return forward(self.params, self.config, self.audio_config, audio, tokens, **kw)
