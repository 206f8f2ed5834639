"""Fuyu-style image early-fusion (BASELINE config 3; the reference README's planned
"images" modality, README.md:12-16 — never implemented there, built fresh here).

Fuyu's recipe (Adept, 2023): NO vision encoder — raw image patches are linearly
projected straight into the decoder's embedding space and treated as tokens, exactly
like the reference treats mel frames through its conv stem. TPU-native choices:

- patchify is a reshape/transpose (static shapes), the projection is ONE MXU matmul
  [B·N, ps·ps·C] @ [ps·ps·C, D] — no gather, no conv lowering needed;
- images arrive as a fixed static canvas [B, H, W, C] (bucketed host-side, like the
  reference buckets audio to fixed windows) with a per-image valid-patch count for
  masking variable resolutions (padding patches get segment id 0 host-side if needed);
- a learned newline embedding is added at the end of each patch row (Fuyu's image-newline
  token) so the decoder sees 2-D structure — toggleable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from llama_x_tpu.models import fusion, llama


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224  # static canvas (square)
    patch_size: int = 14
    in_channels: int = 3
    use_newline: bool = True  # Fuyu image-newline token after each patch row

    @property
    def patches_per_side(self) -> int:
        assert self.image_size % self.patch_size == 0
        return self.image_size // self.patch_size

    def num_image_tokens(self) -> int:
        n = self.patches_per_side
        return n * n + (n if self.use_newline else 0)


def init_patch_embed(key, config: llama.LlamaConfig, vision_config: VisionConfig, dtype=jnp.bfloat16):
    vc = vision_config
    fan_in = vc.patch_size * vc.patch_size * vc.in_channels
    k1, k2, k3 = jax.random.split(key, 3)
    bound = (6.0 / (6.0 * fan_in)) ** 0.5  # kaiming-uniform(a=sqrt(5)), torch Linear default
    params = {
        "proj": {
            "kernel": jax.random.uniform(k1, (fan_in, config.embed_dim), jnp.float32, -bound, bound).astype(dtype),
            "bias": jax.random.uniform(k2, (config.embed_dim,), jnp.float32, -1 / fan_in**0.5, 1 / fan_in**0.5).astype(dtype),
        },
    }
    if vc.use_newline:
        params["newline"] = (jax.random.normal(k3, (config.embed_dim,), jnp.float32) * 0.02).astype(dtype)
    return params


def patch_embed(stem_params: dict, vision_config: VisionConfig, images: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """images [B, H, W, C] float → image tokens [B, N(+rows), D].

    Patchify by reshape (static), project with one matmul, optionally append the learned
    newline embedding after each patch row (row-major patch order, Fuyu layout).
    """
    vc = vision_config
    B, H, W, C = images.shape
    ps = vc.patch_size
    assert H % ps == 0 and W % ps == 0, (H, W, ps)
    nh, nw = H // ps, W // ps
    x = images.astype(dtype)
    x = x.reshape(B, nh, ps, nw, ps, C).transpose(0, 1, 3, 2, 4, 5)  # [B, nh, nw, ps, ps, C]
    x = x.reshape(B, nh, nw, ps * ps * C)
    tok = x @ stem_params["proj"]["kernel"].astype(dtype) + stem_params["proj"]["bias"].astype(dtype)
    if vc.use_newline:
        nl = jnp.broadcast_to(stem_params["newline"].astype(dtype), (B, nh, 1, tok.shape[-1]))
        tok = jnp.concatenate([tok, nl], axis=2)  # newline after each row
        nw = nw + 1
    return tok.reshape(B, nh * nw, -1)


def forward(
    params: dict,
    config: llama.LlamaConfig,
    vision_config: VisionConfig,
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
    """Fuyu-style early fusion: image tokens prepended to text (≡ the audio pattern,
    modelling/audio.py:63,72-73, applied to the README's planned image modality)."""
    prefix = []
    if images is not None:
        embed_dtype = params["tok_embeddings"]["weight"].dtype
        embed_fn = lambda im: patch_embed(params["patch_embed"], vision_config, im, dtype=embed_dtype)  # noqa: E731
        if config.activation_checkpointing:
            embed_fn = jax.checkpoint(embed_fn)
        prefix.append(embed_fn(images))
    return fusion.fuse_forward(
        params, config, prefix, tokens,
        labels=labels, prefix_lm=prefix_lm, kv_cache=kv_cache, input_pos=input_pos, kv_len=kv_len,
        dropout_rng=dropout_rng,
    )


class LlamaVision:
    """Convenience wrapper (params, config, vision_config) — BASELINE config 3."""

    def __init__(self, params, config: llama.LlamaConfig, vision_config: VisionConfig = VisionConfig()):
        self.params = params
        self.config = config
        self.vision_config = vision_config

    @classmethod
    def init(cls, key, config, vision_config=VisionConfig(), dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(key)
        params = llama.init(k1, config, dtype)
        params["patch_embed"] = init_patch_embed(k2, config, vision_config, dtype)
        return cls(params, config, vision_config)

    @classmethod
    def from_hf(cls, model_id_or_path: str, seed: int = 0, dtype=jnp.bfloat16, **kwargs):
        """Text weights from HF; patch-embed stem freshly initialized (mirrors
        LlamaAudio.from_hf, modelling/audio.py:79-101)."""
        from llama_x_tpu.models.hf import load_llama

        vis_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in VisionConfig.__dataclass_fields__}
        vision_config = VisionConfig(**vis_kwargs)
        params, config = load_llama(model_id_or_path, dtype=dtype, **kwargs)
        params["patch_embed"] = init_patch_embed(jax.random.PRNGKey(seed), config, vision_config, dtype)
        return cls(params, config, vision_config)

    def __call__(self, images, tokens, **kw):
        return forward(self.params, self.config, self.vision_config, images, tokens, **kw)
