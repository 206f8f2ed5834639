"""Ablation timing for the bench config: isolate trunk / attention / CE / frontend /
LoRA / remat contributions to the step time. Run on the real chip."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
from llama_x_tpu.models import audio as audio_mod
from llama_x_tpu.models import llama
from llama_x_tpu.models.audio import AudioConfig, LlamaAudio


def _sync(out):
    # jax.block_until_ready does NOT sync on the tunneled TPU backend — force a
    # device->host transfer of a scalar derived from the output
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=5, name=""):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1e3:9.1f} ms")
    return dt


def main():
    config = llama.LlamaConfig(
        embed_dim=2048,
        num_layers=16,
        head_dim=128,
        num_heads=16,
        num_kv_heads=8,
        intermediate_dim=5632,
        max_seq_len=4096,
        vocab_size=32_000,
        activation_checkpointing=False,
        fused_ce_chunks=0,
        attn_impl="flash",
    )
    audio_config = AudioConfig()
    model = LlamaAudio.init(jax.random.PRNGKey(0), config, audio_config, dtype=jnp.bfloat16)
    params = model.params
    rng = np.random.default_rng(0)
    B, S = 1, 4096
    tokens = jnp.asarray(rng.integers(1, config.vocab_size, (B, S)).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, config.vocab_size, (B, S)).astype(np.int32))
    x_embed = jnp.asarray(rng.standard_normal((B, S, config.embed_dim)).astype(np.float32) * 0.02, jnp.bfloat16)
    audio40 = jnp.asarray(rng.standard_normal((B, 40 * 16000)).astype(np.float32) * 0.1)

    from llama_x_tpu.ops.attention import MaskInfo

    mi = MaskInfo(causal=True)

    # 1. trunk fwd only (no remat)
    trunk_fwd = jax.jit(lambda p, x: llama.trunk(p, config, x, mi)[0])
    timeit(trunk_fwd, params, x_embed, name="trunk fwd (no remat)")

    # 2. trunk fwd+bwd (no remat)
    trunk_fb = jax.jit(jax.grad(lambda p, x: jnp.sum(llama.trunk(p, config, x, mi)[0].astype(jnp.float32) ** 2)))
    timeit(trunk_fb, params, x_embed, name="trunk fwd+bwd (no remat)")

    # 3. trunk fwd+bwd with remat
    config_r = config.replace(activation_checkpointing=True)
    trunk_fb_r = jax.jit(jax.grad(lambda p, x: jnp.sum(llama.trunk(p, config_r, x, mi)[0].astype(jnp.float32) ** 2)))
    timeit(trunk_fb_r, params, x_embed, name="trunk fwd+bwd (remat)")

    # 4. head: plain CE fwd+bwd
    head_fb = jax.jit(jax.grad(lambda p, x: llama.head(p, config, x, labels)))
    timeit(head_fb, params, x_embed, name="head CE fwd+bwd (plain)")

    # 5. head: fused chunked CE fwd+bwd
    config_c = config.replace(fused_ce_chunks=8)
    head_fb_c = jax.jit(jax.grad(lambda p, x: llama.head(p, config_c, x, labels)))
    timeit(head_fb_c, params, x_embed, name="head CE fwd+bwd (fused 8 chunks)")

    # 6. audio frontend fwd
    fe = jax.jit(lambda p, a: audio_mod.audio_embed(p["audio_embed"], audio_config, a, dtype=jnp.bfloat16))
    timeit(fe, params, audio40, name="audio frontend fwd (40s)")

    # 7. audio frontend fwd+bwd
    fe_fb = jax.jit(jax.grad(lambda p, a: jnp.sum(audio_mod.audio_embed(p["audio_embed"], audio_config, a, dtype=jnp.bfloat16).astype(jnp.float32) ** 2)))
    timeit(fe_fb, params, audio40, name="audio frontend fwd+bwd (40s)")

    # 8. full loss fwd+bwd, no remat, no lora, plain CE
    def loss_plain(p):
        return audio_mod.forward(p, config, audio_config, audio40, tokens[:, : S - 2000], labels=labels[:, : S - 2000], prefix_lm=True)

    timeit(jax.jit(jax.grad(loss_plain)), params, name="FULL fwd+bwd (no remat, plain CE)")

    # 9. + remat + fused CE
    config_rc = config.replace(activation_checkpointing=True, fused_ce_chunks=8)

    def loss_rc(p):
        return audio_mod.forward(p, config_rc, audio_config, audio40, tokens[:, : S - 2000], labels=labels[:, : S - 2000], prefix_lm=True)

    timeit(jax.jit(jax.grad(loss_rc)), params, name="FULL fwd+bwd (remat + fused CE)")

    # 10. + LoRA
    params_l = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(1)))

    def loss_lora(p):
        return audio_mod.forward(p, config_rc, audio_config, audio40, tokens[:, : S - 2000], labels=labels[:, : S - 2000], prefix_lm=True)

    timeit(jax.jit(jax.grad(loss_lora)), params_l, name="FULL fwd+bwd (remat+fusedCE+LoRA)")


if __name__ == "__main__":
    main()
