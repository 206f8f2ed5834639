"""Bisect the flash_proj_q8 remote-compile crash (tpu_compile_helper exit 1).

The q8 remat policies compile + run on CPU (tests) but the 8B bench step dies in the
remote TPU compiler (HTTP 500, helper subprocess exit 1, 3/3 attempts — not flaky).
This scales the SAME train-step structure (int8 qlora base + q8 MLP custom_vjp +
remat scan + donated f32 opt state) from tiny upward: a structural bug reproduces
at tiny scale; a compiler resource blow-up appears at some size.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/repro_q8_compile.py --size tiny
"""

import argparse
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="tiny", choices=["tiny", "small", "1b", "8b"])
    parser.add_argument("--remat", default="flash_proj_q8")
    parser.add_argument("--seq", type=int, default=None)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
    from llama_x_tpu.models import llama
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    print("backend:", jax.default_backend(), flush=True)

    shapes = {
        "tiny": dict(num_layers=2, embed_dim=256, head_dim=64, num_heads=4,
                     num_kv_heads=2, intermediate_dim=512, seq=256, batch=2),
        "small": dict(num_layers=8, embed_dim=1024, head_dim=64, num_heads=16,
                      num_kv_heads=8, intermediate_dim=2816, seq=1024, batch=2),
        "1b": dict(num_layers=16, embed_dim=2048, head_dim=64, num_heads=32,
                   num_kv_heads=8, intermediate_dim=8192, seq=2048, batch=1),
        "8b": dict(num_layers=32, embed_dim=4096, head_dim=128, num_heads=32,
                   num_kv_heads=8, intermediate_dim=14336, seq=4096, batch=1),
    }[args.size]
    seq = args.seq or shapes.pop("seq")
    shapes.pop("seq", None)
    batch = shapes.pop("batch")

    config = llama.LlamaConfig(
        vocab_size=2048, max_seq_len=seq, attn_impl="auto",
        activation_checkpointing=True, remat_policy=args.remat,
        dynamic_int8_act=True, dynamic_int8_bwd=True,
        fused_ce_chunks=4, **shapes,
    )
    L, D, F = config.num_layers, config.embed_dim, config.intermediate_dim
    NH, NKV, HD = config.num_heads, config.num_kv_heads, config.head_dim

    kit = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def qlin(fan_in, fan_out):
        int_data = jax.jit(
            lambda k: jax.random.randint(k, (L, fan_out, fan_in), -127, 128, jnp.int8)
        )(next(kit))
        s = 0.02 / (73.3 * fan_in**0.5)
        return {"int_data": int_data, "scale": jnp.full((L, fan_out), s, jnp.bfloat16)}

    def emb(shape):
        return jax.jit(
            lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(jnp.bfloat16)
        )(next(kit))

    V = config.vocab_size
    params = {
        "tok_embeddings": {"weight": emb((V, D))},
        "layers": {
            "attention_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attention": {"wq": qlin(D, NH * HD), "wk": qlin(D, NKV * HD),
                          "wv": qlin(D, NKV * HD), "wo": qlin(NH * HD, D)},
            "ffn_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "feed_forward": {"w1": qlin(D, F), "w3": qlin(D, F), "w2": qlin(F, D)},
        },
        "norm": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "output": {"kernel": emb((D, V))},
    }
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", next(kit)))
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))

    def loss_fn(p, mb):
        loss = llama.forward(p, config, mb["tokens"], labels=mb["labels"])
        return loss, jnp.sum(mb["labels"] != -100)

    tx = get_optimizer("AdamW", 1e-4)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    mb = {
        "tokens": jnp.asarray(rng.integers(1, V, (1, batch, seq)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(1, V, (1, batch, seq)).astype(np.int32)),
    }
    t0 = time.time()
    state, metrics = step(state, mb)
    loss = float(metrics["loss"])
    print(f"OK size={args.size} remat={args.remat} loss={loss:.4f} "
          f"compile+run={time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
