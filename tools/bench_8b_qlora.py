"""BASELINE config 4 at full scale: Llama-3.1-8B-geometry QLoRA training (int8 frozen
base + LoRA) on ONE 16 GB v5e chip. Weights are generated on-device (the tunneled
host->device path runs at ~5 MB/s; shipping 8 GB of int8 would take ~25 min).
Measured: 264 ms/step at seq 1024 -> ~3.9k tok/s/chip, 21M trainable / 8.03B frozen.
"""
import time, jax, jax.numpy as jnp, numpy as np
from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
from llama_x_tpu.models import llama
from llama_x_tpu.train.optim import get_optimizer
from llama_x_tpu.train.trainer import init_train_state, make_train_step

config = llama.LlamaConfig(embed_dim=4096, num_layers=32, head_dim=128, num_heads=32,
    num_kv_heads=8, intermediate_dim=14336, max_seq_len=1024, vocab_size=128_256,
    rope_base=500000.0, is_llama3_1=True, activation_checkpointing=True,
    remat_policy="dots_flash", fused_ce_chunks=8, attn_impl="auto")
t0=time.time()
rng = np.random.default_rng(0)
L, D, HD, NH, NKV, F, V = 32, 4096, 128, 32, 8, 14336, 128_256
def qlin(fan_in, fan_out):
    return {"int_data": jnp.asarray(rng.integers(-127, 128, (L, fan_out, fan_in), dtype=np.int8)),
            "scale": jnp.asarray(np.full((L, fan_out), 0.01, np.float32), jnp.bfloat16)}
params = {
    "tok_embeddings": {"weight": jnp.asarray(rng.standard_normal((V, D)).astype(np.float32)*0.02, jnp.bfloat16)},
    "layers": {
        "attention_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
        "attention": {"wq": qlin(D, NH*HD), "wk": qlin(D, NKV*HD), "wv": qlin(D, NKV*HD), "wo": qlin(NH*HD, D)},
        "ffn_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
        "feed_forward": {"w1": qlin(D, F), "w3": qlin(D, F), "w2": qlin(F, D)},
    },
    "norm": {"scale": jnp.ones((D,), jnp.bfloat16)},
    "output": {"kernel": jnp.asarray(rng.standard_normal((D, V)).astype(np.float32)*0.02, jnp.bfloat16)},
}
params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(1)))
mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))
print("build 8B int8 tree:", time.time()-t0, "s", flush=True)
from llama_x_tpu.utils.tree import trainable_param_count
nt, nf = trainable_param_count(params, mask)
print(f"trainable {nt/1e6:.1f}M frozen {nf/1e9:.2f}B", flush=True)
tx = get_optimizer("AdamW", 1e-4)
def loss_fn(p, mb):
    return llama.forward(p, config, mb["tokens"], labels=mb["labels"]), jnp.sum(mb["labels"] != -100)
state = init_train_state(params, mask, tx)
step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))
batch = {"tokens": jnp.asarray(rng.integers(1,128256,(1,1,1024)).astype(np.int32)),
         "labels": jnp.asarray(rng.integers(1,128256,(1,1,1024)).astype(np.int32))}
t0=time.time()
state, m = step(state, batch); print("step0 loss:", float(m["loss"]), "compile+first:", time.time()-t0, flush=True)
t0=time.perf_counter()
for _ in range(5): state, m = step(state, batch)
float(m["loss"])
dt=(time.perf_counter()-t0)/5
print(f"8B int8+LoRA step: {dt*1e3:.1f} ms -> {1024/dt:.0f} tok/s/chip", flush=True)
