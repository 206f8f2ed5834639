"""Regression tests for the code-review findings: tied embeddings, rope_scaling
parameter plumbing, attention dropout, quantized-optimizer schedule alignment,
tokenization-cache keying."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama


def test_tied_embeddings_shared_gradient():
    config = llama.tiny_config(tied_embeddings=True)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    assert "output" not in params
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (2, 16)), jnp.int32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (2, 16)), jnp.int32)
    loss = llama.forward(params, config, tokens, labels=labels)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: llama.forward(p, config, tokens, labels=labels))(params)
    # the shared matrix must receive BOTH embedding and head gradients: rows of unused
    # vocab entries still get head grads (softmax pulls every logit down)
    emb_grad = np.asarray(g["tok_embeddings"]["weight"])
    assert np.count_nonzero(np.abs(emb_grad).sum(axis=1)) > len(np.unique(np.asarray(tokens)))


def test_tied_embeddings_fused_ce():
    config = llama.tiny_config(tied_embeddings=True, fused_ce_chunks=2)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (2, 16)), jnp.int32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (2, 16)), jnp.int32)
    loss_fused = llama.forward(params, config, tokens, labels=labels)
    loss_plain = llama.forward(params, config.replace(fused_ce_chunks=0), tokens, labels=labels)
    np.testing.assert_allclose(float(loss_fused), float(loss_plain), rtol=1e-5)


def test_hf_rope_scaling_parsed(tmp_path):
    from llama_x_tpu.models.hf import load_hf_config

    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "intermediate_size": 128, "vocab_size": 256,
        "rope_theta": 500000.0,
        "rope_scaling": {
            "rope_type": "llama3", "factor": 32.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
        },
        "tie_word_embeddings": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    config = load_hf_config(str(tmp_path))
    assert config.is_llama3_1 and config.rope_scale_factor == 32.0
    assert config.tied_embeddings
    assert config.rope_base == 500000.0


def test_rope_scale_factor_changes_table():
    from llama_x_tpu.ops.rope import build_rope

    r8 = np.asarray(build_rope(64, 32, 500000.0, True, scale_factor=8.0))
    r32 = np.asarray(build_rope(64, 32, 500000.0, True, scale_factor=32.0))
    assert not np.allclose(r8, r32)


def test_attention_dropout_applied():
    from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 16, 2, 8)).astype(np.float32))
    out_nd = dot_product_attention(q, q, q, MaskInfo(causal=True))
    out_d = dot_product_attention(
        q, q, q, MaskInfo(causal=True), dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(0)
    )
    assert not np.allclose(np.asarray(out_nd), np.asarray(out_d))

    # model-level: dropout_rng changes the training loss, no rng matches eval
    config = llama.tiny_config(attn_dropout=0.5, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    l_eval = llama.forward(params, config, tokens, labels=labels)
    l_drop = llama.forward(params, config, tokens, labels=labels, dropout_rng=jax.random.PRNGKey(1))
    l_drop2 = llama.forward(params, config, tokens, labels=labels, dropout_rng=jax.random.PRNGKey(2))
    assert float(l_eval) != float(l_drop)
    assert float(l_drop) != float(l_drop2)


def test_quantized_adamw_schedule_matches_optax():
    """AdamW8bit must consume the schedule at the same step index as optax.adamw."""
    import optax

    from llama_x_tpu.train.optim import adamw_quantized

    seen = {"optax": [], "quant": []}

    def mk_sched(tag):
        def sched(count):
            seen[tag].append(int(count))
            return 1e-3

        return sched

    p = {"w": jnp.ones((8, 8))}
    g = {"w": jnp.ones((8, 8))}
    for tag, tx in (("optax", optax.adamw(mk_sched("optax"))), ("quant", adamw_quantized(mk_sched("quant")))):
        state = tx.init(p)
        for _ in range(3):
            updates, state = tx.update(g, state, p)
    assert seen["optax"] == seen["quant"], seen


def test_tokenize_cache_key_includes_seq_len(tmp_path):
    from llama_x_tpu.data.metamathqa import tokenize_metamathqa

    class FakeTok:
        def __call__(self, text, add_bos=False, add_eos=False):
            return list(range(40))

    # seed the cache for max_seq_len=8 by monkeypatching the dataset loader path:
    # write caches directly and confirm different lengths produce different files
    import numpy as np_

    for msl in (8, 16):
        flat = np_.arange(msl + 1, dtype=np_.int32)
        offsets = np_.asarray([0, msl + 1], np_.int64)
        np_.savez(tmp_path / f"metamathqa_fake_s{msl}.npz", flat=flat, offsets=offsets)
        out = tokenize_metamathqa(FakeTok(), "fake", msl, cache_dir=str(tmp_path))
        assert len(out[0]) == msl + 1  # each cache honors its own truncation length
