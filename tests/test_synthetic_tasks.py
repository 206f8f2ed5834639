"""data/synthetic.py: the learnable counting task (speculative trained-pair corpus)
must be deterministic, correctly scored, and actually learnable by a tiny model."""

import numpy as np

from llama_x_tpu.data.synthetic import (
    counting_accuracy,
    counting_prompt,
    counting_samples,
    counting_text,
    counting_tokens,
)
from llama_x_tpu.data.tokenizers import get_tokenizer


def test_counting_text_carries():
    s = counting_text(98, 20)
    assert s.startswith("98,99,100,101,")
    assert len(s) == 20


def test_counting_accuracy_scores_true_continuation():
    p = counting_prompt(np.random.default_rng(0), 24)
    start = int(p.split(",")[0])
    full = counting_text(start, 200)
    true_cont = full[24:100]
    assert counting_accuracy(p, true_cont) == 1.0
    assert counting_accuracy(p, "xxxx") < 0.5
    assert counting_accuracy(p, "") == 0.0


def test_counting_tokens_roundtrip():
    tok = get_tokenizer("byte", None)
    toks = counting_tokens(3, 0, 64, tok)
    assert len(toks) == 3
    s = tok.decode([int(t) for t in toks[0] if t < 256])
    assert counting_accuracy(s[:10], s[10:]) >= 0.9  # self-consistent continuation


def test_counting_is_learnable_by_tiny_model():
    """A 2-layer model must fit the counting distribution far below the random-token
    floor within a few hundred steps (guards the task's learnability — the whole
    point vs the random smoke data)."""
    import jax
    import jax.numpy as jnp

    from llama_x_tpu.models import llama

    tok = get_tokenizer("byte", None)
    samples = counting_samples(64, 0, 96)
    rows = np.full((64, 97), -100, np.int32)
    for i, s in enumerate(samples):
        ids = tok(s, add_bos=True)
        rows[i, : len(ids)] = ids
    inputs = jnp.asarray(np.where(rows == -100, 0, rows)[:, :-1])
    labels = jnp.asarray(rows[:, 1:])

    config = llama.tiny_config(
        embed_dim=128, num_layers=2, head_dim=32, num_heads=4, num_kv_heads=2,
        intermediate_dim=256, vocab_size=259, max_seq_len=96, attn_impl="xla",
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)

    import optax

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return llama.forward(p, config, inputs, labels=labels)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    loss0 = None
    for i in range(150):
        params, opt, loss = step(params, opt)
        if loss0 is None:
            loss0 = float(loss)
    final = float(loss)
    # random bytes over a ~13-char alphabet would sit near ln(13)~2.56; learnable
    # structure must pull a tiny model well under 1.0
    assert final < 1.0, (loss0, final)
