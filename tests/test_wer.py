"""WER metric + audio-prefixed generation tests (the eval surface for BASELINE's
'LibriSpeech WER parity')."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.train.wer import edit_distance, wer


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance("the cat sat".split(), "the cat sat".split()) == 0
    assert edit_distance("the cat sat".split(), "the bat sat".split()) == 1  # sub
    assert edit_distance("the cat sat".split(), "the cat".split()) == 1  # del
    assert edit_distance("the cat sat".split(), "the big cat sat".split()) == 1  # ins


def test_corpus_wer():
    refs = ["the cat sat on the mat", "hello world"]
    hyps = ["the cat sat on a mat", "hello word"]
    assert abs(wer(refs, hyps) - 2 / 8) < 1e-9
    assert wer(refs, refs) == 0.0


def test_generate_with_prefix_embeds_matches_full_forward():
    """Greedy decode with a modality prefix ≡ re-running the full forward (prefix
    concatenated at embedding level) each step."""
    config = llama.tiny_config(max_seq_len=96)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((1, 8, config.embed_dim)).astype(np.float32) * 0.1)
    prompt = jnp.asarray(rng.integers(0, config.vocab_size, (1, 4)), jnp.int32)

    got = generate(
        params, config, prompt, max_new_tokens=5, cache_dtype=jnp.float32, prefix_embeds=prefix
    )

    # oracle: full causal forward over [prefix; embed(prompt ++ generated)]
    from llama_x_tpu.ops.attention import MaskInfo

    toks = prompt
    want = []
    for _ in range(5):
        x = jnp.take(params["tok_embeddings"]["weight"], toks, axis=0)
        x = jnp.concatenate([prefix, x], axis=1)
        h, _ = llama.trunk(params, config, x, MaskInfo(causal=True))
        logits = llama.head(params, config, h[:, -1:, :])
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        want.append(nxt)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.stack(want, 1)))


def test_eval_script_synthetic_smoke():
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "eval_librispeech.py", "--synthetic", "2", "--max_new_tokens", "4"],
        capture_output=True, text=True, check=True, cwd=".",
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["n_utts"] == 2 and 0.0 <= rec["wer"] <= 10.0
