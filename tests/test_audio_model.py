"""LlamaAudio early-fusion model tests: shapes, loss-covers-text-only, prefix-LM mask
wiring, gradient flow into the conv stem."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.audio import AudioConfig, LlamaAudio, forward

AC = AudioConfig()


def _model(**kw):
    config = llama.tiny_config(max_seq_len=256, **kw)
    return LlamaAudio.init(jax.random.PRNGKey(0), config, AC, dtype=jnp.float32)


def test_audio_forward_shapes_and_strip():
    model = _model()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, AC.sample_rate)).astype(np.float32))  # 1 s → 50 tokens
    tokens = jnp.asarray(rng.integers(0, model.config.vocab_size, (2, 16)))

    logits = model(audio, tokens)
    # audio positions stripped → logits only over text (modelling/audio.py:72-74)
    assert logits.shape == (2, 16, model.config.vocab_size)


def test_audio_loss_and_grads_flow_to_stem():
    model = _model()
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((2, AC.sample_rate)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, model.config.vocab_size, (2, 16)))
    labels = jnp.asarray(rng.integers(0, model.config.vocab_size, (2, 16)))

    def loss_fn(p):
        return forward(p, model.config, AC, audio, tokens, labels=labels)

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    g1 = np.asarray(grads["audio_embed"]["conv1"]["kernel"])
    g2 = np.asarray(grads["audio_embed"]["conv2"]["kernel"])
    assert np.abs(g1).max() > 0 and np.abs(g2).max() > 0


def test_text_only_path_matches_llama():
    """audio=None must reduce exactly to the text model (modelling/audio.py:51)."""
    model = _model()
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, model.config.vocab_size, (2, 12)))
    a = model(None, tokens)
    b = llama.forward(model.params, model.config, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_prefix_lm_differs_from_causal_and_matches_mask_oracle():
    model = _model()
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((1, AC.sample_rate)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, model.config.vocab_size, (1, 8)))

    causal = np.asarray(model(audio, tokens))
    prefix = np.asarray(model(audio, tokens, prefix_lm=True))
    # bidirectional prefix changes audio-token attention → text logits must differ
    assert np.abs(causal - prefix).max() > 1e-5


def test_audio_checkpointing_same_loss():
    model = _model()
    model_ckpt_config = model.config.replace(activation_checkpointing=True)
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((1, AC.sample_rate)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, model.config.vocab_size, (1, 8)))
    labels = jnp.asarray(rng.integers(0, model.config.vocab_size, (1, 8)))

    l1 = float(forward(model.params, model.config, AC, audio, tokens, labels=labels))
    l2 = float(forward(model.params, model_ckpt_config, AC, audio, tokens, labels=labels))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
