"""Fuyu-style image early-fusion + omni (audio+image+text) model tests
(BASELINE configs 3 and 5 — the reference README's planned-but-unbuilt modality)."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.omni import LlamaOmni
from llama_x_tpu.models.vision import LlamaVision, VisionConfig, patch_embed


def _cfg():
    return llama.tiny_config(max_seq_len=512)


def test_patch_embed_shapes_and_linearity(rng):
    vc = VisionConfig(image_size=28, patch_size=14, use_newline=False)
    config = _cfg()
    model = LlamaVision.init(jax.random.PRNGKey(0), config, vc, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
    tok = patch_embed(model.params["patch_embed"], vc, img, dtype=jnp.float32)
    assert tok.shape == (2, 4, config.embed_dim)
    # linearity: projection of patches is linear in the input (no newline)
    tok2 = patch_embed(model.params["patch_embed"], vc, 2.0 * img, dtype=jnp.float32)
    bias = model.params["patch_embed"]["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(tok2 - bias), np.asarray(2.0 * (tok - bias)), rtol=1e-5, atol=1e-5)


def test_patch_embed_newline_layout(rng):
    vc = VisionConfig(image_size=28, patch_size=14, use_newline=True)
    config = _cfg()
    model = LlamaVision.init(jax.random.PRNGKey(0), config, vc, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    tok = patch_embed(model.params["patch_embed"], vc, img, dtype=jnp.float32)
    assert tok.shape[1] == vc.num_image_tokens() == 6  # 2x2 patches + 2 newlines
    nl = model.params["patch_embed"]["newline"]
    np.testing.assert_allclose(np.asarray(tok[0, 2]), np.asarray(nl), rtol=1e-6)  # end of row 0
    np.testing.assert_allclose(np.asarray(tok[0, 5]), np.asarray(nl), rtol=1e-6)  # end of row 1


def test_vision_forward_loss_and_grads(rng):
    vc = VisionConfig(image_size=28, patch_size=14)
    config = _cfg()
    model = LlamaVision.init(jax.random.PRNGKey(0), config, vc, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 16)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 16)), jnp.int32)

    loss = model(img, tokens, labels=labels, prefix_lm=True)
    assert np.isfinite(float(loss))

    from llama_x_tpu.models import vision

    g = jax.grad(lambda p: vision.forward(p, config, vc, img, tokens, labels=labels, prefix_lm=True))(model.params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_vision_loss_covers_text_only(rng):
    """Changing the image must change the loss; changing only text labels too — but the
    logits length must equal the text length (modality positions stripped)."""
    vc = VisionConfig(image_size=28, patch_size=14)
    config = _cfg()
    model = LlamaVision.init(jax.random.PRNGKey(0), config, vc, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    logits = model(img, tokens)
    assert logits.shape == (1, 16, config.vocab_size)


def test_omni_audio_image_text(rng):
    vc = VisionConfig(image_size=28, patch_size=14)
    config = _cfg()
    model = LlamaOmni.init(jax.random.PRNGKey(0), config, vision_config=vc, dtype=jnp.float32)
    audio = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)  # 1 s → 50 tokens
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)

    loss_both = model(audio, img, tokens, labels=labels, prefix_lm=True)
    loss_audio_only = model(audio, None, tokens, labels=labels, prefix_lm=True)
    loss_text_only = model(None, None, tokens, labels=labels)
    for lo in (loss_both, loss_audio_only, loss_text_only):
        assert np.isfinite(float(lo))
    assert float(loss_both) != float(loss_text_only)

    logits = model(audio, img, tokens)
    assert logits.shape == (1, 16, config.vocab_size)
