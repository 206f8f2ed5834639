"""Pipeline parallelism: GPipe schedule over a pp mesh axis must match the
single-device fused-loss forward exactly (loss and gradients) on the 8-device CPU sim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llama_x_tpu.models import llama
from llama_x_tpu.parallel.pipeline import pipeline_loss

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 sim devices")


def _mesh_pp(n):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("pp",))


def _setup(num_layers=8, B=4, S=32, tied=False):
    config = llama.tiny_config(num_layers=num_layers, max_seq_len=64, attn_impl="xla", tied_embeddings=tied)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)), jnp.int32)
    labels = labels.at[:, -3:].set(-100)  # some ignored positions
    return config, params, tokens, labels


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (8, 2), (2, 4)])
def test_pipeline_loss_matches_single_device(n_stages, n_micro):
    config, params, tokens, labels = _setup()
    want = float(llama.forward(params, config, tokens, labels=labels))
    got = float(pipeline_loss(params, config, tokens, labels, _mesh_pp(n_stages), n_micro))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pipeline_grads_match_single_device():
    config, params, tokens, labels = _setup(num_layers=4, B=4, S=16)
    mesh = _mesh_pp(4)

    g_pp = jax.grad(lambda p: pipeline_loss(p, config, tokens, labels, mesh, 2))(params)
    g_ref = jax.grad(lambda p: llama.forward(p, config, tokens, labels=labels))(params)
    from llama_x_tpu.utils.tree import named_leaves

    for (n, a), (_, b) in zip(named_leaves(g_pp), named_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=n)


def test_pipeline_tied_embeddings():
    config, params, tokens, labels = _setup(tied=True)
    want = float(llama.forward(params, config, tokens, labels=labels))
    got = float(pipeline_loss(params, config, tokens, labels, _mesh_pp(4), 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pipeline_document_mask():
    config, params, tokens, labels = _setup()
    seg = jnp.asarray(np.sort(np.random.default_rng(1).integers(1, 4, tokens.shape), axis=1), jnp.int32)
    want = float(llama.forward(params, config, tokens, segment_ids=seg, labels=labels))
    got = float(pipeline_loss(params, config, tokens, labels, _mesh_pp(4), 4, segment_ids=seg))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pipeline_fused_ce_matches_plain():
    config, params, tokens, labels = _setup(num_layers=4, B=4, S=32)
    mesh = _mesh_pp(4)
    plain = float(pipeline_loss(params, config, tokens, labels, mesh, 2))
    fused = float(pipeline_loss(params, config.replace(fused_ce_chunks=4), tokens, labels, mesh, 2))
    np.testing.assert_allclose(fused, plain, rtol=1e-5)


def test_pipeline_composes_with_dp():
    """dp=2 x pp=4 mesh: batch sharded over dp, each group pipelines its shard."""
    config, params, tokens, labels = _setup(num_layers=4, B=4, S=32)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    want = float(llama.forward(params, config, tokens, labels=labels))
    got = float(pipeline_loss(params, config, tokens, labels, mesh, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pp_trainer_step_matches_dp(tmp_path):
    """Trainer-level PP (VERDICT r1 next-step #3): make_train_step with a pipeline_loss
    loss_fn on a dp=2 x pp=4 make_mesh, params placed by shard_params (pp layer
    sharding), optimizer + accumulation wired — per-step loss and updated params match
    the plain single-mesh dp step."""
    import optax

    from llama_x_tpu.parallel import make_mesh, shard_params
    from llama_x_tpu.train.trainer import init_train_state, make_train_step
    from llama_x_tpu.utils.tree import named_leaves, path_mask

    config, params, tokens, labels = _setup(num_layers=4, B=4, S=32)
    mesh = make_mesh(dp=2, pp=4)
    assert mesh.shape["pp"] == 4
    tx = optax.adamw(1e-3)
    mask = path_mask(params, lambda n, l: True)
    batch = {
        "inputs": jnp.asarray(tokens)[None],  # [accum=1, B, S]
        "labels": jnp.asarray(labels)[None],
    }

    def pp_loss_fn(p, mb):
        from llama_x_tpu.parallel.pipeline import pipeline_loss

        return pipeline_loss(p, config, mb["inputs"], mb["labels"], mesh, 2), jnp.sum(mb["labels"] != -100)

    def dp_loss_fn(p, mb):
        return llama.forward(p, config, mb["inputs"], labels=mb["labels"]), jnp.sum(mb["labels"] != -100)

    state_pp = init_train_state(shard_params(params, mesh), mask, tx)
    state_dp = init_train_state(params, mask, tx)
    step_pp = jax.jit(make_train_step(pp_loss_fn, tx))
    step_dp = jax.jit(make_train_step(dp_loss_fn, tx))

    for i in range(3):
        state_pp, m_pp = step_pp(state_pp, batch)
        state_dp, m_dp = step_dp(state_dp, batch)
        np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=1e-5)
        assert int(m_pp["n_tokens"]) == int(m_dp["n_tokens"])

    for (n, a), (_, b) in zip(named_leaves(state_pp["trainable"]), named_leaves(state_dp["trainable"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=n)


def test_pipeline_prefix_matches_fuse_forward():
    """Modality-prefix pipelining (VERDICT r2 #4): prefix embeds injected at stage 0,
    prefix-LM mask, text-only loss — must match fusion.fuse_forward exactly, loss AND
    grads (incl. the prefix grad that flows back to the caller's stem)."""
    from llama_x_tpu.models import fusion

    config, params, tokens, labels = _setup(num_layers=4, B=4, S=16)
    rng = np.random.default_rng(2)
    prefix = jnp.asarray(rng.standard_normal((4, 8, config.embed_dim)).astype(np.float32))
    mesh = _mesh_pp(4)

    for plm in (False, True):
        want = float(fusion.fuse_forward(params, config, [prefix], tokens, labels=labels, prefix_lm=plm))
        got = float(
            pipeline_loss(params, config, tokens, labels, mesh, 2, prefix_embeds=prefix, prefix_lm=plm)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"prefix_lm={plm}")

    # grads wrt params AND the prefix input (the stem's backward path)
    g_pp = jax.grad(
        lambda p, pre: pipeline_loss(p, config, tokens, labels, mesh, 2, prefix_embeds=pre, prefix_lm=True),
        argnums=(0, 1),
    )(params, prefix)
    g_ref = jax.grad(
        lambda p, pre: fusion.fuse_forward(p, config, [pre], tokens, labels=labels, prefix_lm=True),
        argnums=(0, 1),
    )(params, prefix)
    from llama_x_tpu.utils.tree import named_leaves

    np.testing.assert_allclose(np.asarray(g_pp[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-6)
    for (n, a), (_, b) in zip(named_leaves(g_pp[0]), named_leaves(g_ref[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=n)


def test_pipeline_audio_trainer_step():
    """LlamaAudio trains under pp: the audio stem runs outside the pipeline, its
    embeddings pipeline through, loss matches the single-device audio forward."""
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.models.audio import AudioConfig, LlamaAudio
    from llama_x_tpu.parallel import make_mesh, shard_params
    from llama_x_tpu.train.trainer import init_train_state, make_train_step
    from llama_x_tpu.utils.tree import path_mask
    import optax

    config = llama.tiny_config(num_layers=4, max_seq_len=256, attn_impl="xla")
    audio_config = AudioConfig()
    model = LlamaAudio.init(jax.random.PRNGKey(1), config, audio_config, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((4, 16_000)).astype(np.float32) * 0.1)  # -> 50 audio toks
    tokens = jnp.asarray(rng.integers(1, config.vocab_size, (4, 16)), jnp.int32)
    labels = jnp.asarray(rng.integers(1, config.vocab_size, (4, 16)), jnp.int32)

    want = float(
        audio_mod.forward(model.params, config, audio_config, audio, tokens, labels=labels, prefix_lm=True)
    )

    mesh = make_mesh(dp=2, pp=4)

    def pp_loss_fn(p, mb):
        prefix = audio_mod.audio_embed(p["audio_embed"], audio_config, mb["audio"], dtype=jnp.float32)
        loss = pipeline_loss(
            p, config, mb["tokens"], mb["labels"], mesh, 2, prefix_embeds=prefix, prefix_lm=True
        )
        return loss, jnp.sum(mb["labels"] != -100)

    tx = optax.adamw(1e-3)
    state = init_train_state(shard_params(model.params, mesh), path_mask(model.params, lambda n, l: True), tx)
    step = jax.jit(make_train_step(pp_loss_fn, tx))
    batch = {"audio": audio[None], "tokens": tokens[None], "labels": labels[None]}
    state, metrics = step(state, batch)
    np.testing.assert_allclose(float(metrics["loss"]), want, rtol=1e-5)
