"""LoRA/DoRA + int8 transform tests: zero-init identity, gradient routing, DoRA init
identity, int8+LoRA composition (QLoRA), trainable-mask rules."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask
from llama_x_tpu.models import llama
from llama_x_tpu.utils.tree import named_leaves, trainable_param_count


def _setup(adapter=None, quantize=None, seed=0):
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(seed), config, dtype=jnp.float32)
    if quantize:
        params = dict(params, layers=quantize_linear(params["layers"], quantize))
    if adapter:
        params = dict(
            params,
            layers=apply_linear_adapter(params["layers"], adapter, jax.random.PRNGKey(seed + 1), dtype=jnp.float32),
        )
    return params, config


def test_lora_zero_init_is_identity():
    base_params, config = _setup()
    lora_params, _ = _setup(adapter="lora")
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (2, 8)))
    base = llama.forward(base_params, config, tokens)
    lora = llama.forward(lora_params, config, tokens)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lora), rtol=1e-6)


def test_dora_init_is_identity():
    base_params, config = _setup()
    dora_params, _ = _setup(adapter="dora")
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (2, 8)))
    base = llama.forward(base_params, config, tokens)
    dora = llama.forward(dora_params, config, tokens)
    # m/||W|| == 1 at init (B == 0), so DoRA is identity too
    np.testing.assert_allclose(np.asarray(base), np.asarray(dora), rtol=1e-5, atol=1e-5)


def test_lora_forward_algebra():
    """out == base_out + x A B * (alpha/rank) after perturbing B."""
    from llama_x_tpu.ops.linear import apply_linear

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    lin = {"kernel": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))}
    layers = apply_linear_adapter({"w": lin}, "lora", jax.random.PRNGKey(0), rank=4, alpha=8.0, dtype=jnp.float32)
    lin2 = dict(layers["w"])
    lin2["lora_b"] = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))

    out = np.asarray(apply_linear(x, lin2))
    expected = np.asarray(x @ lin["kernel"]) + np.asarray(x) @ np.asarray(lin2["lora_a"]) @ np.asarray(
        lin2["lora_b"]
    ) * 2.0
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_dora_column_rescale_math():
    """DoRA: out = (xW + xABs) * m/||W + BAs||_col, delta detached in norm."""
    from llama_x_tpu.ops.linear import apply_linear

    rng = np.random.default_rng(3)
    x = np.asarray(rng.standard_normal((4, 16)), np.float32)
    layers = apply_linear_adapter(
        {"w": {"kernel": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))}},
        "dora",
        jax.random.PRNGKey(0),
        rank=4,
        alpha=4.0,
        dtype=jnp.float32,
    )
    lin = dict(layers["w"])
    lin["lora_b"] = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32) * 0.1)

    out = np.asarray(apply_linear(jnp.asarray(x), lin))

    W = np.asarray(lin["kernel"])
    A = np.asarray(lin["lora_a"])
    B = np.asarray(lin["lora_b"])
    s = 1.0
    delta = A @ B * s
    norm = np.linalg.norm(W + delta, axis=0)
    m = np.asarray(lin["m"])
    expected = (x @ W + x @ A @ B * s) * (m / norm)[None, :]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_gradients_only_flow_to_lora():
    params, config = _setup(adapter="lora")
    mask = trainable_mask(params)
    tokens = jnp.asarray(np.random.default_rng(4).integers(0, config.vocab_size, (2, 8)))
    labels = jnp.asarray(np.random.default_rng(5).integers(0, config.vocab_size, (2, 8)))

    from llama_x_tpu.utils.tree import merge, partition

    trainable, frozen = partition(params, mask)

    def loss_fn(t):
        return llama.forward(merge(t, frozen), config, tokens, labels=labels)

    grads = jax.grad(loss_fn)(trainable)
    for name, g in named_leaves(grads):
        if g is None:
            continue
        # after one forward/backward, lora_a grads are nonzero (b is zero so lora_b
        # grads get signal through a; lora_a grads are zero at exact init since b=0)
        assert "lora" in name or name.startswith("tok_embeddings") or name.startswith("norm") or name.startswith("output") or "norm" in name, name


def test_trainable_mask_rules():
    params, _ = _setup(adapter="lora", quantize="int8")
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings",))
    flat = dict(named_leaves(mask))
    assert flat["tok_embeddings/weight"] is False
    assert flat["layers/attention/wq/int_data"] is False
    assert flat["layers/attention/wq/scale"] is False
    assert flat["layers/attention/wq/lora_a"] is True
    assert flat["layers/attention/wq/lora_b"] is True
    assert flat["layers/attention/wq/lora_scale"] is False
    assert flat["layers/attention_norm/scale"] is True  # norms stay trainable
    assert flat["norm/scale"] is True
    assert flat["output/kernel"] is True

    trainable, frozen = trainable_param_count(params, mask)
    assert trainable > 0 and frozen > 0


def test_qlora_composition_forward_close_to_fp():
    """int8 base + zero-init LoRA ≈ fp base (within quantization error)."""
    base_params, config = _setup()
    q_params, _ = _setup(adapter="lora", quantize="int8")
    tokens = jnp.asarray(np.random.default_rng(6).integers(0, config.vocab_size, (2, 8)))
    base = np.asarray(llama.forward(base_params, config, tokens))
    qlora = np.asarray(llama.forward(q_params, config, tokens))
    # int8 rowwise quantization error on every projection; logits stay close
    err = np.abs(base - qlora).max() / (np.abs(base).max() + 1e-6)
    assert err < 0.05, err


def test_grouped_lora_matches_per_linear():
    """apply_linear_grouped == per-projection apply_linear exactly (values AND grads):
    the concatenated A-GEMM reads x once but each output column touches only its own
    A columns, so nothing about the math changes (ops/linear.py:apply_linear_grouped)."""
    from llama_x_tpu.ops.linear import apply_linear, apply_linear_grouped

    rng = jax.random.PRNGKey(42)
    k1, k2, k3, kx = jax.random.split(rng, 4)
    d_in, outs = 32, (48, 16, 16)

    def mk_lin(k, fan_out, rank, with_lora=True, with_bias=False):
        ka, kb, kk, kbias = jax.random.split(k, 4)
        p = {"kernel": jax.random.normal(kk, (d_in, fan_out), jnp.float32) * 0.1}
        if with_lora:
            p["lora_a"] = jax.random.normal(ka, (d_in, rank), jnp.float32) * 0.3
            p["lora_b"] = jax.random.normal(kb, (rank, fan_out), jnp.float32) * 0.3
            p["lora_scale"] = jnp.asarray(2.0, jnp.float32)
        if with_bias:
            p["bias"] = jax.random.normal(kbias, (fan_out,), jnp.float32)
        return p

    # mixed ranks + one bias; and a mixed-presence case (middle linear has no LoRA)
    for presence in [(True, True, True), (True, False, True)]:
        ps = tuple(
            mk_lin(k, fo, r, with_lora=w, with_bias=(i == 0))
            for i, (k, fo, r, w) in enumerate(zip((k1, k2, k3), outs, (4, 8, 4), presence))
        )
        x = jax.random.normal(kx, (2, 6, d_in), jnp.float32)

        def grouped(ps_, x_):
            return sum(jnp.sum(o**2) for o in apply_linear_grouped(x_, ps_))

        def single(ps_, x_):
            return sum(jnp.sum(apply_linear(x_, p) ** 2) for p in ps_)

        outs_g = apply_linear_grouped(x, ps)
        outs_s = [apply_linear(x, p) for p in ps]
        for og, os_ in zip(outs_g, outs_s):
            np.testing.assert_array_equal(np.asarray(og), np.asarray(os_))

        gg = jax.grad(grouped)(ps, x)
        gs = jax.grad(single)(ps, x)
        for lg, ls in zip(jax.tree.leaves(gg), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(ls), rtol=1e-6, atol=1e-6)
