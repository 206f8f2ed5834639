"""RoPE unit tests: closed-form oracle + the Llama-3.1 rescale math from the reference
spec (modelling/llama.py:32-73 is the oracle; re-derived here independently)."""

import jax.numpy as jnp
import numpy as np

from llama_x_tpu.ops.rope import apply_rope, build_rope, default_rope_frequencies, scale_llama3_1_rope


def test_rope_table_closed_form():
    head_dim, base, S = 8, 10_000.0, 16
    table = np.asarray(build_rope(S, head_dim, base))
    assert table.shape == (S, head_dim // 2, 2)
    for pos in [0, 1, 7, 15]:
        for j in range(head_dim // 2):
            theta = base ** (-2 * j / head_dim)
            np.testing.assert_allclose(table[pos, j, 0], np.cos(pos * theta), rtol=1e-6)
            np.testing.assert_allclose(table[pos, j, 1], np.sin(pos * theta), rtol=1e-6)


def test_llama31_scaling_regions():
    """Per-frequency loop oracle (the reference math) vs the vectorized implementation."""
    freqs = default_rope_frequencies(128, 500_000.0)
    scaled = scale_llama3_1_rope(freqs)

    scale_factor, low, high, old_ctx = 8.0, 1.0, 4.0, 8192
    for f, s in zip(freqs, scaled):
        wavelen = 2 * np.pi / f
        if wavelen < old_ctx / high:
            expected = f
        elif wavelen > old_ctx / low:
            expected = f / scale_factor
        else:
            smooth = (old_ctx / wavelen - low) / (high - low)
            expected = (1 - smooth) * f / scale_factor + smooth * f
        np.testing.assert_allclose(s, expected, rtol=1e-6)


def test_apply_rope_rotation_property():
    """Rotating by position p then measuring pair angle = p * theta; also norm-preserving."""
    B, S, H, D = 1, 4, 1, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, S, H, D)).astype(np.float32)
    rope = build_rope(S, D, 100.0)
    out = np.asarray(apply_rope(jnp.asarray(x), rope))

    # norms of each adjacent pair preserved
    xp = x.reshape(B, S, H, D // 2, 2)
    op = out.reshape(B, S, H, D // 2, 2)
    np.testing.assert_allclose(
        np.linalg.norm(xp, axis=-1), np.linalg.norm(op, axis=-1), rtol=1e-5
    )

    # position 0 is identity
    np.testing.assert_allclose(out[:, 0], x[:, 0], rtol=1e-6)

    # explicit complex-rotation oracle
    for pos in range(S):
        for j in range(D // 2):
            theta = 100.0 ** (-2 * j / D)
            c, s = np.cos(pos * theta), np.sin(pos * theta)
            expected = np.array(
                [x[0, pos, 0, 2 * j] * c - x[0, pos, 0, 2 * j + 1] * s,
                 x[0, pos, 0, 2 * j + 1] * c + x[0, pos, 0, 2 * j] * s]
            )
            np.testing.assert_allclose(op[0, pos, 0, j], expected, rtol=1e-5, atol=1e-6)


def test_apply_rope_with_positions_gather():
    S, D = 16, 8
    rope = build_rope(S, D, 1000.0)
    x = np.random.default_rng(1).standard_normal((1, 3, 2, D)).astype(np.float32)
    pos = jnp.array([5, 6, 7])
    out_gathered = apply_rope(jnp.asarray(x), rope, positions=pos)
    out_sliced = apply_rope(jnp.asarray(x), rope[5:8])
    np.testing.assert_allclose(np.asarray(out_gathered), np.asarray(out_sliced), rtol=1e-6)
