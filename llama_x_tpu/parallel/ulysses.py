"""Ulysses sequence parallelism: all-to-all head-scatter over the "cp" mesh axis.

The CP family's second member (SURVEY.md §2.3 "Ulysses-style head-scatter" as the
alternative behind the same mask-metadata interface as ring attention). Where ring
attention keeps Q resident and rotates K/V shards around the ICI ring (cp steps of
compute + ppermute), Ulysses redistributes ONCE each way:

    [B, S/n, H, D]  --all_to_all(heads->seq)-->  [B, S, H/n, D]
    local attention over the FULL sequence with the FULL MaskInfo
    [B, S, H/n, D]  --all_to_all(seq->heads)-->  [B, S/n, H, D]

Tradeoffs vs ring (both exact):
- communication: Ulysses moves q, k, v, out once each (4 all-to-alls, O(S·H·D/n) per
  device); ring moves k/v n−1 times (O(2·S·H·D) per device total). For n devices on one
  ICI ring the Ulysses volume is ~2/n of ring's — it wins when the head count allows it.
- constraints: Ulysses needs Hq % n == 0 (heads must split across the axis); GQA K/V
  heads are replicated up to lcm(Hkv, n) first (``_kv_repeat``) which adds bandwidth
  when Hkv < n. Ring has no head constraint — it remains the fallback for few-head
  models on wide meshes.
- masking: each device sees the full sequence after the first all_to_all, so the
  global MaskInfo (causal / segment ids / prefix-LM) applies UNCHANGED — no
  position-offset bookkeeping, and the local compute is the ordinary Pallas flash
  kernel over its head slice.

No custom VJP: all_to_all is linear and the local attention is the already-
differentiable flash/XLA path, so grads flow through the same program reversed.

No reference counterpart (the reference is single-GPU, SURVEY.md §2.3); design from
the public Ulysses/DeepSpeed-SP recipe: shard sequence for QKV projection, exchange
sequence<->heads around attention, shard sequence again for the MLP.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention


def _kv_repeat(Hq: int, Hkv: int, n: int) -> int | None:
    """Smallest g such that the g-fold replicated KV heads (Hkv*g) split evenly over
    the axis (n | Hkv*g) while preserving GQA grouping (Hkv*g | Hq). None if the
    geometry cannot be head-scattered (then ring attention is the CP path)."""
    m = math.lcm(Hkv, n)
    return m // Hkv if Hq % m == 0 else None


def ulysses_supported(S: int, Hq: int, Hkv: int, n: int, mi: MaskInfo) -> bool:
    """True when head-scatter covers this call (training/prefill attention; decode
    metadata never reaches CP)."""
    return (
        mi.q_positions is None
        and mi.kv_positions is None
        and mi.kv_len is None
        and S % n == 0
        and Hq % n == 0
        and _kv_repeat(Hq, Hkv, n) is not None
    )


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
    axis_name: str = "cp",
    impl: str = "auto",
) -> jnp.ndarray:
    """q [B, S, Hq, D]; k, v [B, S, Hkv, D]; sequence sharded over mesh axis ``axis_name``.

    Same contract as ``context_parallel_attention`` (the ring entry): full arrays in,
    batch stays sharded over dp/fsdp, only the sequence axis is split here. Raises
    (assert) when the head geometry cannot be scattered — callers route such models to
    ring via ``ulysses_supported``.
    """
    mi = mask_info or MaskInfo(causal=False)
    assert mi.q_positions is None and mi.kv_positions is None and mi.kv_len is None, (
        "decode metadata is not context-parallel"
    )
    n = mesh.shape[axis_name]
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    assert S % n == 0, (S, n)
    assert Hq % n == 0, f"Ulysses needs num_heads ({Hq}) divisible by the {axis_name} axis ({n})"
    g = _kv_repeat(Hq, Hkv, n)
    assert g is not None, f"no KV replication factor for Hq={Hq}, Hkv={Hkv}, n={n}"

    batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape and mesh.shape[a] > 1)
    b_spec = batch_axes if batch_axes else None
    seq_spec = P(b_spec, axis_name, None, None)
    # masks describe GLOBAL positions and each device attends over the full sequence
    # after the scatter — so they ride in replicated over cp, unchanged
    seg_spec = P(b_spec, None)
    prefix_spec = P(b_spec)

    use_flash = impl == "flash" or (impl == "auto" and jax.default_backend() == "tpu")
    if impl == "auto":
        from llama_x_tpu.ops import flash_attention as fa

        use_flash = use_flash or fa.INTERPRET

    def local_fn(q, k, v, seg, prefix):
        # replicate KV heads so the head axis splits evenly over the mesh axis; the
        # local flash kernel's GQA grouping (q head j -> kv head j // group') then
        # reproduces the global h -> h // (Hq/Hkv) mapping exactly (floor-division
        # composition: (h // (Hq/(Hkv*g))) // g == h // (Hq/Hkv))
        if g > 1:
            k = jnp.repeat(k, g, axis=2)
            v = jnp.repeat(v, g, axis=2)
        q = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1, tiled=True)
        k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1, tiled=True)
        v = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1, tiled=True)
        lmi = MaskInfo(
            causal=mi.causal,
            segment_ids=seg if mi.segment_ids is not None else None,
            prefix_len=prefix if mi.prefix_len is not None else None,
        )
        if use_flash:
            from llama_x_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, lmi, scale)
        else:
            out = dot_product_attention(q, k, v, lmi, scale)
        return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2, tiled=True)

    seg = mi.segment_ids if mi.segment_ids is not None else jnp.zeros(q.shape[:2], jnp.int32)
    prefix = mi.prefix_len if mi.prefix_len is not None else jnp.zeros((B,), jnp.int32)

    # same vma posture as the ring entry: the Pallas kernel's custom_vjp inside
    # shard_map needs check_vma=False; the plain path keeps full vma checking
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, seg_spec, prefix_spec),
        out_specs=seq_spec,
        check_vma=not use_flash,
    )(q, k, v, seg, prefix)
