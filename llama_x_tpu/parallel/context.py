"""Context parallelism: shard_map wiring for ring attention over the "cp" mesh axis.

``context_parallel_attention`` is the model-facing entry: give it full (replicated or
batch-sharded) q/k/v with the sequence axis intact plus a mesh with a "cp" axis, and it
shard_maps ``ops.ring_attention`` so each device holds S/cp of the sequence and K/V
shards rotate over ICI. Exactness vs dense attention is tested on the 8-device CPU sim
(SURVEY.md §4 'Distributed without a cluster').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llama_x_tpu.ops.attention import MaskInfo
from llama_x_tpu.ops.ring_attention import ring_attention, ring_flash_supported


def context_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
    axis_name: str = "cp",
    impl: str = "auto",
) -> jnp.ndarray:
    """q [B, S, Hq, D]; k, v [B, S, Hkv, D]; S must divide by mesh.shape[axis_name].

    Supports causal + segment-id + prefix-LM MaskInfo (no decode metadata). The batch
    axis stays as-is (shard it over dp/fsdp via the usual batch sharding); only the
    sequence axis is split here.
    """
    mi = mask_info or MaskInfo(causal=False)
    assert mi.q_positions is None and mi.kv_positions is None and mi.kv_len is None, (
        "decode metadata is not context-parallel"
    )
    n = mesh.shape[axis_name]
    S = q.shape[1]
    assert S % n == 0, (S, n)

    # keep the batch sharded over whatever data axes the mesh has — pinning it to
    # replicated would all-gather q/k/v over dp/fsdp at every layer and compute the
    # global batch redundantly on each data-parallel group
    batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape and mesh.shape[a] > 1)
    b_spec = batch_axes if batch_axes else None
    seq_spec = P(b_spec, axis_name, None, None)
    seg_spec = P(b_spec, axis_name)
    prefix_spec = P(b_spec)

    def local_fn(q, k, v, seg, prefix):
        lmi = MaskInfo(
            causal=mi.causal,
            segment_ids=seg if mi.segment_ids is not None else None,
            prefix_len=prefix if mi.prefix_len is not None else None,
        )
        return ring_attention(q, k, v, lmi, scale, axis_name=axis_name, impl=impl)

    seg = mi.segment_ids if mi.segment_ids is not None else jnp.zeros(q.shape[:2], jnp.int32)
    prefix = mi.prefix_len if mi.prefix_len is not None else jnp.zeros((q.shape[0],), jnp.int32)

    # the Pallas-blocked ring needs check_vma=False (custom_vjp inside shard_map +
    # interpreter vma gaps); the plain-jnp ring keeps full vma checking
    use_flash = ring_flash_supported(S // n, q.shape[3], q.shape[2], k.shape[2], mi, impl)

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, seg_spec, prefix_spec),
        out_specs=seq_spec,
        check_vma=not use_flash,
    )(q, k, v, seg, prefix)
