"""Pipeline parallelism: GPipe-style microbatch pipelining over a "pp" mesh axis.

The reference has no distributed layer at all (SURVEY.md §2.3 lists PP as a green-field
mesh axis). TPU-native design: layers are sharded across stages on their stacked leading
axis (the scan layout makes this a pure data sharding — stage s holds layers
[s·L/P, (s+1)·L/P)); activations flow stage-to-stage with ``lax.ppermute`` over
neighbor ICI links inside one ``shard_map``; the schedule is a ``lax.scan`` over
``n_micro + n_stages − 1`` ticks (GPipe fill/steady/drain, bubble = (P−1)/(M+P−1)).

Everything is differentiable by construction (scan + ppermute transpose), so one
``jax.grad`` of ``pipeline_loss`` gives pipeline-parallel training with no custom VJP.
Loss semantics match the fused-loss forward exactly: sum of per-token CE over valid
labels / total valid count, so PP loss ≡ single-device loss bit-for-fp-bit.

Composition: build the mesh with a "pp" axis (e.g. ``Mesh(devs.reshape(dp, pp),
("dp", "pp"))``); when a "dp" axis is present the batch is sharded over it (each
data-parallel group pipelines its own shard). Microbatching here is orthogonal to the
trainer's gradient-accumulation scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo
from llama_x_tpu.ops.cross_entropy import IGNORE_INDEX, _flce_forward
from llama_x_tpu.ops.norms import rms_norm
from llama_x_tpu.ops.rope import build_rope


def _stage_trunk(layer_params, config, x, rope, mask_info, dropout_rng=None):
    """Run this stage's local slice of layers (same scanned block as llama.trunk).

    dropout_rng, when given, is split across the local layers (each stage derives its
    own base key from the global one, so keys never collide across stages)."""
    n_local = jax.tree.leaves(layer_params)[0].shape[0]
    layer_rngs = jax.random.split(dropout_rng, n_local) if dropout_rng is not None else None

    def body(carry, scanned):
        p, rng = scanned
        out, _ = llama.block(p, config, carry, rope, mask_info, dropout_rng=rng)
        return out, None

    if config.activation_checkpointing:
        body = jax.checkpoint(body, prevent_cse=False, policy=llama.remat_policy(config))
    x, _ = jax.lax.scan(body, x, (layer_params, layer_rngs))
    return x


def pipeline_loss(
    params,
    config: llama.LlamaConfig,
    tokens: jnp.ndarray,
    labels: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = "pp",
    segment_ids: jnp.ndarray | None = None,
    prefix_embeds: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    dropout_rng: jax.Array | None = None,
):
    """Pipeline-parallel fused-loss forward. tokens/labels [B, S]; B % n_microbatches == 0.

    params["layers"] leaves must be shardable on their leading (num_layers) axis by the
    pp mesh axis; all other params replicate. Returns the scalar mean CE loss
    (identical semantics to llama.forward with labels).

    prefix_embeds [B, Pfx, D], when given, are early-fusion modality tokens (audio /
    image stem outputs, computed by the caller OUTSIDE the pipeline — stems are tiny
    and replicated; grads flow back through the shard_map input). Stage 0 prepends
    them to each microbatch's token embeddings, one rope spans the concatenation, and
    the last stage strips the prefix positions before the head so the loss covers text
    only — exactly fusion.fuse_forward's semantics (models/fusion.py). prefix_lm makes
    the prefix attend bidirectionally. Mutually exclusive with segment_ids (packed
    documents have no modality prefix).
    """
    n_stages = mesh.shape[axis_name]
    assert config.num_layers % n_stages == 0, (config.num_layers, n_stages)
    assert prefix_embeds is None or segment_ids is None, "prefix + packed segments unsupported"
    B, S = tokens.shape
    Pfx = 0 if prefix_embeds is None else int(prefix_embeds.shape[1])
    M = n_microbatches

    layer_spec = jax.tree.map(lambda _: P(axis_name), params["layers"])
    other = {k: v for k, v in params.items() if k != "layers"}
    other_spec = jax.tree.map(lambda _: P(), other)
    # shard the batch over a dp axis when the mesh has one (each dp group pipelines
    # its own batch shard); M microbatches then split the LOCAL batch
    b_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape and mesh.shape[a] > 1)
    b_spec = P(b_axes if b_axes else None, None)
    dp_size = 1
    for a in b_axes:
        dp_size *= mesh.shape[a]
    assert (B // dp_size) % M == 0, (B, dp_size, M)

    def run(layers_local, other_params, tokens, labels, seg, pfx):
        full = dict(other_params, layers=layers_local)
        stage = jax.lax.axis_index(axis_name)
        is_first = stage == 0
        is_last = stage == n_stages - 1

        rope = build_rope(
            config.max_seq_len, config.head_dim, config.rope_base, config.is_llama3_1,
            scale_factor=config.rope_scale_factor,
            low_freq_factor=config.rope_low_freq_factor,
            high_freq_factor=config.rope_high_freq_factor,
            old_context_len=config.rope_old_context_len,
        )[: Pfx + S]

        mb = tokens.shape[0] // M  # local batch / microbatches
        micro_tok = tokens.reshape(M, mb, S)
        micro_lab = labels.reshape(M, mb, S)
        micro_seg = seg.reshape(M, mb, S)
        micro_pfx = pfx.reshape(M, mb, Pfx, pfx.shape[-1]) if prefix_embeds is not None else None

        perm = [(i, i + 1) for i in range(n_stages - 1)]  # stage s -> s+1

        def tick(carry, t):
            inflight, loss_sum, n_valid = carry
            # stage 0 injects microbatch t (zeros once the batch is drained)
            mb_idx = jnp.clip(t, 0, M - 1)
            fresh_tok = jax.lax.dynamic_index_in_dim(micro_tok, mb_idx, 0, keepdims=False)
            fresh = jnp.take(full["tok_embeddings"]["weight"], fresh_tok, axis=0)
            if micro_pfx is not None:
                fresh_pfx = jax.lax.dynamic_index_in_dim(micro_pfx, mb_idx, 0, keepdims=False)
                fresh = jnp.concatenate([fresh_pfx.astype(fresh.dtype), fresh], axis=1)
            fresh = jnp.where(t < M, fresh, jnp.zeros_like(fresh))
            x = jnp.where(is_first, fresh, inflight)

            # stage s is processing microbatch (t - s) this tick — per-microbatch
            # metadata must be indexed per stage, not by the injected index
            proc_idx = jnp.clip(t - stage, 0, M - 1)
            mi = MaskInfo(
                causal=True,
                segment_ids=jax.lax.dynamic_index_in_dim(micro_seg, proc_idx, 0, keepdims=False)
                if segment_ids is not None
                else None,
                prefix_len=jnp.full((mb,), Pfx, jnp.int32) if (prefix_lm and Pfx > 0) else None,
            )
            # per-(stage, tick) dropout keys — stages hold disjoint layers and each
            # microbatch must see fresh noise, so fold both indices in
            rng_t = (
                jax.random.fold_in(jax.random.fold_in(dropout_rng, t), stage)
                if dropout_rng is not None
                else None
            )
            x = _stage_trunk(full["layers"], config, x, rope, mi, dropout_rng=rng_t)

            # last stage: microbatch (t - n_stages + 1) completes on tick t
            done_idx = t - (n_stages - 1)
            lab = jax.lax.dynamic_index_in_dim(micro_lab, jnp.clip(done_idx, 0, M - 1), 0, keepdims=False)
            # strip the modality prefix before the head: loss covers text positions
            # only (≡ fuse_forward's slice, models/fusion.py)
            h = rms_norm(x[:, Pfx:] if Pfx else x, full["norm"]["scale"], config.norm_eps)
            kernel = (
                full["tok_embeddings"]["weight"].T
                if config.tied_embeddings
                else full["output"]["kernel"]
            )
            valid = lab != IGNORE_INDEX
            mb_n = jnp.sum(valid)
            if config.fused_ce_chunks > 0:
                # chunked fused CE — never materializes [mb*S, vocab] logits (the whole
                # point of the fused head at Llama-3's 128k vocab)
                mean_loss, n_valid_f = _flce_forward(
                    h.reshape(-1, h.shape[-1]), kernel, lab.reshape(-1), config.fused_ce_chunks
                )
                mb_loss = mean_loss * n_valid_f.astype(jnp.float32)
            else:
                logits = (h @ kernel.astype(h.dtype)).astype(jnp.float32)
                safe = jnp.where(valid, lab, 0)
                logz = jax.nn.logsumexp(logits, axis=-1)
                gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
                mb_loss = jnp.sum(jnp.where(valid, logz - gold, 0.0))

            take = is_last & (done_idx >= 0) & (done_idx < M)
            loss_sum = loss_sum + jnp.where(take, mb_loss, 0.0)
            n_valid = n_valid + jnp.where(take, mb_n, 0)

            # ship activations to the next stage (last stage's output is dropped)
            inflight = jax.lax.ppermute(x, axis_name, perm)
            return (inflight, loss_sum, n_valid), None

        def vary(v):
            # carries must be varying over every manual axis the tick body touches:
            # pp (stage index / ppermute) and any data axes the batch is sharded over
            for ax in (axis_name, *b_axes):
                try:
                    v = jax.lax.pcast(v, (ax,), to="varying")
                except ValueError:
                    pass  # already varying over ax
            return v

        embed_dtype = full["tok_embeddings"]["weight"].dtype
        init = (
            vary(jnp.zeros((mb, Pfx + S, config.embed_dim), embed_dtype)),
            vary(jnp.zeros((), jnp.float32)),
            vary(jnp.zeros((), jnp.int32)),
        )
        ticks = jnp.arange(M + n_stages - 1, dtype=jnp.int32)
        (_, loss_sum, n_valid), _ = jax.lax.scan(tick, init, ticks)

        # only the last stage holds the real numbers; psum-select over pp replicates
        # them within the stage group, then reduce over any data axes so every device
        # returns the same global mean loss
        loss_sum = jax.lax.psum(jnp.where(is_last, loss_sum, 0.0), axis_name)
        n_valid = jax.lax.psum(jnp.where(is_last, n_valid, 0), axis_name)
        for a in b_axes:
            loss_sum = jax.lax.psum(loss_sum, a)
            n_valid = jax.lax.psum(n_valid, a)
        return loss_sum / jnp.maximum(n_valid, 1).astype(jnp.float32)

    seg = segment_ids if segment_ids is not None else jnp.zeros_like(tokens)
    pfx = prefix_embeds if prefix_embeds is not None else jnp.zeros((B, 1, 1), jnp.float32)
    pfx_spec = P(tuple(b_spec)[0], None, None)  # batch axes from b_spec + [Pfx, D] dims
    return jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(layer_spec, other_spec, b_spec, b_spec, b_spec, pfx_spec),
        out_specs=P(),
    )(params["layers"], other, tokens, labels, seg, pfx)
