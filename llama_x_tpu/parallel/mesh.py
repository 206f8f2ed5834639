"""Device mesh construction — the framework's single parallelism abstraction.

The reference has NO distributed layer (SURVEY.md §2.3: no torch.distributed/NCCL
anywhere; bare model.cuda() at train_metamathqa.py:184). Here parallelism is green-field
TPU-native: one ``jax.sharding.Mesh`` with axes

  dp    pure data parallelism (batch sharding only)
  fsdp  data parallelism + ZeRO-3-style parameter/optimizer sharding
  pp    pipeline parallelism (layer stages, parallel/pipeline.py)
  cp    context parallelism (ring attention, ops/ring_attention.py)
  tp    tensor parallelism (Megatron-style head/ffn sharding)

Shardings are declared per-leaf (parallel/sharding.py) and XLA GSPMD inserts the
collectives (all-gather for fsdp weights, psum for tp partials, grad reduce for dp) —
riding ICI on a slice. Multi-host init goes through jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "pp", "cp", "tp")


def make_mesh(
    dp: int | None = None,
    fsdp: int | None = None,
    pp: int = 1,
    cp: int = 1,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a (dp, fsdp, pp, cp, tp) mesh over the available devices.

    Unspecified axes are inferred: tp/cp/pp default to 1, fsdp absorbs the remaining
    devices unless dp is given explicitly. Axis order puts tp innermost
    (fastest-varying → adjacent devices → highest-bandwidth ICI neighbors carry the most
    chatty collective), then cp (ring attention's KV rotation rides neighbor links),
    then pp (stage-to-stage ppermute once per tick), then fsdp, then dp outermost (its
    collective is one grad reduce per step, the least latency-sensitive).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None and fsdp is None:
        dp, fsdp = 1, n // (pp * cp * tp)
    elif dp is None:
        dp = n // (fsdp * pp * cp * tp)
    elif fsdp is None:
        fsdp = n // (dp * pp * cp * tp)
    assert dp * fsdp * pp * cp * tp == n, f"mesh {dp}x{fsdp}x{pp}x{cp}x{tp} != {n} devices"
    return Mesh(devices.reshape(dp, fsdp, pp, cp, tp), AXES)


# ---------------------------------------------------------------------------
# ambient mesh (lets deep model code reach the mesh without threading it through
# every call — only shard_map-based paths like ring attention need it)
# ---------------------------------------------------------------------------

_MESH_STACK: list[Mesh] = []


class use_mesh:
    """Context manager installing ``mesh`` as the ambient mesh for model code."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _MESH_STACK.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _MESH_STACK.pop()


def current_mesh() -> Mesh | None:
    return _MESH_STACK[-1] if _MESH_STACK else None


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host initialization (DCN): call once per host before building the mesh.
    No-op on a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
