"""Device mesh construction — the framework's single parallelism abstraction.

The reference has NO distributed layer (SURVEY.md §2.3: no torch.distributed/NCCL
anywhere; bare model.cuda() at train_metamathqa.py:184). Here parallelism is green-field
TPU-native: one ``jax.sharding.Mesh`` with axes

  dp    pure data parallelism (batch sharding only)
  fsdp  data parallelism + ZeRO-3-style parameter/optimizer sharding
  tp    tensor parallelism (Megatron-style head/ffn sharding)

Shardings are declared per-leaf (parallel/sharding.py) and XLA GSPMD inserts the
collectives (all-gather for fsdp weights, psum for tp partials, grad reduce for dp) —
riding ICI on a slice. Multi-host init goes through jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def make_mesh(
    dp: int | None = None,
    fsdp: int | None = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over the available devices.

    Unspecified axes are inferred: tp defaults to 1, fsdp absorbs the remaining devices
    unless dp is given explicitly. Axis order puts tp innermost (fastest-varying →
    adjacent devices → highest-bandwidth ICI neighbors carry the most chatty
    collective), then fsdp, then dp outermost (its collective is one grad reduce per
    step, the least latency-sensitive).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None and fsdp is None:
        dp, fsdp = 1, n // tp
    elif dp is None:
        dp = n // (fsdp * tp)
    elif fsdp is None:
        fsdp = n // (dp * tp)
    assert dp * fsdp * tp == n, f"mesh {dp}x{fsdp}x{tp} != {n} devices"
    return Mesh(devices.reshape(dp, fsdp, tp), AXES)


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host initialization (DCN): call once per host before building the mesh.
    No-op on a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
