"""Two-process multi-host dryrun (VERDICT r1 next-step #8): exercises
jax.distributed init (parallel/mesh.py:init_distributed), a mesh spanning both
processes' devices, per-host shard feeding, and Gloo-backed collectives — then checks
the distributed losses against a single-process run of the same step.

On real hardware the same code path initializes over DCN; here each "host" is a
process with 2 virtual CPU devices.

usage:
  python tools/dryrun_multihost.py            # orchestrates: 2 workers + reference
  python tools/dryrun_multihost.py --worker N # internal: one process of the pair
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_PROC, LOCAL_DEVICES, N_STEPS = 2, 2, 2
COORD = "localhost:29517"


def _force_cpu(n_local: int):
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def _losses(n_global_devices: int) -> list[float]:
    """Build a tiny model + dp mesh over all visible devices, run N_STEPS, return
    per-step losses. Batch rows are fed per-host: each process materializes only the
    shards of the global batch that live on its addressable devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from llama_x_tpu.adapters import trainable_mask
    from llama_x_tpu.models import llama
    from llama_x_tpu.parallel import batch_sharding, make_mesh, shard_params
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    config = llama.tiny_config(max_seq_len=64, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mesh = make_mesh(dp=n_global_devices)
    params = shard_params(params, mesh)
    tx = get_optimizer("AdamW", 1e-3)
    state = init_train_state(params, trainable_mask(params), tx)

    def loss_fn(p, mb):
        return llama.forward(p, config, mb["tokens"], labels=mb["labels"]), jnp.sum(mb["labels"] != -100)

    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(7)
    gtok = rng.integers(0, config.vocab_size, (1, n_global_devices * 2, 32)).astype(np.int32)
    glab = np.roll(gtok, -1, axis=-1).astype(np.int32)
    glab[..., -1] = -100
    sh = batch_sharding(mesh)
    assert isinstance(sh, NamedSharding)
    batch = {
        "tokens": jax.make_array_from_callback(gtok.shape, sh, lambda idx: gtok[idx]),
        "labels": jax.make_array_from_callback(glab.shape, sh, lambda idx: glab[idx]),
    }

    losses = []
    for _ in range(N_STEPS):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses


def worker(process_id: int, out_path: str):
    _force_cpu(LOCAL_DEVICES)
    import jax

    from llama_x_tpu.parallel import init_distributed

    init_distributed(COORD, num_processes=N_PROC, process_id=process_id)
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * LOCAL_DEVICES
    losses = _losses(jax.device_count())
    if process_id == 0:
        with open(out_path, "w") as f:
            json.dump(losses, f)
    print(f"worker {process_id} OK: losses={losses}", flush=True)


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]), sys.argv[-1])
        return

    out = tempfile.mktemp(suffix=".json")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    logs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            print(log)
            raise SystemExit(f"worker {i} failed rc={p.returncode}")
    with open(out) as f:
        dist_losses = json.load(f)

    # single-process reference over the same number of devices
    _force_cpu(N_PROC * LOCAL_DEVICES)
    ref_losses = _losses(N_PROC * LOCAL_DEVICES)

    for a, b in zip(dist_losses, ref_losses):
        assert abs(a - b) < 1e-5, (dist_losses, ref_losses)
    print(f"dryrun_multihost OK: 2 processes x {LOCAL_DEVICES} devices, "
          f"losses {dist_losses} == single-process {ref_losses}")


if __name__ == "__main__":
    main()
