"""Checkpoint save/resume (≡ torch.save/load of {step, model, optim},
train_metamathqa.py:259-265, train_librispeech.py:200-204) — Orbax-backed so sharded
arrays save/restore across meshes, with the quantized/int8 leaves handled transparently
(they're just int8 arrays in the tree; the reference needed __torch_dispatch__ surgery
for this, subclasses/int8.py:69-102).

Layout: <dir>/step_<N>/ per save plus a 'last' pointer file. restore() loads the newest
(or an explicit step) into the exact pytree structure of a template state.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(ckpt_dir: str | Path, state, step: int) -> Path:
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step:08d}"
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
    else:
        _save_npz(path, state)
    tmp = ckpt_dir / ".last.tmp"
    tmp.write_text(path.name)
    os.replace(tmp, ckpt_dir / "last")
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    pointer = ckpt_dir / "last"
    if pointer.exists():
        p = ckpt_dir / pointer.read_text().strip()
        if p.exists():
            return p
    steps = sorted(ckpt_dir.glob("step_*"))
    return steps[-1] if steps else None


def restore_checkpoint(path: str | Path, template_state):
    """Restore into the structure (shapes/dtypes/shardings) of template_state."""
    path = Path(path).absolute()
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=template_state)
    return _load_npz(path, template_state)


# --- numpy fallback (no orbax): flat npz of leaves ---


def _save_npz(path: Path, state):
    from llama_x_tpu.utils.tree import named_leaves

    path.mkdir(parents=True, exist_ok=True)
    arrays = {name.replace("/", "\x1f"): np.asarray(leaf) for name, leaf in named_leaves(state)}
    np.savez(path / "state.npz", **arrays)


def _load_npz(path: Path, template):
    from llama_x_tpu.utils.tree import named_leaves

    with np.load(path / "state.npz") as z:
        flat = {k.replace("\x1f", "/"): z[k] for k in z.files}
    names = [n for n, _ in named_leaves(template)]
    leaves = [flat[n] for n in names]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
