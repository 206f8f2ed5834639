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
    if path.exists():
        # the end-of-training save lands on the same step as the last interval save
        # whenever n_steps % ckpt_interval == 0 — orbax refuses to overwrite, and the
        # bytes would be identical anyway, so just repoint "last"
        tmp = ckpt_dir / ".last.tmp"
        tmp.write_text(path.name)
        os.replace(tmp, ckpt_dir / "last")
        return path
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


def restore_raw(path: str | Path):
    """Restore a checkpoint WITHOUT a template: returns the saved tree as plain nested
    dicts/lists with numpy/jax arrays (None leaves round-trip as None). The npz fallback
    rebuilds dict nesting from the '/'-joined leaf names, so non-dict containers
    (optimizer namedtuples) come back as dicts keyed by index — fine for reading
    params/step, not for resuming an optimizer (use restore_checkpoint for that)."""
    path = Path(path).absolute()
    if _HAVE_ORBAX and not (path / "state.npz").exists():
        return ocp.StandardCheckpointer().restore(path)
    with np.load(path / "state.npz") as z:
        flat = {k.replace("\x1f", "/"): z[k] for k in z.files}
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = arr
    return tree


def restore_params(path: str | Path):
    """Restore model params (trainable+frozen merged back together) + step from a
    TrainState checkpoint — the eval-side counterpart of trainer.full_params (the
    reference restores a monolithic state_dict, train_librispeech.py:200-204; our
    TrainState partitions params by the trainable mask, so reading a checkpoint for
    inference must merge the partitions again)."""
    state = restore_raw(path)
    step = int(np.asarray(state.get("step", 0)))
    if "trainable" in state and "frozen" in state:
        return _merge_partitions(state["trainable"], state["frozen"]), step
    return state.get("params", state), step


def _merge_partitions(a, b):
    """Merge the trainable/frozen partitions of a raw-restored state. Handles both
    encodings of 'absent': None leaves (orbax) and missing dict keys (npz)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return {
            k: _merge_partitions(a.get(k), b.get(k)) if k in a and k in b
            else (a[k] if k in a else b[k])
            for k in {**a, **b}
        }
    return b if a is None else a


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
