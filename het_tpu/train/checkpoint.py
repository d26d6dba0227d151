"""Training-state checkpoint/resume via orbax.

The reference has none (SURVEY.md §5: ``MyDGLGraph.save_to_disk`` persists
the preprocessed graph only); this adds full params + optimizer-state +
step checkpointing, the production-training capability the TPU build is
expected to carry."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any], step: int) -> str:
    """Save a pytree training state; returns the checkpoint directory."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt_dir = os.path.join(path, f"step_{step}")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, state, force=True)
        return ckpt_dir
    except Exception:
        # portable fallback: flattened npz
        leaves, treedef = jax.tree.flatten(state)
        os.makedirs(path, exist_ok=True)
        f = os.path.join(path, f"step_{step}.npz")
        np.savez(
            f,
            __treedef__=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8
            ),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        return f


def latest_step(path: str) -> Optional[int]:
    """Largest step number checkpointed under ``path`` (None if none)."""
    if not os.path.isdir(path):
        return None
    steps = [
        int(e.split("_")[1].split(".")[0])
        for e in os.listdir(path)
        if e.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, like: Dict[str, Any], step: Optional[int] = None
):
    """Restore into the structure of ``like``; picks the latest step when
    ``step`` is None."""
    entries = [
        e
        for e in os.listdir(path)
        if e.startswith("step_")
    ]
    assert entries, f"no checkpoints under {path}"

    def step_of(e):
        return int(e.split("_")[1].split(".")[0])

    target = (
        max(entries, key=step_of)
        if step is None
        else next(e for e in entries if step_of(e) == step)
    )
    full = os.path.join(path, target)
    if full.endswith(".npz"):
        data = np.load(full)
        leaves, treedef = jax.tree.flatten(like)
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new_leaves)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(full, item=like)
