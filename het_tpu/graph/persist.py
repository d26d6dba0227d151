"""Graph persistence: save/load a preprocessed HeteroGraph.

Reference: ``MyDGLGraph.save_to_disk/load_from_disk`` (torch.save of the
nested dict, hrt/python/utils/mydgl_graph.py:214-218).  Here: one ``.npz``
with the flattened pytree leaves plus a pickled treedef (which carries all
static metadata, including nested Segments sizing) — fast ingest for big
graphs where even native-sorted construction takes minutes."""

from __future__ import annotations

import pickle

import jax
import numpy as np

from .structures import HeteroGraph


def _paths(path: str):
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".npz", base + ".treedef.pkl"


def save_heterograph(path: str, g: HeteroGraph) -> None:
    npz, tdp = _paths(path)
    leaves, treedef = jax.tree.flatten(g)
    np.savez_compressed(
        npz, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    )
    with open(tdp, "wb") as f:
        pickle.dump(treedef, f)


def load_heterograph(path: str) -> HeteroGraph:
    npz, tdp = _paths(path)
    with open(tdp, "rb") as f:
        treedef = pickle.load(f)
    data = np.load(npz)
    leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree.unflatten(treedef, leaves)
