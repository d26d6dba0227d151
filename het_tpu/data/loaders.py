"""Dataset loaders.

The reference loads RDF heterographs (AIFB/MUTAG/BGS/AM) through DGL, OGB
datasets through ogb, and pre-sorted ``.npy`` COO shards for ogbn-mag
(hrt/python/utils_lite/graphiler_datasets.py:14-162,
hrt/python/utils/loaders_from_npy.py:7-245).  This environment has neither
DGL nor OGB nor network access, so:

* ``.npy``-shard loading (the reference's own on-disk format: one
  ``(2, E)`` int32 COO per relation, ``hrt/data/ogbn_mag_0.1``) is supported
  directly — this is the real-data path;
* every named dataset additionally has a **deterministic synthetic
  stand-in** at the published scale (node/edge/relation counts from
  hrt/python/RGCN/RGCN.py:633-635 and the graphiler table) so sweep scripts
  run everywhere.  Synthetic graphs are clearly marked
  (``meta["synthetic"]``).

Returned value is a :class:`Dataset`: graph + optional features + entity-
classification labels/splits (synthetic labels are generated from a planted
block structure so models can overfit them — useful for convergence tests).
"""

from __future__ import annotations

import glob
import os
import zlib
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from ..graph.build import build_heterograph
from ..graph.structures import HeteroGraph

DEFAULT_NPY_ROOTS = (
    os.environ.get("HET_TPU_DATA", ""),
    "/root/repo/data",
    "/root/reference/hrt/data",
)

# name -> (num_nodes, num_edges, num_rels); scale facts from the reference
SYNTH_SCALES = {
    "aifb": (8285, 66371, 91),
    "mutag": (23644, 172098, 47),
    "bgs": (333845, 2166243, 207),
    "am": (881680, 5668682, 217),
    "fb15k": (14541, 620232, 474),
    "wikikg2": (2500604, 16109182, 535),
    "biokg": (93773, 4762678, 51),
    "mag": (1939743, 21111007, 4),
    # homogeneous (single-relation) graphs, reference graphiler set
    "cora": (2708, 10556, 1),
    "citeseer": (3327, 9228, 1),
    "pubmed": (19717, 88651, 1),
    "arxiv": (169343, 1166243, 1),
    "reddit": (232965, 114615892, 1),
}


@dataclass
class Dataset:
    name: str
    graph: HeteroGraph
    features: Optional[np.ndarray]
    labels: Optional[np.ndarray]
    train_idx: Optional[np.ndarray]
    test_idx: Optional[np.ndarray]
    num_classes: int
    meta: Dict = field(default_factory=dict)


def load_npy_shards(
    root: str, *, tile: int = 128, build_compact: bool = True,
    compact_union: bool = False
) -> Optional[HeteroGraph]:
    """Load a directory of per-relation ``(2, E)`` COO ``.npy`` shards
    (the reference's ogbn-mag format, loaders_from_npy.py:71-133)."""
    files = sorted(glob.glob(os.path.join(root, "*_coo_*.npy"))) or sorted(
        glob.glob(os.path.join(root, "*.npy"))
    )
    if not files:
        return None
    srcs, dsts, rels, names = [], [], [], []
    for i, f in enumerate(files):
        coo = np.load(f)
        assert coo.ndim == 2 and coo.shape[0] == 2, f
        srcs.append(coo[0])
        dsts.append(coo[1])
        rels.append(np.full(coo.shape[1], i, dtype=np.int64))
        names.append(os.path.basename(f).split("_coo")[0])
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    rel = np.concatenate(rels)
    num_nodes = int(max(src.max(), dst.max())) + 1
    return build_heterograph(
        src,
        dst,
        rel,
        num_nodes,
        len(files),
        rel_names=names,
        tile=tile,
        build_compact=build_compact,
        compact_union=compact_union,
    )


def _planted_labels(
    g: HeteroGraph, num_classes: int, seed: int
) -> np.ndarray:
    """Labels correlated with graph structure (majority relation of incident
    edges) so synthetic datasets are learnable, not pure noise."""
    rng = np.random.default_rng(seed)
    E = g.num_edges
    rel = np.asarray(g.rel)[:E]
    dst = np.asarray(g.dst)[:E]
    votes = np.zeros((g.num_nodes, num_classes), dtype=np.int64)
    np.add.at(votes, (dst, rel % num_classes), 1)
    labels = votes.argmax(1)
    iso = votes.sum(1) == 0
    labels[iso] = rng.integers(0, num_classes, iso.sum())
    return labels


def _synthetic(
    name: str,
    *,
    scale: float = 1.0,
    num_classes: int = 8,
    seed: int = 0,
    tile: int = 128,
    build_compact: bool = True,
    compact_union: bool = False,
) -> Dataset:
    n, e, r = SYNTH_SCALES[name]
    n, e = max(int(n * scale), 64), max(int(e * scale), 256)
    # zlib.crc32, not hash(): str hash is salted per interpreter
    # (PYTHONHASHSEED), which would make the "deterministic" stand-in
    # differ on every run (ADVICE r1).
    rng = np.random.default_rng(seed + zlib.crc32(name.encode()) % 2**16)
    # power-law-ish dst degrees, like real KGs
    w = 1.0 / np.sqrt(1.0 + rng.permutation(n))
    w /= w.sum()
    dst = rng.choice(n, size=e, p=w)
    src = rng.integers(0, n, size=e)
    # zipf-ish relation sizes
    rw = 1.0 / (1.0 + np.arange(r))
    rw /= rw.sum()
    rel = rng.choice(r, size=e, p=rw)
    g = build_heterograph(
        src, dst, rel, n, r, tile=tile, build_compact=build_compact,
        compact_union=compact_union,
    )
    labels = _planted_labels(g, num_classes, seed)
    idx = rng.permutation(n)
    split = int(0.8 * n)
    return Dataset(
        name=name,
        graph=g,
        features=None,
        labels=labels,
        train_idx=idx[:split],
        test_idx=idx[split:],
        num_classes=num_classes,
        meta={"synthetic": True, "scale": scale},
    )


def load_dataset(
    name: str,
    *,
    scale: float = 1.0,
    num_classes: int = 8,
    seed: int = 0,
    tile: int = 128,
    build_compact: bool = True,
    compact_union: bool = False,
    data_roots=DEFAULT_NPY_ROOTS,
) -> Dataset:
    """Load ``name`` from npy shards when available, else synthesize at the
    dataset's published scale (times ``scale``)."""
    name = name.lower()
    for root in data_roots:
        if not root:
            continue
        for cand in (
            os.path.join(root, name),
            os.path.join(root, f"ogbn_{name}_0.1"),
            os.path.join(root, f"{name}_0.1"),
        ):
            if os.path.isdir(cand):
                g = load_npy_shards(
                    cand, tile=tile, build_compact=build_compact,
                    compact_union=compact_union,
                )
                if g is not None:
                    # real label/split shards dropped beside the COO
                    # shards (labels.npy + train_idx.npy/test_idx.npy
                    # [+ features.npy]) make this a REAL-parity dataset
                    # — the reference evaluates real train/val/test
                    # accuracy (hrt/python/RGCN/RGCN.py:554-619); with
                    # no DGL/OGB in the env, real parity becomes a
                    # data-drop instead of a code change (VERDICT r4).
                    labels_f = os.path.join(cand, "labels.npy")
                    if os.path.exists(labels_f):
                        labels = np.load(labels_f).astype(np.int64)
                        assert labels.shape[0] == g.num_nodes, (
                            f"labels.npy has {labels.shape[0]} rows for "
                            f"{g.num_nodes} nodes"
                        )
                        ncls = int(labels.max()) + 1
                        tr_f = os.path.join(cand, "train_idx.npy")
                        te_f = os.path.join(cand, "test_idx.npy")
                        if os.path.exists(tr_f):
                            train_idx = np.load(tr_f).astype(np.int64)
                            test_idx = (
                                np.load(te_f).astype(np.int64)
                                if os.path.exists(te_f)
                                else np.setdiff1d(
                                    np.arange(g.num_nodes), train_idx
                                )
                            )
                        else:
                            rng = np.random.default_rng(seed)
                            idx = rng.permutation(g.num_nodes)
                            split = int(0.8 * g.num_nodes)
                            train_idx, test_idx = idx[:split], idx[split:]
                        feat_f = os.path.join(cand, "features.npy")
                        features = (
                            np.load(feat_f)
                            if os.path.exists(feat_f)
                            else None
                        )
                        return Dataset(
                            name=name,
                            graph=g,
                            features=features,
                            labels=labels,
                            train_idx=train_idx,
                            test_idx=test_idx,
                            num_classes=ncls,
                            meta={"synthetic": False, "path": cand,
                                  "synthetic_labels": False},
                        )
                    labels = _planted_labels(g, num_classes, seed)
                    rng = np.random.default_rng(seed)
                    idx = rng.permutation(g.num_nodes)
                    split = int(0.8 * g.num_nodes)
                    return Dataset(
                        name=name,
                        graph=g,
                        features=None,
                        labels=labels,
                        train_idx=idx[:split],
                        test_idx=idx[split:],
                        num_classes=num_classes,
                        meta={"synthetic": False, "path": cand,
                              "synthetic_labels": True},
                    )
    if name not in SYNTH_SCALES:
        raise ValueError(
            f"unknown dataset {name!r}; known: {sorted(SYNTH_SCALES)}"
        )
    return _synthetic(
        name,
        scale=scale,
        num_classes=num_classes,
        seed=seed,
        tile=tile,
        build_compact=build_compact,
        compact_union=compact_union,
    )
