"""Synthetic heterograph generators for tests and benchmarks.

Counterpart of hrt/python/utils/graph_synthesizers.py:5-25 (networkx
``fast_gnp_random_graph``) — implemented directly over numpy for speed and
determinism; a relation-typed Erdos–Renyi generator plus a power-law variant
that stresses load balancing the way ogbn-mag's skewed degrees do.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .build import build_heterograph
from .structures import HeteroGraph


def random_heterograph(
    num_nodes: int,
    num_edges: int,
    num_rels: int,
    *,
    seed: int = 0,
    ntype_offsets: Optional[Sequence[int]] = None,
    tile: int = 8,
    power_law: bool = False,
    build_compact: bool = True,
) -> HeteroGraph:
    rng = np.random.default_rng(seed)
    if power_law:
        # skewed dst degrees: a few hub nodes receive most edges
        w = 1.0 / (1.0 + np.arange(num_nodes))
        w /= w.sum()
        dst = rng.choice(num_nodes, size=num_edges, p=w)
    else:
        dst = rng.integers(0, num_nodes, size=num_edges)
    src = rng.integers(0, num_nodes, size=num_edges)
    rel = rng.integers(0, num_rels, size=num_edges)
    return build_heterograph(
        src,
        dst,
        rel,
        num_nodes,
        num_rels,
        ntype_offsets=ntype_offsets,
        tile=tile,
        build_compact=build_compact,
    )
