"""Sweep (nb, chunk_edges) geometry of the work-list segment-sum kernel on
the real headline payload shapes — the round-3 breakdown puts the kernel at
5-10x its DMA roofline, consistent with grid-step overhead (n_work ~ tiles +
edge-blocks ~ 900 steps at nb=128/ce=1024).

Run: python scripts/tune_wl_geometry.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import het_tpu.ops.pallas.seg_reduce as sr
from het_tpu.data import load_dataset
from het_tpu.graph.build import build_tile_tables
from het_tpu.utils.timing import op_time_ms

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
EP, N, E = g.num_padded_edges, g.num_nodes, g.num_edges
infoS = g.compact_src
UCs = infoS.seg.n_rows
print(g.describe(), f"UCs={UCs}", flush=True)

k = 4  # headline fold factor (C=20 -> Cp=32)
vals_folded = jax.random.normal(jax.random.PRNGKey(0), (EP // k, 128))
vals_full = jax.random.normal(jax.random.PRNGKey(1), (EP, 128))

CE0 = sr.CHUNK_EDGES

cases = [
    ("dst k=4 (headline fwd)", vals_folded, k, g.in_row_ptr_np
     if hasattr(g, "in_row_ptr_np") else np.asarray(g.in_row_ptr), N),
    ("srcC k=4 (headline bwd)", vals_folded, k,
     np.asarray(infoS.edge_row_ptr), UCs),
    ("dst k=1 (wide)", vals_full, 1, np.asarray(g.in_row_ptr), N),
]

for nb in (32, 64, 128, 256):
    for ce in (256, 512, 1024, 2048):
        if ce // 1 * 128 * 4 > 2 << 20:  # k=1 block cap 2MB
            pass
        sr.CHUNK_EDGES = ce
        for name, vals, kk, ptr, nn in cases:
            if (ce // kk) * 128 * 4 > (2 << 20):
                continue
            tables = build_tile_tables(ptr, nn, nb=nb)
            n_work = int(tables.w_tile.shape[0])

            def run(v, tables=tables, kk=kk, ptr=ptr, nn=nn, nb=nb):
                return sr._seg_sum_wl(
                    v, kk, jnp.asarray(ptr), nn, tables=tables, nb=nb
                )

            ms = op_time_ms(run, vals, n1=2, n2=10, trials=2)
            print(
                f"nb={nb:4d} ce={ce:5d} {name:24s} n_work={n_work:5d}"
                f" {ms:7.3f} ms",
                flush=True,
            )

sr.CHUNK_EDGES = CE0
