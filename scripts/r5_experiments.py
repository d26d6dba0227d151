"""Round-5 kernel-bandwidth experiments on the real chip.

Targets (VERDICT.md round 4):
  1. the backward payload permute (fusion.3, 2.28 ms @ 20 GB/s),
  2. the three reduce custom-calls (~87 GB/s),
  3. the canon pad chain / data-formatting copies.

Measures, isolated but on the exact headline shapes:
  A. permute variants: f32 vs bf16 vs bf16 hi/lo split widths
  B. reduce kernel: round-4 form (external fold-combine) vs round-5
     in-kernel combine, across (nb, chunk_edges) geometry

Run: python scripts/r5_experiments.py [A|B]
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

which = sys.argv[1] if len(sys.argv) > 1 else "AB"

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
EP, N, E = g.num_padded_edges, g.num_nodes, g.num_edges
infoS = g.compact_src
infoD = g.compact_dst
UCs = infoS.seg.n_rows
print(g.describe(), f"UCs={UCs}", flush=True)

key = jax.random.PRNGKey(0)
perm = jnp.asarray(infoS.edge_sort_perm)

if "A" in which:
    print("== A: permute variants (take_rows by edge_sort_perm) ==")
    from het_tpu.ops.common import take_rows

    for name, W, dt in [
        ("f32 w=20 (headline payload)", 20, jnp.float32),
        ("f32 w=32 (folded pad)", 32, jnp.float32),
        ("f32 w=16", 16, jnp.float32),
        ("bf16 w=20", 20, jnp.bfloat16),
        ("bf16 w=32", 32, jnp.bfloat16),
        ("bf16 w=40 (hi|lo)", 40, jnp.bfloat16),
        ("bf16 w=64 (hi|lo pad)", 64, jnp.bfloat16),
        ("f32 w=128", 128, jnp.float32),
        ("bf16 w=128", 128, jnp.bfloat16),
    ]:
        v = jax.random.normal(key, (EP, W)).astype(dt)
        ms = op_time_ms(lambda x: take_rows(x, perm), v, n1=2, n2=10,
                        trials=2)
        gbps = 2 * EP * W * np.dtype(dt).itemsize / ms / 1e6
        print(f"  {name:28s} {ms:7.3f} ms  ~{gbps:6.1f} GB/s", flush=True)

    v60 = jax.random.normal(key, (EP, 60)).astype(jnp.bfloat16)
    ms = op_time_ms(lambda x: take_rows(x, perm), v60, n1=2, n2=10,
                    trials=2)
    gbps = 2 * EP * 60 * 2 / ms / 1e6
    print(f"  {'bf16 w=60 (hi|mid|lo)':28s} {ms:7.3f} ms  ~{gbps:6.1f} "
          "GB/s", flush=True)

    # f32 payload split to hi/lo bf16 at the producer, permuted as one
    # (EP, 40) bf16 buffer, recombined after — the end-to-end recipe
    v32 = jax.random.normal(key, (EP, 20))

    def split_perm_combine(v):
        h = v.astype(jnp.bfloat16)
        l = (v - h.astype(jnp.float32)).astype(jnp.bfloat16)
        packed = jnp.concatenate([h, l], axis=1)
        p = take_rows(packed, perm)
        return p[:, :20].astype(jnp.float32) + p[:, 20:].astype(jnp.float32)

    ms = op_time_ms(split_perm_combine, v32, n1=2, n2=10, trials=2)
    print(f"  {'split+perm40+combine e2e':28s} {ms:7.3f} ms", flush=True)

    def split3_perm_combine(v):
        h = v.astype(jnp.bfloat16)
        r1 = v - h.astype(jnp.float32)
        m = r1.astype(jnp.bfloat16)
        l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
        packed = jnp.concatenate([h, m, l], axis=1)
        p = take_rows(packed, perm)
        return (p[:, :20].astype(jnp.float32)
                + p[:, 20:40].astype(jnp.float32)
                + p[:, 40:].astype(jnp.float32))

    ms = op_time_ms(split3_perm_combine, v32, n1=2, n2=10, trials=2)
    print(f"  {'split3+perm60+combine e2e':28s} {ms:7.3f} ms", flush=True)

if "B" in which:
    print("== B: reduce kernel, in-kernel combine x geometry ==")
    k = 4  # headline fold factor (C=20 -> Cp=32)
    vals_folded = jax.random.normal(key, (EP // k, 128))
    vals_folded_bf16 = vals_folded.astype(jnp.bfloat16)
    # bf16 hi|mid|lo split payload (C=60 -> Cp=64, k=2)
    vals_k2_bf16 = jax.random.normal(key, (EP // 2, 128)).astype(
        jnp.bfloat16
    )

    cases = [
        ("dst   k=4", np.asarray(g.in_row_ptr), N),
        ("srcC  k=4", np.asarray(infoS.edge_row_ptr), UCs),
        ("canon k=4", np.asarray(infoD.canon_ptr),
         int(infoD.canon_ptr.shape[0]) - 1),
    ]

    M = jnp.asarray(sr._fold_combine_matrix(k, 32))

    for nb in (128, 256, 512):
        for ce in (1024, 2048, 4096):
            for name, ptr, nn in cases:
                tables = build_tile_tables(ptr, nn, nb=nb, chunk_edges=ce)
                n_work = int(tables.w_tile.shape[0])

                def run_new(v, tables=tables, ptr=ptr, nn=nn, nb=nb):
                    return sr._seg_sum_wl(
                        v, k, jnp.asarray(ptr), nn, tables=tables, nb=nb,
                        combine_lanes=32,
                    )

                def run_old(v, tables=tables, ptr=ptr, nn=nn, nb=nb):
                    out = sr._seg_sum_wl(
                        v, k, jnp.asarray(ptr), nn, tables=tables, nb=nb,
                    )
                    return jax.lax.dot(
                        out, M, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                def run_new_k2(v, tables=tables, ptr=ptr, nn=nn, nb=nb):
                    # bf16 hi|mid|lo payload: k=2, Cp=64, ONE MXU part
                    return sr._seg_sum_wl(
                        v, 2, jnp.asarray(ptr), nn, tables=tables, nb=nb,
                        combine_lanes=64,
                    )

                ms_new = op_time_ms(run_new, vals_folded, n1=2, n2=10,
                                    trials=2)
                ms_old = op_time_ms(run_old, vals_folded, n1=2, n2=10,
                                    trials=2)
                ms_bf = op_time_ms(run_new, vals_folded_bf16, n1=2,
                                   n2=10, trials=2)
                ms_k2 = op_time_ms(run_new_k2, vals_k2_bf16, n1=2,
                                   n2=10, trials=2)
                print(
                    f"  nb={nb:4d} ce={ce:5d} {name} n_work={n_work:5d}"
                    f"  old={ms_old:7.3f}  new={ms_new:7.3f}"
                    f"  new_bf16={ms_bf:7.3f}  k2bf16={ms_k2:7.3f} ms",
                    flush=True,
                )
