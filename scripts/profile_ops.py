"""Per-op timing of the XLA path on the real device — guides Pallas work.

Usage: python scripts/profile_ops.py [dataset] [n_infeat] [heads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from het_tpu.data import load_dataset
from het_tpu import ops


def bench(fn, *args, reps=20, warmup=3):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mag"
    D_in = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    data = load_dataset(name, tile=128)
    g = data.graph
    print(g.describe(), "device:", jax.devices()[0])
    D = 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (g.num_nodes, D_in))
    w = jax.random.normal(key, (g.num_rels, H, D_in, D)) * 0.1
    feat_e = ops.edge_typed_linear(g, x, w)
    el = jax.random.normal(key, (g.num_padded_edges, H))
    er = jax.random.normal(key, (g.num_padded_edges, H))
    feat_e = jax.block_until_ready(feat_e)

    E = g.num_edges
    rows = [
        ("edge_typed_linear fwd", lambda: ops.edge_typed_linear(g, x, w)),
        (
            "edge_typed_linear grad",
            lambda: jax.grad(
                lambda xx, ww: jnp.sum(ops.edge_typed_linear(g, xx, ww) ** 2),
                argnums=(0, 1),
            )(x, w),
        ),
        (
            "compact_typed_linear fwd",
            lambda: ops.compact_typed_linear(g, x, w),
        ),
        ("gather x[src] (EP,Din)", lambda: ops.gather_src(g, x)),
        (
            "scatter_sum_dst (EP,H,D)",
            lambda: ops.scatter_sum_dst(g, feat_e),
        ),
        (
            "fused_gat fwd",
            lambda: ops.relational_fused_gat(g, feat_e, el, er, 0.2),
        ),
        (
            "fused_gat grad",
            lambda: jax.grad(
                lambda f, a, b: jnp.sum(
                    ops.relational_fused_gat(g, f, a, b, 0.2) ** 2
                ),
                argnums=(0, 1, 2),
            )(feat_e, el, er),
        ),
        (
            "fused_gat fwd stable",
            lambda: ops.relational_fused_gat(g, feat_e, el, er, 0.2,
                                             stable=True),
        ),
    ]
    for label, fn in rows:
        ms = bench(fn)
        print(f"{label:32s} {ms:9.3f} ms   {E / ms * 1e3 / 1e6:8.1f} Medges/s")


if __name__ == "__main__":
    main()
