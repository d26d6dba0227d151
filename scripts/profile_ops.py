"""Per-op timing of the XLA path on the real device — guides Pallas work.

Usage: python scripts/profile_ops.py [dataset] [n_infeat] [heads]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from het_tpu.data import load_dataset
from het_tpu import ops
from het_tpu.utils.timing import op_time_ms


# chained-slope timing (utils/timing.py): block_until_ready does NOT
# synchronize on this async runtime, and repeated identical computations
# are served from a cache — each profiled op must consume the chained
# carrier so successive invocations are genuinely distinct work.


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
    # each row: (label, carrier x0, op taking the carrier) — the carrier is
    # the tensor op_time_ms perturbs between chain links
    rows = [
        ("edge_typed_linear fwd", x,
         lambda xx: ops.edge_typed_linear(g, xx, w)),
        ("edge_typed_linear grad", x,
         lambda xx: jax.grad(
             lambda a, ww: jnp.sum(ops.edge_typed_linear(g, a, ww) ** 2),
             argnums=(0, 1))(xx, w)),
        ("compact_typed_linear fwd", x,
         lambda xx: ops.compact_typed_linear(g, xx, w)),
        ("gather x[src] (EP,Din)", x, lambda xx: ops.gather_src(g, xx)),
        ("scatter_sum_dst (EP,H,D)", feat_e,
         lambda fe: ops.scatter_sum_dst(g, fe)),
        ("fused_gat fwd", feat_e,
         lambda fe: ops.relational_fused_gat(g, fe, el, er, 0.2)),
        ("fused_gat grad", feat_e,
         lambda fe: jax.grad(
             lambda f, a, b: jnp.sum(
                 ops.relational_fused_gat(g, f, a, b, 0.2) ** 2),
             argnums=(0, 1, 2))(fe, el, er)),
        ("fused_gat fwd stable", feat_e,
         lambda fe: ops.relational_fused_gat(g, fe, el, er, 0.2,
                                             stable=True)),
    ]
    for label, x0, fn in rows:
        ms = op_time_ms(fn, x0, n1=2, n2=10, trials=2)
        print(f"{label:32s} {ms:9.3f} ms   {E / ms * 1e3 / 1e6:8.1f} Medges/s")


if __name__ == "__main__":
    main()
