"""Full-published-scale single-chip capacity run: ogbn-mag at 21M edges
(synthetic stand-in at the published node/edge/relation counts — the real
tree only ships the 0.1 sample), RGAT compact+multiply_first, bf16.

The graph rides as a jit ARGUMENT (closure constants would ship the whole
21M-edge graph inside the remote compile request — HTTP 413).

Writes docs/FULLSCALE_r5.json (+ docs/TRACE_FULL_r5.md with --trace).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data.loaders import _synthetic
from het_tpu.models import RGATModel
from het_tpu.utils.timing import force


def main(scale=1.0, dtype=jnp.bfloat16, chunks=0):
    t0 = time.time()
    # the chunked path rebuilds per-shard graphs itself; skip the
    # monolithic compact build there (it is the expensive part)
    data = _synthetic("mag", scale=scale, num_classes=8, seed=0, tile=128,
                      build_compact=(chunks == 0))
    g = data.graph
    t_build = time.time() - t0
    print(g.describe(), f"build {t_build:.0f}s", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, 64), dtype)
    labels = jnp.asarray(data.labels) % 8
    if chunks:
        # dst-range chunked execution (train/chunked.py): keeps every
        # per-edge buffer at sample scale, where the row-major gather
        # regime holds (docs/TRACE_FULL_r5.md)
        from het_tpu.train.chunked import ChunkedRGATModel

        model = ChunkedRGATModel(
            in_feat=64, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_heads=4, num_layers=1, compact=True, multiply_first=True,
            stable_softmax="clip", n_chunks=chunks,
        )
        model.build(g, tile=128)
        t_build = time.time() - t0
        print(f"chunk build total {t_build:.0f}s", flush=True)
    else:
        model = RGATModel(
            in_feat=64, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_heads=4, num_layers=1, dropout=0.0, compact=True,
            multiply_first=True, stable_softmax="clip",
        )
    ops.set_backend("xla")
    params = model.init(
        jax.random.PRNGKey(1), g, jnp.zeros((g.num_nodes, 64), dtype)
    )
    params = jax.tree.map(lambda p: p.astype(dtype), params)
    ops.set_backend("pallas")

    def step(gg, xx):
        def loss_fn(p):
            logits = model.apply(p, gg, xx)
            from het_tpu.utils.misc import nll_loss

            return nll_loss(logits, labels)

        return jax.value_and_grad(loss_fn)(params)

    # chained-slope timing (utils/timing.py recipe) with the graph as a
    # jit ARGUMENT — chain_wrap would close over it and re-bake constants
    @jax.jit
    def chain_step(gg, xx):
        loss, grads = step(gg, xx)
        s = jnp.sum(loss).astype(jnp.float32)
        for leaf in jax.tree.leaves(grads):
            s = s + jnp.sum(leaf).astype(jnp.float32)
        eps = s * jnp.asarray(1e-30, jnp.float32)
        return xx + eps.astype(xx.dtype)

    # the graph rides as a jit ARGUMENT; put it on device ONCE — numpy
    # leaves would re-upload the whole graph through the tunnel per call
    # (measured: 1.26M edges/s flat at every scale, pure transfer-bound).
    # In chunked mode the argument is the stacked shard pytree.
    g = jax.device_put(model.sg if chunks else g)
    try:
        xc = chain_step(g, x)
        force(xc)  # compile + settle

        def run(n):
            xx = x
            t0 = time.perf_counter()
            for _ in range(n):
                xx = chain_step(g, xx)
            force(xx)
            return time.perf_counter() - t0

        samples = []
        for _ in range(2):
            t1, t2 = run(1), run(5)
            samples.append((t2 - t1) / 4)
        t = float(np.median(samples) * 1e3)
    finally:
        ops.set_backend("xla")
    res = {
        "scale": scale,
        "chunks": chunks,
        "edges": data.graph.num_edges,
        "nodes": data.graph.num_nodes,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "step_ms": round(t, 2),
        "Medges_per_s": round(data.graph.num_edges / t / 1e3, 2),
        "graph_build_s": round(t_build, 1),
    }
    print(res, flush=True)
    if "--trace" in sys.argv:
        from het_tpu.utils.trace_analysis import format_table, op_table

        rows, meta = op_table(lambda: chain_step(g, x), iters=2)
        tot = meta["total_device_us_per_iter"]
        lines = [
            "# Full-scale (21.1M-edge mag) per-kernel device trace — round 5",
            "",
            g.describe(),
            f"",
            f"Total device time: {tot / 1e3:.1f} ms/step "
            f"({g.num_edges / tot:.2f} Medges/s)",
            "",
            format_table(rows, top=30, total_us=tot),
            "",
            "Top-op HLO identities:",
            "",
        ]
        for r in rows[:10]:
            lines.append(f"* `{r['name']}`: {r['long_name'][:200]}")
        with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                               "TRACE_FULL_r5.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote docs/TRACE_FULL_r5.md", flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "FULLSCALE_r5.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    ch = 0
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            ch = int(a.split("=")[1])
    main(scale=float(sys.argv[1]) if len(sys.argv) > 1
         and not sys.argv[1].startswith("--") else 1.0, chunks=ch)
