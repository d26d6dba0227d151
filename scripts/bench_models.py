"""Chained-slope fwd+bwd benchmark for every model family (not just the
RGAT headline): RGAT / HGT / RGCN / GAT on the real ogbn-mag sample,
pallas backend, flags on and off.  Writes docs/MODELS_r5.json
(bf16 mixed-precision columns + the compact-duplication factor the
compact flag's cost model keys on).

Unlike the driver sweep (scripts/benchmark_all.py) these numbers carry no
per-epoch host-sync RTT — they are the honest per-step device times
(see docs/SWEEP_r2.md for the methodology note).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import GATModel, HGTModel, RGATModel, RGCNModel
from het_tpu.utils.timing import op_time_ms


def main():
    heads, f_in = 4, 64
    data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
    g = data.graph
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, f_in))
    labels = jnp.asarray(data.labels) % 8

    def step_time(model, bf16=False):
        ops.set_backend("xla")
        params = model.init(jax.random.PRNGKey(1), g, x)
        xx0 = x
        if bf16:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
            xx0 = x.astype(jnp.bfloat16)
        ops.set_backend("pallas")

        def step(xx):
            def loss_fn(p):
                logits = model.apply(p, g, xx)
                from het_tpu.utils.misc import nll_loss

                return nll_loss(logits, labels)

            return jax.value_and_grad(loss_fn)(params)

        try:
            return op_time_ms(step, xx0, n1=2, n2=14, trials=2)
        finally:
            ops.set_backend("xla")

    cases = {
        "RGAT": RGATModel(in_feat=f_in, hidden=64, num_classes=8,
                          num_rels=g.num_rels, num_heads=heads,
                          num_layers=1, dropout=0.0,
                          stable_softmax="clip"),
        "RGAT+flags": RGATModel(in_feat=f_in, hidden=64, num_classes=8,
                                num_rels=g.num_rels, num_heads=heads,
                                num_layers=1, dropout=0.0, compact=True,
                                multiply_first=True,
                                stable_softmax="clip"),
        "HGT": HGTModel(in_dim=f_in, hidden=64, num_classes=8,
                        num_ntypes=g.num_ntypes, num_rels=g.num_rels,
                        num_heads=heads, num_layers=1, dropout=0.0,
                        stable_softmax="clip"),
        "HGT+compact": HGTModel(in_dim=f_in, hidden=64, num_classes=8,
                                num_ntypes=g.num_ntypes,
                                num_rels=g.num_rels, num_heads=heads,
                                num_layers=1, dropout=0.0, compact=True,
                                stable_softmax="clip"),
        "RGCN": RGCNModel(num_nodes=g.num_nodes, hidden=64, num_classes=8,
                          num_rels=g.num_rels, featureless=False,
                          in_feat=f_in, dropout=0.0),
        "RGCN+compact": RGCNModel(num_nodes=g.num_nodes, hidden=64,
                                  num_classes=8, num_rels=g.num_rels,
                                  featureless=False, in_feat=f_in,
                                  compact=True, dropout=0.0),
        "GAT": GATModel(in_feat=f_in, hidden=64, num_classes=8,
                        num_heads=heads),
    }
    out = {
        "edges": g.num_edges,
        "config": {"H": heads, "f_in": f_in},
        # compact's cost model: edges per unique (rel, node) pair — near
        # 1 the flag only adds the expand indirection (train/driver.py
        # warns below 1.5)
        "compact_duplication_src": round(g.compact_duplication("src"), 3),
    }
    for name, model in cases.items():
        t = step_time(model)
        out[name] = {
            "ms": round(t, 3),
            "Medges_per_s": round(g.num_edges / t / 1e3, 2),
        }
        t16 = step_time(model, bf16=True)
        out[name]["bf16_ms"] = round(t16, 3)
        out[name]["bf16_Medges_per_s"] = round(g.num_edges / t16 / 1e3, 2)
        print(name, out[name], flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "MODELS_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
