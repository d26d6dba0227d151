"""Inference benchmark: ms/infer for every model family, mirroring the
reference's graphiler-style bench (hrt/python/utils_lite/graphiler_bench.py:
30-67 — warm-up + repeated forward, ms/infer) with chained-slope timing in
place of CUDA events (async runtime; het_tpu/utils/timing.py), plus the
reference's ``check_equal`` role (np.allclose rtol=1e-3,
graphiler_bench.py:18-27) filled by a pallas-vs-XLA forward comparison.

Writes docs/INFER_r2.json.
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

    def infer_case(model):
        ops.set_backend("xla")
        params = model.init(jax.random.PRNGKey(1), g, x)

        def fwd(xx):
            return model.apply(params, g, xx)

        ref = np.asarray(jax.jit(fwd)(x))
        ops.set_backend("pallas")
        got = np.asarray(jax.jit(fwd)(x))
        # reference check_equal tolerance (rtol=1e-3)
        ok = np.allclose(ref, got, rtol=1e-3, atol=1e-5)
        ms = op_time_ms(jax.jit(fwd), x, n1=3, n2=20, trials=2)
        ops.set_backend("xla")
        return round(ms, 3), bool(ok)

    common = dict(num_heads=heads, num_layers=1, dropout=0.0)
    cases = {
        "RGAT": RGATModel(in_feat=f_in, hidden=64, num_classes=8,
                          num_rels=g.num_rels, stable_softmax="clip",
                          **common),
        "RGAT+flags": RGATModel(in_feat=f_in, hidden=64, num_classes=8,
                                num_rels=g.num_rels, compact=True,
                                multiply_first=True, stable_softmax="clip",
                                **common),
        "HGT+compact": HGTModel(in_dim=f_in, hidden=64, num_classes=8,
                                num_ntypes=g.num_ntypes,
                                num_rels=g.num_rels, compact=True,
                                stable_softmax="clip", **common),
        "RGCN+compact": RGCNModel(num_nodes=g.num_nodes, in_feat=f_in,
                                  featureless=False, hidden=64,
                                  num_classes=8, num_rels=g.num_rels,
                                  dropout=0.0, compact=True),
        "GAT": GATModel(in_feat=f_in, hidden=64, num_classes=8,
                        num_heads=heads),
    }
    out = {"edges": g.num_edges, "metric": "ms/infer (fwd, pallas)",
           "config": {"H": heads, "f_in": f_in}}
    for name, model in cases.items():
        ms, ok = infer_case(model)
        out[name] = {"ms_per_infer": ms, "allclose_vs_xla": ok,
                     "Medges_per_s": round(g.num_edges / ms / 1e3, 2)}
        print(name, out[name], flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "../docs/INFER_r2.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
