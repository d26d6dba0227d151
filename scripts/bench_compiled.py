"""Benchmark the COMPILED RGAT (train/compiled.py — the full DSL ->
passes -> rewrites -> Op-Spec -> lowering pipeline) against the
hand-written flax model at training scale on the real device — the
measured number VERDICT r3 asked for (the paper's DSL-to-kernels claim at
training scale).  Single-head (the DSL has no head axis, like the
reference's rgat.inter-op program).

Writes docs/COMPILED_r4.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import RGATModel
from het_tpu.train.compiled import CompiledRGATModel
from het_tpu.utils.misc import nll_loss
from het_tpu.utils.timing import op_time_ms


def main():
    f_in = 64
    data = load_dataset(
        "mag", tile=128, num_classes=8, scale=0.018,
    )
    g = data.graph
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, f_in))
    labels = jnp.asarray(data.labels) % 8

    out = {"config": {"H": 1, "f_in": f_in, "layers": 1},
           "edges": g.num_edges}
    for flags in ({}, {"compact": True, "multiply_first": True}):
        tag = "+flags" if flags else ""
        cm = CompiledRGATModel(
            in_feat=f_in, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_layers=1, dropout=0.0, **flags,
        )
        params_c = cm.init(jax.random.PRNGKey(1), g, x)
        hw = RGATModel(
            in_feat=f_in, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_heads=1, num_layers=1, dropout=0.0, stable_softmax="raw",
            **flags,
        )
        params_h = {
            "params": {
                "RGATLayer_0": {
                    "conv_weights": params_c["layer_0"]["W"][:, None],
                    "attn_l": params_c["layer_0"]["attn_l"][:, None],
                    "attn_r": params_c["layer_0"]["attn_r"][:, None],
                    "h_bias": params_c["layer_0"]["bias"],
                }
            }
        }

        def step_of(model, params):
            def step(xx):
                def loss_fn(p):
                    return nll_loss(model.apply(p, g, xx), labels)

                return jax.value_and_grad(loss_fn)(params)

            return step

        ops.set_backend("pallas")
        try:
            t_c = op_time_ms(step_of(cm, params_c), x, n1=2, n2=14,
                             trials=3)
            t_h = op_time_ms(step_of(hw, params_h), x, n1=2, n2=14,
                             trials=3)
        finally:
            ops.set_backend("xla")
        out[f"compiled{tag}_ms"] = round(t_c, 3)
        out[f"handwritten{tag}_ms"] = round(t_h, 3)
        out[f"ratio{tag}"] = round(t_c / t_h, 3)
        print(tag or "plain", "compiled", t_c, "handwritten", t_h,
              flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "COMPILED_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/COMPILED_r4.json")


if __name__ == "__main__":
    main()
