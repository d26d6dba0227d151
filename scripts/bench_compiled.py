"""Benchmark the COMPILED model families (train/compiled.py — the full
DSL -> passes -> rewrites -> Op-Spec -> lowering pipeline) against the
hand-written flax models at training scale on the real device — the
paper's DSL-to-kernels claim at training scale, per family (VERDICT r4
item 4).  Single-head (the DSL has no head axis, like the reference's
*.inter-op programs).

Writes docs/COMPILED_r5.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import HGTModel, RGATModel, RGCNModel
from het_tpu.train.compiled import (
    CompiledHGTModel,
    CompiledRGATModel,
    CompiledRGCNModel,
)
from het_tpu.utils.misc import nll_loss
from het_tpu.utils.timing import op_time_ms


def step_of(model, params, g, labels):
    def step(xx):
        def loss_fn(p):
            return nll_loss(model.apply(p, g, xx), labels)

        return jax.value_and_grad(loss_fn)(params)

    return step


def main():
    f_in = 64
    data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
    g = data.graph
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, f_in))
    labels = jnp.asarray(data.labels) % 8

    out = {"config": {"H": 1, "f_in": f_in, "layers": 1},
           "edges": g.num_edges}

    cases = []
    # RGAT: plain and compact+reordered
    for flags in ({}, {"compact": True, "multiply_first": True}):
        tag = "rgat+flags" if flags else "rgat"
        cm = CompiledRGATModel(
            in_feat=f_in, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_layers=1, dropout=0.0, **flags,
        )
        pc = cm.init(jax.random.PRNGKey(1), g, x)
        hw = RGATModel(
            in_feat=f_in, hidden=64, num_classes=8, num_rels=g.num_rels,
            num_heads=1, num_layers=1, dropout=0.0, stable_softmax="raw",
            **flags,
        )
        ph = {"params": {"RGATLayer_0": {
            "conv_weights": pc["layer_0"]["W"][:, None],
            "attn_l": pc["layer_0"]["attn_l"][:, None],
            "attn_r": pc["layer_0"]["attn_r"][:, None],
            "h_bias": pc["layer_0"]["bias"],
        }}}
        cases.append((tag, cm, pc, hw, ph))

    # HGT: plain and compact
    for compact in (False, True):
        tag = "hgt+compact" if compact else "hgt"
        cm = CompiledHGTModel(
            in_dim=f_in, hidden=64, num_classes=8, num_ntypes=g.num_ntypes,
            num_rels=g.num_rels, num_layers=1, dropout=0.0,
            compact=compact,
        )
        pc = cm.init(jax.random.PRNGKey(1), g, x)
        L = pc["layer_0"]
        hw = HGTModel(
            in_dim=f_in, hidden=8, num_classes=8, num_ntypes=g.num_ntypes,
            num_rels=g.num_rels, num_heads=1, num_layers=1, dropout=0.0,
            stable_softmax="raw", compact=compact,
        )
        ph = {"params": {"HGTLayer_0": {
            "k_linears": L["k_w"][:, None],
            "q_linears": L["q_w"][:, None],
            "v_linears": L["v_w"][:, None],
            "a_linears": L["a_w"][:, None],
            "relation_pri": L["rel_pri"][:, None],
            "relation_att": L["rel_att"][:, None],
            "relation_msg": L["rel_msg"][:, None],
            "skip": L["skip"][:, None, None, None],
        }}}
        cases.append((tag, cm, pc, hw, ph))

    # RGCN: plain and compact (two layers — the reference model shape)
    for compact in (False, True):
        tag = "rgcn+compact" if compact else "rgcn"
        cm = CompiledRGCNModel(
            in_feat=f_in, hidden=64, num_classes=8, num_rels=g.num_rels,
            dropout=0.0, compact=compact,
        )
        pc = cm.init(jax.random.PRNGKey(1), g, x)
        hw = RGCNModel(
            num_nodes=g.num_nodes, hidden=64, num_classes=8,
            num_rels=g.num_rels, featureless=False, in_feat=f_in,
            dropout=0.0, compact=compact,
        )
        ph = {"params": {
            "RGCNLayer_0": {"weight": pc["layer_0"]["W"],
                            "bias": pc["layer_0"]["bias"]},
            "RGCNLayer_1": {"weight": pc["layer_1"]["W"],
                            "bias": pc["layer_1"]["bias"]},
        }}
        cases.append((tag, cm, pc, hw, ph))

    for tag, cm, pc, hw, ph in cases:
        ops.set_backend("pallas")
        try:
            t_c = op_time_ms(step_of(cm, pc, g, labels), x, n1=2, n2=14,
                             trials=3)
            t_h = op_time_ms(step_of(hw, ph, g, labels), x, n1=2, n2=14,
                             trials=3)
        except Exception as e:  # record, keep sweeping
            out[f"{tag}_error"] = f"{type(e).__name__}: {e}"
            print(tag, "FAILED:", e, flush=True)
            continue
        finally:
            ops.set_backend("xla")
        out[f"compiled_{tag}_ms"] = round(t_c, 3)
        out[f"handwritten_{tag}_ms"] = round(t_h, 3)
        out[f"ratio_{tag}"] = round(t_c / t_h, 3)
        print(tag, "compiled", round(t_c, 3), "handwritten",
              round(t_h, 3), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "COMPILED_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/COMPILED_r5.json")


if __name__ == "__main__":
    main()
