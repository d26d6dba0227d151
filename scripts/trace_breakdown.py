"""Device-trace per-kernel breakdown of the benchmark training steps —
the measured successor of the analytic breakdown (scripts/breakdown.py) and
the TPU counterpart of the reference's nsys/ncu sheets
(hrt/utils/classify_het_kernels.py + load_nsight_report.py).

Captures a jax.profiler trace of each family's fwd+bwd step on the real
device and writes per-kernel tables (time, fw/bw phase, XLA category,
effective GB/s) to docs/TRACE_r5.md.

Usage: python scripts/trace_breakdown.py [RGAT HGT ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import GATModel, HGTModel, RGATModel, RGCNModel
from het_tpu.utils.trace_analysis import format_table, op_table

HEADS, F_IN = 4, 64


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "RGAT+flags", "RGAT", "HGT", "RGCN", "GAT",
    ]
    data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
    g = data.graph
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, F_IN))
    labels = jnp.asarray(data.labels) % 8

    def model_of(name):
        kw = dict(num_layers=1, dropout=0.0)
        if name.startswith("RGAT"):
            return RGATModel(
                in_feat=F_IN, hidden=64, num_classes=8, num_rels=g.num_rels,
                num_heads=HEADS, stable_softmax="clip",
                compact="flags" in name, multiply_first="flags" in name,
                **kw,
            )
        if name == "HGT":
            return HGTModel(in_dim=F_IN, hidden=64, num_classes=8,
                            num_ntypes=g.num_ntypes, num_rels=g.num_rels,
                            num_heads=HEADS, stable_softmax="clip", **kw)
        if name == "RGCN":
            return RGCNModel(num_nodes=g.num_nodes, hidden=64,
                             num_classes=8, num_rels=g.num_rels,
                             featureless=False, in_feat=F_IN, dropout=0.0)
        assert name == "GAT", name
        return GATModel(in_feat=F_IN, hidden=64, num_classes=8,
                        num_heads=HEADS)

    sections = []
    for name in which:
        model = model_of(name)
        ops.set_backend("xla")
        params = model.init(jax.random.PRNGKey(1), g, x)
        ops.set_backend("pallas")

        def step(xx):
            def loss_fn(p):
                logits = model.apply(p, g, xx)
                from het_tpu.utils.misc import nll_loss

                return nll_loss(logits, labels)

            return jax.value_and_grad(loss_fn)(params)

        try:
            rows, meta = op_table(jax.jit(step), x, iters=3)
        finally:
            ops.set_backend("xla")
        tot = meta["total_device_us_per_iter"]
        long = "\n".join(
            f"* `{r['name']}`: {r['long_name'][:200]}" for r in rows[:8]
        )
        sections.append(
            f"## {name}\n\nTotal device time: {tot / 1e3:.3f} ms/step "
            f"({g.num_edges / tot:.2f} Medges/s), {meta['num_ops']} ops\n\n"
            + format_table(rows, top=25, total_us=tot)
            + "\n\nTop-op HLO identities:\n\n" + long
        )
        print(sections[-1], flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "TRACE_r5.md"), "w") as f:
        f.write(
            "# Per-kernel device-trace breakdown (round 5)\n\n"
            f"Graph: {g.describe()}; H={HEADS}, f_in={F_IN}; f32; pallas "
            "backend; jax.profiler device events aggregated per HLO op "
            "over 3 traced steps (utils/trace_analysis.py).\n\n"
            + "\n\n".join(sections) + "\n"
        )
    print("wrote docs/TRACE_r5.md")


if __name__ == "__main__":
    main()
