"""Print the top-N ops of the headline step's device trace WITH their HLO
long names — the drill-down companion to scripts/headline.py --trace.

Run: python scripts/trace_longnames.py [f32|bf16] [N]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import RGATModel
from het_tpu.utils.misc import nll_loss
from het_tpu.utils.trace_analysis import op_table

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 16

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, 64))
labels = jnp.asarray(data.labels) % 8
model = RGATModel(
    in_feat=64, hidden=64, num_classes=8, num_rels=g.num_rels,
    num_heads=4, num_layers=1, dropout=0.0, stable_softmax="clip",
    compact=True, multiply_first=True,
)
ops.set_backend("xla")
params = model.init(jax.random.PRNGKey(1), g, x)
if mode == "bf16":
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    x = x.astype(jnp.bfloat16)
ops.set_backend("pallas")


def step(xx):
    return jax.value_and_grad(
        lambda p: nll_loss(model.apply(p, g, xx), labels)
    )(params)


try:
    rows, meta = op_table(jax.jit(step), x, iters=3)
    print(f"device total: {meta['total_device_us_per_iter'] / 1e3:.3f} ms")
    for r in rows[:topn]:
        print(f"{r['name']:20s} {r['us']:7.1f}us {r['gbps']:5.0f}GB/s :: "
              f"{r['long_name'][:200]}")
finally:
    ops.set_backend("xla")
