"""Quick composed-step headline timer: RGAT compact+multiply_first
fwd+bwd on the mag sample, pallas backend, f32 + bf16.  The fast inner
loop for kernel-work A/B (bench.py measures the full 6-variant matrix).

Run: python scripts/headline.py [f32|bf16|both] [--trace]
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
from het_tpu.utils.timing import op_time_ms

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
do_trace = "--trace" in sys.argv

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
heads, f_in, hidden = 4, 64, 64
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (g.num_nodes, f_in))
labels = jnp.asarray(data.labels) % 8

model = RGATModel(
    in_feat=f_in, hidden=hidden, num_classes=8, num_rels=g.num_rels,
    num_heads=heads, num_layers=1, dropout=0.0, stable_softmax="clip",
    compact=True, multiply_first=True,
)
ops.set_backend("xla")
params0 = model.init(jax.random.PRNGKey(1), g, x)
ops.set_backend("pallas")


def make_step(params):
    def step(xx):
        def loss_fn(p):
            return nll_loss(model.apply(p, g, xx), labels)

        return jax.value_and_grad(loss_fn)(params)

    return step


try:
    for name, cast in (("f32", False), ("bf16", True)):
        if mode not in (name, "both"):
            continue
        params = (
            jax.tree.map(lambda p: p.astype(jnp.bfloat16), params0)
            if cast else params0
        )
        xx = x.astype(jnp.bfloat16) if cast else x
        step = make_step(params)
        ms = op_time_ms(step, xx, n1=2, n2=14, trials=3)
        print(f"headline {name}: {ms:7.3f} ms  "
              f"({g.num_edges / ms / 1e3:.1f} Medges/s)", flush=True)
        if do_trace:
            from het_tpu.utils.trace_analysis import format_table, op_table

            rows, meta = op_table(jax.jit(step), xx, iters=3)
            print(f"device total: "
                  f"{meta['total_device_us_per_iter'] / 1e3:.3f} ms")
            print(format_table(rows, top=24))
finally:
    ops.set_backend("xla")
