"""Dissect the GAT training step: compile the exact bench step, list the
biggest transpose/copy ops in the optimized HLO, and time the step.

The round-2 notes flagged ~20 ms of XLA-inserted physical layout copies of
(EP,256)/(N,4,64) buffers in the composed GAT step; this script makes the
inventory reproducible so layout fixes can be A/B'd.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import GATModel
from het_tpu.utils.timing import op_time_ms


def dtype_bytes(s):
    return {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "pred": 1, "u32": 4,
            "s8": 1, "u8": 1}.get(s, 4)


def shape_bytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * dtype_bytes(dt)


def main():
    heads, f_in = 4, 64
    data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
    g = jax.device_put(data.graph)
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, f_in))
    labels = jnp.asarray(np.asarray(data.labels) % 8)

    model = GATModel(in_feat=f_in, hidden=64, num_classes=8, num_heads=heads)
    ops.set_backend("xla")
    params = model.init(jax.random.PRNGKey(1), g, x)
    ops.set_backend("pallas")

    def step(xx, gg):
        def loss_fn(p):
            logits = model.apply(p, gg, xx)
            from het_tpu.utils.misc import nll_loss

            return nll_loss(logits, labels)

        return jax.value_and_grad(loss_fn)(params)

    try:
        compiled = jax.jit(step).lower(x, g).compile()
        txt = compiled.as_text()
        rows = []
        for line in txt.splitlines():
            line = line.strip()
            m = re.match(r"%?([\w.-]+) = (\S+) (transpose|copy)\(", line)
            if m:
                name, shape, kind = m.groups()
                b = shape_bytes(shape)
                if b >= 8 << 20:
                    rows.append((b, kind, shape, name))
        rows.sort(reverse=True)
        total = sum(r[0] for r in rows)
        print(f"large (>=8MB) transpose/copy ops: {len(rows)}, "
              f"total {total/1e6:.0f} MB")
        for b, kind, shape, name in rows[:40]:
            print(f"  {b/1e6:8.1f} MB  {kind:9s} {shape}  {name}")
        # fusions that contain a transpose of something big
        t = op_time_ms(lambda xx: step(xx, g), x, n1=2, n2=14, trials=2)
        print(f"step: {t:.3f} ms  ({g.num_edges/t/1e3:.2f} Medges/s)")
    finally:
        ops.set_backend("xla")


if __name__ == "__main__":
    main()
