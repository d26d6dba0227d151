"""Degree-skew robustness of the aggregation path (the role MySegmentCSR
— dense-degree segment + residual CSR, hrt/include/MyHyb/MyHyb.h:480 —
plays in the reference for ogbn-mag-class skew).

On GPU, extreme in-degree skew creates straggler thread blocks, which is
why the reference splits high-degree rows into dense segments.  On TPU
the one-hot segment reduce walks every node tile's edge range in
fixed-size chunks on ONE sequential core, so work is proportional to
total edges regardless of how they distribute over destinations — no
straggler effect exists to engineer around.  This probe demonstrates
that claim on device: uniform vs zipf-skewed vs one-hub graphs at equal
edge counts should reduce in ~equal time.

Writes docs/SKEW_r2.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu.graph import build_heterograph
from het_tpu.ops.pallas.seg_reduce import seg_sum_dst_pallas_raw
from het_tpu.utils.timing import op_time_ms


def make(kind, n=100_000, e=1_000_000, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    if kind == "uniform":
        dst = rng.integers(0, n, e)
    elif kind == "zipf":
        ranks = rng.zipf(1.3, e) % n
        dst = ranks.astype(np.int64)
    elif kind == "one_hub":
        # half of all edges land on a single node (in-degree 500k)
        dst = np.where(rng.random(e) < 0.5, 0, rng.integers(0, n, e))
    else:
        raise ValueError(kind)
    rel = rng.integers(0, 4, e)
    return build_heterograph(src, dst, rel, n, 4, tile=128,
                             build_compact=False)


def main():
    out = []
    for kind in ("uniform", "zipf", "one_hub"):
        g = make(kind)
        vals = jax.random.normal(
            jax.random.PRNGKey(0), (g.num_padded_edges, 128), jnp.float32
        )
        t = op_time_ms(lambda v: seg_sum_dst_pallas_raw(g, v), vals)
        deg = np.asarray(g.in_deg)
        row = {
            "kind": kind,
            "edges": g.num_edges,
            "max_in_degree": int(deg.max()),
            "reduce_ms": round(t, 3),
        }
        out.append(row)
        print(row, flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "SKEW_r2.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
