"""Device bench: segment-matmul strategies across relation counts.

VERDICT item 3 (round 2): the round-1 streamed Pallas path lost ~2x to the
XLA gather-einsum at wikikg2-like relation counts (R=535, K=128), so
``segment_matmul`` silently fell back to XLA, paying the (n_tiles, H, K, O)
weight-gather materialization.  This script measures every candidate on the
real device with chained-slope timing (het_tpu/utils/timing.py):

* ``xla_gather``   — round-1 fallback: jnp.take(w, tile_seg) + tile einsum;
* ``pallas``       — the Pallas kernel (W-resident, or super-blocked
                     streamed with per-relation-run weight DMA at large R);
* ``ragged_dot``   — jax.lax.ragged_dot grouped GEMM over relation-sorted
                     rows (the TPU-native MoE-style grouped matmul; XLA
                     lowers it without materializing per-tile weights);
* ``static_mix``   — per-relation STATIC-sliced dense matmuls for the
                     largest relations + gather-einsum tail (relation
                     offsets are host-known at graph build) — the winner
                     at large R, wired into ``segment_matmul``;

at (a) mag-like small-R (R=6, H=4, K=64, O=16) and (b) wikikg2-like
large-R (R=535, H=1, K=128, O=128) with zipf-skewed relation sizes, the
shape class served by the reference's scheduled kernel
(hrt/include/DGLHackKernel/RGNN/mysgemm_KernelsBlockConfigurations.h:44-148).

Writes docs/SEGMM_STRATEGIES_r2.json and prints a table.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu.graph.build import build_segments
from het_tpu.ops.linear import (
    ragged_segment_matmul,
    segment_matmul_rows,
    segment_matmul_static_mix,
)
from het_tpu.ops.pallas.segment_mm import segment_matmul_rows_pallas
from het_tpu.utils.timing import op_time_ms


def make_case(R, n_real, K, O, H=1, tile=128, seed=0, skew=1.1):
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, R + 1) ** skew
    p /= p.sum()
    seg_of_row = np.sort(rng.choice(R, size=n_real, p=p))
    seg = build_segments(seg_of_row, R, tile)
    x = jnp.asarray(rng.standard_normal((seg.n_rows, K)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((R, H, K, O)).astype(np.float32)
    )
    return seg, x, w


def bench_case(name, R, n_real, K, O, H):
    seg, x, w = make_case(R, n_real, K, O, H=H)
    gb = (x.size + w.size + seg.n_rows * H * O) * 4 / 1e9
    roofline_ms = gb / 470.0 * 1e3
    res = {
        "case": name,
        "R": R,
        "rows": seg.n_rows,
        "K": K,
        "O": O,
        "H": H,
        "roofline_ms": round(roofline_ms, 3),
    }
    variants = {
        "xla_gather": lambda xx: segment_matmul_rows(xx, w, seg),
        "pallas": lambda xx: segment_matmul_rows_pallas(xx, w, seg),
        "ragged_dot": lambda xx: ragged_segment_matmul(xx, w, seg),
        "static_mix": lambda xx: segment_matmul_static_mix(xx, w, seg),
    }
    for vname, fn in variants.items():
        try:
            t = op_time_ms(fn, x)
            res[vname + "_ms"] = round(t, 3)
        except Exception as e:  # pragma: no cover - device-only probe
            res[vname + "_ms"] = None
            res[vname + "_error"] = repr(e)[:200]
        print(f"  {name}: {vname} = {res.get(vname + '_ms')} ms", flush=True)
    return res


def main():
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    # mag-like: small R, multi-head, small dims
    out.append(bench_case("mag_like", R=6, n_real=345172, K=64, O=16, H=4))
    # wikikg2-like: large R, K=O=128 (reference benchmark_all dims)
    out.append(
        bench_case("wikikg2_like", R=535, n_real=1_000_000, K=128, O=128, H=1)
    )
    # fb15k-like: 474 rels, smaller rows
    out.append(
        bench_case("fb15k_like", R=474, n_real=544_230, K=128, O=128, H=1)
    )
    path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "SEGMM_STRATEGIES_r2.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
