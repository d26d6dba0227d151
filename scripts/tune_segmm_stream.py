"""One-off device probes for the large-R segment matmul (R=535, K=O=128).

Probe A (done): streamed-DMA pallas kernel precision/block-size sweep —
DEFAULT precision 4.53 ms, HIGHEST 5.00 ms, vs XLA gather-einsum 3.40 ms.

Probe B (this file now): static per-relation sliced matmuls.  Relation row
offsets are known on the host at graph-build time, so the jitted program
can emit one dense matmul per (large) relation with *static* slices — zero
gather traffic, exact roofline bytes.  Small-relation tail variants:
  static_all   — one matmul per relation (535 HLO matmuls; compile risk)
  static_topK  — top-K relations static, tail through the gather-einsum
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from het_tpu.ops.linear import segment_matmul_rows
from het_tpu.utils.timing import op_time_ms
from scripts.bench_segmm_strategies import make_case

seg, x, w = make_case(535, 1_000_000, 128, 128, H=1)
ptrs = np.asarray(jax.device_get(jnp.asarray(seg.seg_ptrs)))
R = len(ptrs) - 1
sizes = ptrs[1:] - ptrs[:-1]


def make_static_mix(k_static):
    """Static matmuls for the k largest relations; contiguous runs of the
    rest go through the tile-batched gather-einsum."""
    big = set(np.argsort(sizes)[::-1][:k_static].tolist())
    plan = []  # (kind, lo, hi, rel)
    r = 0
    while r < R:
        if r in big:
            plan.append(("mm", int(ptrs[r]), int(ptrs[r + 1]), r))
            r += 1
        else:
            r0 = r
            while r < R and r not in big:
                r += 1
            plan.append(("gather", int(ptrs[r0]), int(ptrs[r]), r0))
    T = seg.tile
    ts = np.asarray(jax.device_get(jnp.asarray(seg.tile_seg)))

    def f(xx):
        pieces = []
        for kind, lo, hi, r0 in plan:
            if hi == lo:
                continue
            xs = jax.lax.slice_in_dim(xx, lo, hi)
            if kind == "mm":
                pieces.append(
                    jax.lax.dot(xs, w[r0, 0],
                                preferred_element_type=jnp.float32)
                )
            else:
                nt = (hi - lo) // T
                wt = jnp.take(w[:, 0], ts[lo // T : hi // T], axis=0)
                y = jnp.einsum(
                    "tbk,tko->tbo", xs.reshape(nt, T, -1), wt,
                    preferred_element_type=jnp.float32,
                )
                pieces.append(y.reshape(hi - lo, -1))
        return jnp.concatenate(pieces, axis=0)

    return f


print("xla:", round(op_time_ms(
    lambda xx: segment_matmul_rows(xx, w, seg), x), 3), flush=True)
for k in (32, 64, 128, 535):
    f = make_static_mix(k)
    t0 = time.perf_counter()
    jf = jax.jit(f)
    _ = jf(x)
    np.asarray(_[0, 0])
    tc = time.perf_counter() - t0
    t = op_time_ms(f, x)
    print(f"static_top{k}: {t:.3f} ms (compile {tc:.1f} s)", flush=True)
