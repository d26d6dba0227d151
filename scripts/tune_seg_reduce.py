"""Device tuning probe for the one-hot MXU segment-sum kernel
(ops/pallas/seg_reduce.py) — the dominant cost of the fused aggregation
at mag scale (2.3 ms vs 0.38 ms roofline for a (346k, 128) payload).

Variants: chunk size, super-block G, and fusing the bf16x3 significand
passes into ONE wide MXU dot (onehot @ [v_hi | v_mid | v_lo])."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import het_tpu.ops.pallas.seg_reduce as sr
from het_tpu.data import load_dataset
from het_tpu.utils.timing import op_time_ms

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
EP = g.num_padded_edges
vals = jax.random.normal(jax.random.PRNGKey(0), (EP, 128), jnp.float32)
print(g.describe(), flush=True)


def make_concat_kernel(C, nb, chunk, G, bf16_vals=False):
    def kernel(tptr_ref, vals_hbm, lo_ref, hi_ref, out_ref, vch, acc, sems):
        i = pl.program_id(0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        for j in range(G):
            start = tptr_ref[i * G + j]
            end = tptr_ref[i * G + j + 1]
            astart = (start // 128) * 128
            n_chunks = (end - astart + chunk - 1) // chunk
            acc[...] = jnp.zeros_like(acc)
            lower = lo_ref[j]
            upper = hi_ref[j]

            def dma(c):
                return pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(astart + c * chunk, chunk), :],
                    vch.at[c % 2],
                    sems.at[c % 2],
                )

            @pl.when(n_chunks > 0)
            def _():
                dma(0).start()

            def body(c, _):
                @pl.when(c + 1 < n_chunks)
                def _():
                    dma(c + 1).start()

                dma(c).wait()
                off = astart + c * chunk
                gidx = lane_iota + off
                onehot = jnp.where(
                    (gidx >= lower) & (gidx < upper), 1.0, 0.0
                ).astype(jnp.bfloat16)
                v32 = vch[c % 2].astype(jnp.float32)
                v_hi = v32.astype(jnp.bfloat16)
                r1 = v32 - v_hi.astype(jnp.float32)
                v_mid = r1.astype(jnp.bfloat16)
                v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)
                wide = jnp.concatenate([v_hi, v_mid, v_lo], axis=1)
                part = jax.lax.dot_general(
                    onehot, wide,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc[...] = (
                    acc[...] + part[:, :C] + part[:, C : 2 * C]
                    + part[:, 2 * C :]
                )
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            out_ref[j * nb : (j + 1) * nb, :] = acc[...].astype(out_ref.dtype)

    return kernel


orig_make = sr._make_kernel
orig_super = sr.SUPER


def run(tag, make_kernel, chunk, G):
    sr._make_kernel = make_kernel
    sr.SUPER = G
    try:
        t = op_time_ms(
            lambda v: sr.seg_sum_dst_pallas_raw(g, v, chunk=chunk), vals
        )
        # correctness vs XLA
        got = sr.seg_sum_dst_pallas_raw(g, vals, chunk=chunk)
        want = jax.ops.segment_sum(
            vals, g.dst, num_segments=g.num_nodes + 1,
            indices_are_sorted=True)[: g.num_nodes]
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"{tag} chunk={chunk} G={G}: {t:.3f} ms  maxerr={err:.2e}",
              flush=True)
    except Exception as ex:
        print(f"{tag} chunk={chunk} G={G}: FAIL {repr(ex)[:160]}",
              flush=True)
    finally:
        sr._make_kernel = orig_make
        sr.SUPER = orig_super


run("base", orig_make, 512, 4)
run("base", orig_make, 1024, 4)
run("base", orig_make, 512, 8)
run("concat", make_concat_kernel, 512, 4)
run("concat", make_concat_kernel, 1024, 4)
run("concat", make_concat_kernel, 1024, 8)

# bf16 payload: exact single-pass path
vals_bf = vals.astype(jnp.bfloat16)
t = op_time_ms(lambda v: sr.seg_sum_dst_pallas_raw(g, v, chunk=512),
               vals_bf)
print(f"bf16 single-pass chunk=512 G=4: {t:.3f} ms", flush=True)
