"""Headline benchmark: RGAT fwd+bwd edges/s on ogbn-mag (sample shards).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* metric  — edges/s/chip for a full RGAT forward+backward (value_and_grad)
            on the largest available ogbn-mag data (the reference's own
            .npy shard format), Pallas backend.
* vs_baseline — LIKE-FOR-LIKE speedup of the Pallas op path over this
            framework's pure-XLA op path at the same precision and the
            same optimization flags (compact + multiply_first).  The
            reference publishes no absolute numbers (BASELINE.md), so the
            portable XLA lowering is the measurable baseline.  The bf16
            ratio (also like-for-like) and the absolute times of every
            variant are in ``detail``.
* detail.pct_of_roofline — measured step time vs an analytic HBM
            lower bound for this exact algorithm
            (utils/profiling.rgat_compact_step_roofline_ms).

Timing uses chained-slope measurement (het_tpu/utils/timing.py) because the
runtime dispatch is fully asynchronous.

Resilience (round-4): every variant is measured under a per-variant retry
(the remote-compile tunnel can flake with a transient JaxRuntimeError —
that killed the whole round-3 artifact, BENCH_r03.json rc=1).  A variant
that still fails after retries is recorded in ``detail.failed_variants``
and the JSON line is emitted from whatever succeeded; the process exits 0
unless *every* variant failed.  (Always-emits metric machinery analogous
to the reference's hrt/python/RGNNUtils/RGNNUtils.py:389-431.)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from het_tpu import ops
    from het_tpu.data import load_dataset
    from het_tpu.models import RGATModel
    from het_tpu.utils.profiling import (
        rgat_compact_step_roofline_ms,
        rgat_compact_step_traffic_ms,
    )
    from het_tpu.utils.timing import op_time_ms

    heads, f_in, hidden = 4, 64, 64
    # real shards when mounted; synthetic fallback capped at sample scale
    # (full mag is 21M edges — too large for a smoke benchmark).
    # HET_BENCH_SCALE overrides for capacity runs (e.g. 1.0 = full 21M
    # edges, synthetic stand-in — see scripts/bench_fullscale.py).
    scale = float(os.environ.get("HET_BENCH_SCALE", "0.018"))
    data = load_dataset("mag", tile=128, num_classes=8, scale=scale)
    g = data.graph
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (g.num_nodes, f_in))
    labels = jnp.asarray(data.labels) % 8

    def make_step(model, params):
        def step(x):
            def loss_fn(p):
                logits = model.apply(p, g, x)
                from het_tpu.utils.misc import nll_loss

                return nll_loss(logits, labels)

            return jax.value_and_grad(loss_fn)(params)

        return step

    def timed(backend, bf16=False, **model_kw):
        model = RGATModel(
            in_feat=f_in, hidden=hidden, num_classes=8,
            num_rels=g.num_rels, num_heads=heads, num_layers=1,
            dropout=0.0, stable_softmax="clip", **model_kw,
        )
        ops.set_backend("xla")
        params = model.init(jax.random.PRNGKey(1), g, x)
        xx = x
        if bf16:
            # mixed precision: bf16 params/activations in the step (the
            # training driver keeps f32 masters; the cast is the per-step
            # compute path being measured)
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
            xx = x.astype(jnp.bfloat16)
        ops.set_backend(backend)
        try:
            return op_time_ms(make_step(model, params), xx, n1=2, n2=14,
                              trials=2)
        finally:
            ops.set_backend("xla")

    failed_variants = []

    def attempt(name, fn, attempts=3):
        """Retry a variant across transient runtime/tunnel errors; record
        (not raise) a persistent failure so the artifact always emits."""
        last = None
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — deliberately broad:
                # transient failures surface as JaxRuntimeError, XlaRuntime
                # Error, or raw socket errors depending on the tunnel layer
                last = e
                sys.stderr.write(
                    f"[bench] variant {name!r} attempt {i + 1}/{attempts} "
                    f"failed: {type(e).__name__}: {e}\n"
                )
                time.sleep(2.0 * (i + 1))
        failed_variants.append(
            {"variant": name, "error": f"{type(last).__name__}: {last}"}
        )
        return None

    flags = dict(compact=True, multiply_first=True)
    # six variants, each measured for real (no aliasing — ADVICE r1), so
    # every speedup below is like-for-like in precision AND flags:
    t_xla_plain = attempt("xla_plain", lambda: timed("xla"))
    t_pallas_plain = attempt("pallas_plain", lambda: timed("pallas"))
    t_xla_opt = attempt("xla_opt", lambda: timed("xla", **flags))
    t_opt = attempt("pallas_opt", lambda: timed("pallas", **flags))
    t_xla_bf16 = attempt(
        "xla_bf16_opt", lambda: timed("xla", bf16=True, **flags)
    )
    t_bf16 = attempt(
        "pallas_bf16_opt", lambda: timed("pallas", bf16=True, **flags)
    )

    # headline time comes from the PALLAS variants; XLA variants are the
    # baseline and only stand in (with an explicit marker) when every
    # pallas variant failed — otherwise a transient pallas failure would
    # silently report an XLA time as the headline (ADVICE r4)
    pallas_ts = [t for t in (t_pallas_plain, t_opt, t_bf16)
                 if t is not None]
    xla_ts = [t for t in (t_xla_opt, t_xla_bf16, t_xla_plain)
              if t is not None]
    headline_from_xla_fallback = not pallas_ts and bool(xla_ts)
    candidates = pallas_ts or xla_ts
    if not candidates:
        sys.stderr.write("[bench] every variant failed\n")
        print(json.dumps({
            "metric": "RGAT fwd+bwd edges/s on ogbn-mag (1 chip)",
            "value": None, "unit": "edges/s", "vs_baseline": None,
            "detail": {"failed_variants": failed_variants},
        }))
        return 1

    t_best = min(candidates)
    edges_per_s = g.num_edges / (t_best / 1e3)
    # the 1-layer model's output width is num_classes (dims = [f_in, 8]),
    # so the per-head width in the step being timed is 8 // heads
    roof_f32 = rgat_compact_step_roofline_ms(
        g, f_in, heads, 8 // heads, 8, itemsize=4
    )
    roof_bf16 = rgat_compact_step_roofline_ms(
        g, f_in, heads, 8 // heads, 8, itemsize=2
    )
    traf_f32 = rgat_compact_step_traffic_ms(
        g, f_in, heads, 8 // heads, 8, itemsize=4
    )
    traf_bf16 = rgat_compact_step_traffic_ms(
        g, f_in, heads, 8 // heads, 8, itemsize=2
    )

    def ratio(a, b):
        return round(a / b, 3) if (a is not None and b is not None) else None

    def rnd(a):
        return round(a, 3) if a is not None else None

    print(
        json.dumps(
            {
                "metric": "RGAT fwd+bwd edges/s on ogbn-mag (1 chip)",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                # headline ratio is f32-vs-f32 at identical flags
                "vs_baseline": ratio(t_xla_opt, t_opt),
                "detail": {
                    "t_pallas_ms": rnd(t_pallas_plain),
                    "t_pallas_compact_multfirst_ms": rnd(t_opt),
                    "t_bf16_compact_multfirst_ms": rnd(t_bf16),
                    "t_xla_plain_ms": rnd(t_xla_plain),
                    "t_xla_compact_multfirst_ms": rnd(t_xla_opt),
                    "t_xla_bf16_compact_multfirst_ms": rnd(t_xla_bf16),
                    "vs_baseline_f32": ratio(t_xla_opt, t_opt),
                    "vs_baseline_bf16": ratio(t_xla_bf16, t_bf16),
                    "vs_xla_plain_best": ratio(t_xla_plain, t_best),
                    # two denominators, both published (VERDICT r4):
                    # _strict assumes in-kernel gathers (no per-edge
                    # materialization — no implementation can exceed it);
                    # _traffic is the bound for the shipped materializing
                    # kernel design (fold-packed payloads + one permute)
                    "pct_of_roofline_strict_f32": (
                        round(100 * roof_f32 / t_opt, 1)
                        if t_opt is not None else None
                    ),
                    "pct_of_roofline_strict_bf16": (
                        round(100 * roof_bf16 / t_bf16, 1)
                        if t_bf16 is not None else None
                    ),
                    "pct_of_traffic_bound_f32": (
                        round(100 * traf_f32 / t_opt, 1)
                        if t_opt is not None else None
                    ),
                    "pct_of_traffic_bound_bf16": (
                        round(100 * traf_bf16 / t_bf16, 1)
                        if t_bf16 is not None else None
                    ),
                    "num_edges": g.num_edges,
                    "num_nodes": g.num_nodes,
                    "config": {
                        "heads": heads,
                        "n_infeat": f_in,
                        "layers": 1,
                    },
                    "synthetic_data": data.meta.get("synthetic", False),
                    "failed_variants": failed_variants,
                    "headline_from_xla_fallback": headline_from_xla_fallback,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    try:
        rc = main()
    except Exception:  # catastrophic (e.g. data load) — still emit a line
        traceback.print_exc()
        print(json.dumps({
            "metric": "RGAT fwd+bwd edges/s on ogbn-mag (1 chip)",
            "value": None, "unit": "edges/s", "vs_baseline": None,
            "detail": {"failed_variants": [{"variant": "setup",
                                            "error": "fatal"}]},
        }))
        rc = 1
    sys.exit(rc)
