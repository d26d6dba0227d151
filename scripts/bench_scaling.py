"""Multi-device scaling-efficiency benchmark (BASELINE.md target: >=80%
scaling efficiency at 2+ hosts).

On real multi-chip hardware this measures edges/s of the distributed RGAT
training step at mesh sizes 1/2/4/...; in this single-chip environment it
runs on virtual CPU devices, which validates the collective structure and
the measurement methodology (virtual devices share one socket, so the
absolute ratios are NOT hardware scaling numbers — the output says so).

Usage: python scripts/bench_scaling.py [--devices 1 2 4 8] [--scale 0.05]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--n_infeat", type=int, default=32)
    ap.add_argument("--force_cpu_devices", type=int, default=0,
                    help="force N virtual CPU devices (testing)")
    args = ap.parse_args()

    if args.force_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from het_tpu.data.loaders import SYNTH_SCALES
    from het_tpu.models import RGATLayer
    from het_tpu.parallel import (
        DPGNN,
        make_mesh,
        partition_by_dst,
        shard_stacked,
    )
    from het_tpu.utils.timing import force
    import time

    n, e, r = SYNTH_SCALES["mag"]
    n, e = int(n * args.scale), int(e * args.scale)
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    F = args.n_infeat

    results = []
    base = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        sg, info = partition_by_dst(src, dst, rel, n, r, nd, tile=128)
        sg = shard_stacked(sg, mesh)
        x = jnp.asarray(
            info.pad_node_data(
                rng.standard_normal((n, F), dtype=np.float32)
            )
        )
        layers = [
            RGATLayer(in_feat=F, out_feat=F, num_rels=r, num_heads=4,
                      dropout=0.0, stable_softmax=True)
        ]
        dp = DPGNN(layers, mesh)
        params = dp.init(jax.random.PRNGKey(0), sg, x)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss(p):
                return jnp.sum(dp.apply(p, sg, x) ** 2) * 1e-6

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        params, opt_state, l = step(params, opt_state)
        force(l)  # compile + settle
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, l = step(params, opt_state)
        force(l)
        dt = (time.perf_counter() - t0) / reps
        eps = e / dt
        if base is None:
            base = eps
        results.append(
            {
                "devices": nd,
                "step_ms": round(dt * 1e3, 2),
                "edges_per_s": round(eps),
                "scaling_efficiency": round(eps / (base * nd), 3),
            }
        )
        print(json.dumps(results[-1]))
    print(
        json.dumps(
            {
                "note": (
                    "virtual single-socket devices"
                    if jax.devices()[0].platform == "cpu"
                    else "hardware mesh"
                ),
                "edges": e,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
