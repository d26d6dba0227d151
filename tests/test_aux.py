"""Auxiliary subsystem tests: checkpoint round-trip, graph persistence,
neighbor sampling, roofline report."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from het_tpu.data.sampling import NeighborSampler
from het_tpu.graph import random_heterograph
from het_tpu.graph.persist import load_heterograph, save_heterograph
from het_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from het_tpu.utils.profiling import rgat_layer_costs, speed_of_light_report


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        "opt": {"mu": jnp.ones((3, 4))},
    }
    save_checkpoint(str(tmp_path), state, step=3)
    save_checkpoint(str(tmp_path), jax.tree.map(lambda x: x * 2, state), 7)
    restored = restore_checkpoint(str(tmp_path), state)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]),
        np.asarray(state["params"]["w"]) * 2,
    )
    r3 = restore_checkpoint(str(tmp_path), state, step=3)
    np.testing.assert_allclose(
        np.asarray(r3["params"]["w"]), np.asarray(state["params"]["w"])
    )


def test_graph_persist_roundtrip(tmp_path):
    g = random_heterograph(num_nodes=40, num_edges=200, num_rels=3, tile=8)
    p = str(tmp_path / "graph")
    save_heterograph(p, g)
    g2 = load_heterograph(p)
    assert g2.num_nodes == g.num_nodes
    assert g2.num_edges == g.num_edges
    assert g2.edge_rel_seg.n_tiles == g.edge_rel_seg.n_tiles
    np.testing.assert_array_equal(np.asarray(g2.src), np.asarray(g.src))
    np.testing.assert_array_equal(
        np.asarray(g2.compact_src.edge_map), np.asarray(g.compact_src.edge_map)
    )


def test_neighbor_sampler():
    rng = np.random.default_rng(0)
    n, e, r = 100, 600, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    sampler = NeighborSampler(src, dst, rel, n, r, fanout=5, num_hops=2)
    seeds = np.array([1, 2, 3])
    sub, node_map = sampler.sample(seeds)
    assert np.array_equal(node_map[:3], seeds)
    # every sampled edge exists in the full graph
    full = set(zip(src.tolist(), dst.tolist(), rel.tolist()))
    E = sub.num_edges
    for s, d, rr in zip(
        np.asarray(sub.src)[:E], np.asarray(sub.dst)[:E],
        np.asarray(sub.rel)[:E],
    ):
        assert (node_map[s], node_map[d], rr) in full
    # batches iterate
    batches = list(sampler.batches(np.arange(10), 4))
    assert len(batches) == 3


def test_roofline_report():
    g = random_heterograph(num_nodes=50, num_edges=300, num_rels=4, tile=8)
    costs = rgat_layer_costs(g, f_in=64, heads=4, d_out=16)
    assert all(c.flops >= 0 and c.hbm_bytes > 0 for c in costs.values())
    rep = speed_of_light_report(
        g, {"typed_linear_src": 1.0}, f_in=64, heads=4, d_out=16
    )
    assert "speed_of_light_pct" in rep


def test_early_stopping():
    from het_tpu.utils.misc import EarlyStopping

    es = EarlyStopping(patience=2, mode="min")
    vals = [1.0, 0.8, 0.9, 0.85, 0.84]
    stops = [es.update(v, i) for i, v in enumerate(vals)]
    # 0.9 and 0.85 both fail to beat 0.8 -> patience exhausted at index 3
    assert stops == [False, False, False, True, True]
    assert es.best == 0.8 and es.best_step == 1


def test_build_info_and_warn_defaults():
    import warnings as w

    from het_tpu.utils.misc import build_info, warn_default_arguments

    assert "het_tpu @" in build_info()

    @warn_default_arguments
    def f(a, b=2):
        return a + b

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        f(1)
        assert any("default" in str(r.message) for r in rec)


def test_tuning_table_resolution():
    """Kernel constants resolve through the per-TPU-generation table
    (reference: CUDA_ARCHS-keyed macros.h).  On the CPU test backend the
    measured v5e row is the default; prefix matching must prefer the
    longest key ("TPU v5 lite" over "TPU v5")."""
    from het_tpu.ops.pallas import tuning

    t = tuning.get_table()
    assert t.measured  # CPU fallback = the measured v5e row
    assert t.nb == 128 and t.chunk_edges == 1024 and t.fold_floor == 16

    # the table feeds the actual kernel/module constants
    from het_tpu.ops.pallas import seg_reduce, segment_mm
    from het_tpu.ops.linear import STATIC_MIX_TOPK
    from het_tpu.utils.profiling import device_peaks

    assert seg_reduce.NB == t.nb
    assert seg_reduce.CHUNK_EDGES == t.chunk_edges
    assert segment_mm.W_RESIDENT_BYTES == t.w_resident_bytes
    assert STATIC_MIX_TOPK() == t.static_mix_topk
    assert device_peaks()["hbm_gbps"] == t.hbm_gbps

    # longest-prefix semantics (simulated device kinds)
    rows = tuning.TABLES
    assert rows["TPU v5 lite"].measured
    assert not rows["TPU v5"].measured
    # a hypothetical "TPU v5 litepod" kind must land on the v5e row
    best = None
    kind = "TPU v5 litexyz"
    for key, row in rows.items():
        if kind.startswith(key) and (best is None or len(key) > best[0]):
            best = (len(key), row)
    assert best[1] is rows["TPU v5 lite"]


def test_trace_parse_synthetic():
    """parse_trace digests a synthetic Perfetto JSON: device-pid complete
    events aggregate by name, envelope events (no hlo_category) are
    excluded, per-iteration division and bandwidth derivation hold."""
    import gzip
    import json
    import os
    import tempfile

    from het_tpu.utils.trace_analysis import (classify_phase, format_table,
                                              parse_trace)

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # program envelope: no hlo_category -> excluded
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0, "dur": 100.0,
         "name": "jit_step(123)",
         "args": {"device_duration_ps": "100000000"}},
        # two iterations of the same op
        *[{"ph": "X", "pid": 3, "tid": 3, "ts": i * 50, "dur": 40.0,
           "name": "fusion.1",
           "args": {"device_duration_ps": "40000000",
                    "hlo_category": "loop fusion",
                    "bytes_accessed": "80000000",
                    "model_flops": "1000",
                    "long_name": "%fusion.1 = f32[8,8] fusion(...)"}}
          for i in range(2)],
        # a backward custom call (phase classification)
        {"ph": "X", "pid": 3, "tid": 3, "ts": 200, "dur": 10.0,
         "name": "transpose_jvp___.2",
         "args": {"device_duration_ps": "10000000",
                  "hlo_category": "custom-call", "bytes_accessed": "0",
                  "long_name": "%transpose_jvp___.2 = custom-call(...)"}},
        # host event: excluded by pid
        {"ph": "X", "pid": 7, "tid": 1, "ts": 0, "dur": 999.0,
         "name": "python", "args": {"device_duration_ps": "1"}},
    ]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.trace.json.gz")
        with gzip.open(p, "wt") as f:
            json.dump({"traceEvents": events}, f)
        rows, meta = parse_trace(p, iters=2)
    assert meta["num_ops"] == 2
    assert abs(meta["total_device_us_per_iter"] - (80 + 10) / 2) < 1e-6
    r = {x["name"]: x for x in rows}
    assert r["fusion.1"]["count"] == 1  # 2 events / 2 iters
    assert abs(r["fusion.1"]["us"] - 40.0) < 1e-6
    assert abs(r["fusion.1"]["gbps"] - 80e6 / 40e-6 / 1e9) < 1e-3
    assert r["transpose_jvp___.2"]["phase"] == "bwd"
    assert classify_phase("jvp(foo)", "") == "fwd"
    table = format_table(rows)
    assert "fusion.1" in table and "GB/s" in table
