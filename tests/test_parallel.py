"""Distributed layer tests on an 8-virtual-device CPU mesh: a partitioned
RGAT/RGCN must reproduce the single-chip results exactly (up to f32
reassociation), and gradients must flow through the shard_map + all-gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import build_heterograph
from het_tpu.models import RGATLayer, RGCNLayer
from het_tpu.parallel import (
    DPGNN,
    make_mesh,
    partition_by_dst,
    shard_stacked,
)


def _coo(seed=0, n=200, e=900, r=4):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, n, e),
        rng.integers(0, n, e),
        rng.integers(0, r, e),
        n,
        r,
    )


@pytest.mark.parametrize("n_parts", [2, 8])
def test_partition_roundtrip(n_parts):
    src, dst, rel, n, r = _coo()
    sg, info = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    # every original edge appears in exactly one shard with relabeled ids
    total = 0
    for p in range(n_parts):
        gp = jax.tree.map(lambda a: a[p], sg)
        E = np.asarray(gp.dst)
        real = E < gp.num_nodes
        total += real.sum()
    assert total == len(src)
    assert info.num_padded_global_nodes % n_parts == 0


@pytest.mark.slow
def test_dp_rgat_matches_single_chip():
    src, dst, rel, n, r = _coo(seed=1)
    n_parts = 8
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    sg = shard_stacked(sg, mesh)

    F, O = 12, 8
    rngk = jax.random.PRNGKey(0)
    x_orig = jax.random.normal(rngk, (n, F))
    x_pad = jnp.asarray(info.pad_node_data(np.asarray(x_orig)))

    layer = RGATLayer(in_feat=F, out_feat=O, num_rels=r, num_heads=2,
                      bias=True, dropout=0.0)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(1), sg, x_pad)
    out_dp = jax.jit(lambda p, x: dp.apply(p, sg, x))(params, x_pad)

    # single-chip reference on the unpartitioned graph
    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    out_1 = layer.apply(params[0], g1, x_orig)

    # compare real node rows
    relabeled = info.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_dp_two_layer_grads():
    src, dst, rel, n, r = _coo(seed=2, n=160, e=600)
    n_parts = 4
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    sg = shard_stacked(sg, mesh)
    F = 8
    x_pad = jnp.asarray(
        info.pad_node_data(
            np.random.default_rng(0).standard_normal((n, F), dtype=np.float32)
        )
    )
    layers = [
        RGCNLayer(in_feat=F, out_feat=8, num_rels=r, activation=jax.nn.relu),
        RGATLayer(in_feat=8, out_feat=4, num_rels=r, num_heads=1,
                  dropout=0.0),
    ]
    dp = DPGNN(layers, mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)

    def loss(params):
        out = dp.apply(params, sg, x_pad)
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(val)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # single-chip comparison of loss value
    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    x1 = np.asarray(x_pad)[info.relabel(np.arange(n))]
    h = layers[0].apply(params[0], g1, jnp.asarray(x1))
    h = layers[1].apply(params[1], g1, h)
    np.testing.assert_allclose(
        float(jnp.sum(h ** 2)), float(val), rtol=1e-3
    )


@pytest.mark.slow
def test_dp_with_pallas_backend():
    """Pallas kernels (interpret mode on CPU) inside shard_map + grad."""
    from het_tpu import ops

    src, dst, rel, n, r = _coo(seed=3, n=96, e=400)
    n_parts = 2
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    sg = shard_stacked(sg, mesh)
    x_pad = jnp.asarray(
        info.pad_node_data(
            np.random.default_rng(0).standard_normal((n, 8), dtype=np.float32)
        )
    )
    layer = RGATLayer(in_feat=8, out_feat=4, num_rels=r, num_heads=1,
                      dropout=0.0)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)

    def loss(params):
        return jnp.sum(dp.apply(params, sg, x_pad) ** 2)

    ops.set_backend("xla")
    v_x, g_x = jax.value_and_grad(loss)(params)
    ops.set_backend("pallas")
    try:
        v_p, g_p = jax.jit(jax.value_and_grad(loss))(params)
    finally:
        ops.set_backend("xla")
    np.testing.assert_allclose(float(v_x), float(v_p), rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
        ),
        g_x,
        g_p,
    )


def test_dp_hgt_matches_single_chip():
    """Distributed HGT (local k/q/v projections + halo-gathered k/v, per-
    shard node-type arrays) must reproduce the single-chip layer."""
    from het_tpu.models import HGTLayer

    rng = np.random.default_rng(5)
    n, e, r = 200, 800, 3
    ntype_offsets = (0, 70, 200)  # type boundary inside shard ranges
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    n_parts = 4
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, ntype_offsets=ntype_offsets
    )
    sg = shard_stacked(sg, mesh)
    F = 8
    x = rng.standard_normal((n, F), dtype=np.float32)
    x_pad = jnp.asarray(info.pad_node_data(x))

    layer = HGTLayer(in_dim=F, out_dim=8, num_ntypes=2, num_rels=r,
                     num_heads=2, dropout=0.0)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)
    out_dp = jax.jit(lambda p, xx: dp.apply(p, sg, xx))(params, x_pad)

    g1 = build_heterograph(
        src, dst, rel, n, r, ntype_offsets=ntype_offsets, tile=8
    )
    out_1 = layer.apply(params[0], g1, jnp.asarray(x))
    relabeled = info.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-3, atol=1e-4,
    )


@pytest.mark.slow
def test_dp_compact_on_shards():
    """Compact flags on a partitioned graph: per-shard compact tables are
    built with forced (across-shard max) sizes; a compact RGAT layer under
    shard_map must match the single-chip compact layer, on both backends,
    including gradients."""
    from het_tpu import ops

    src, dst, rel, n, r = _coo(seed=7, n=128, e=500)
    n_parts = 4
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, build_compact=True
    )
    assert jax.tree.leaves(sg.compact_src.seg)[0].shape[0] == n_parts
    sg = shard_stacked(sg, mesh)
    x = np.random.default_rng(0).standard_normal((n, 8), dtype=np.float32)
    x_pad = jnp.asarray(info.pad_node_data(x))
    layer = RGATLayer(in_feat=8, out_feat=4, num_rels=r, num_heads=2,
                      dropout=0.0, compact=True)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)

    def loss(p):
        return jnp.sum(dp.apply(p, sg, x_pad) ** 2)

    g1 = build_heterograph(src, dst, rel, n, r, tile=8, build_compact=True)
    out_1 = layer.apply(params[0], g1, jnp.asarray(x))
    relabeled = info.relabel(np.arange(n))
    for backend in ("xla", "pallas"):
        ops.set_backend(backend)
        try:
            out_dp = jax.jit(lambda p, xx: dp.apply(p, sg, xx))(
                params, x_pad
            )
            val, grads = jax.value_and_grad(loss)(params)
        finally:
            ops.set_backend("xla")
        np.testing.assert_allclose(
            np.asarray(out_dp)[relabeled], np.asarray(out_1),
            rtol=2e-3, atol=1e-4,
        )
        assert np.isfinite(float(val))
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_edge_balanced_partition():
    """balance='edges' splits a skewed graph into ~equal edge counts and
    still reproduces single-chip results."""
    rng = np.random.default_rng(11)
    n, e, r = 240, 1200, 3
    # heavy skew: most edges land on the first 24 nodes
    dst = np.where(
        rng.random(e) < 0.7, rng.integers(0, 24, e), rng.integers(24, n, e)
    )
    src = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    n_parts = 4
    sgn, info_n = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    sge, info_e = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, balance="edges"
    )
    def shard_edges(sg, n_parts):
        counts = []
        for p in range(n_parts):
            gp = jax.tree.map(lambda a: a[p], sg)
            counts.append(int((np.asarray(gp.dst) < gp.num_nodes).sum()))
        return counts
    cn = shard_edges(sgn, n_parts)
    ce = shard_edges(sge, n_parts)
    assert sum(ce) == e
    assert max(ce) < max(cn)  # balanced beats node-uniform on skew
    assert max(ce) <= 1.35 * e / n_parts

    mesh = make_mesh(n_parts)
    sge = shard_stacked(sge, mesh)
    x = rng.standard_normal((n, 8), dtype=np.float32)
    x_pad = jnp.asarray(info_e.pad_node_data(x))
    layer = RGCNLayer(in_feat=8, out_feat=4, num_rels=r)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(0), sge, x_pad)
    out_dp = jax.jit(lambda p, xx: dp.apply(p, sge, xx))(params, x_pad)
    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    out_1 = layer.apply(params[0], g1, jnp.asarray(x))
    relabeled = info_e.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-3, atol=1e-4,
    )


@pytest.mark.parametrize("n_parts", [2, 4])
def test_boundary_halo_matches_single_chip(n_parts):
    """halo='boundary': shards index a compact [own | per-sender recv]
    source buffer, layers exchange only boundary rows via all_to_all —
    results must match the single-chip layer AND the padded boundary
    buffer must be smaller than the all-gather space on a partition-
    friendly graph."""
    from het_tpu.parallel import halo_bytes

    rng = np.random.default_rng(17)
    n, e, r = 256, 1000, 3
    # partition-friendly: ~85% of edges stay within a node-range block
    per_block = n // n_parts
    dst = rng.integers(0, n, e)
    local = rng.random(e) < 0.85
    src = np.where(
        local,
        (dst // per_block) * per_block + rng.integers(0, per_block, e),
        rng.integers(0, n, e),
    )
    rel = rng.integers(0, r, e)
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, halo="boundary"
    )
    g0 = jax.tree.map(lambda a: a[0], sg)
    assert g0.halo_send_idx is not None
    b = halo_bytes(g0, n_parts, feat_width=8)
    assert b["mode"] == "boundary"
    assert b["ici_bytes"] < b["gather_bytes"]
    sg = shard_stacked(sg, mesh)

    F, O = 8, 4
    x = rng.standard_normal((n, F), dtype=np.float32)
    x_pad = jnp.asarray(info.pad_node_data(x))
    layer = RGATLayer(in_feat=F, out_feat=O, num_rels=r, num_heads=2,
                      dropout=0.0)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(1), sg, x_pad)
    out_dp = jax.jit(lambda p, xx: dp.apply(p, sg, xx))(params, x_pad)

    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    out_1 = layer.apply(params[0], g1, jnp.asarray(x))
    relabeled = info.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-4, atol=1e-5,
    )

    # gradients flow through the all_to_all transpose
    def loss(p):
        return jnp.sum(dp.apply(p, sg, x_pad) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    g1_val = float(jnp.sum(layer.apply(params[0], g1, jnp.asarray(x)) ** 2))
    np.testing.assert_allclose(float(val), g1_val, rtol=1e-3)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # grads must also MATCH the single-chip grads (the exchange transpose
    # is a scatter-add over the boundary lists)
    def loss1(p):
        return jnp.sum(layer.apply(p, g1, jnp.asarray(x)) ** 2)

    g_single = jax.grad(loss1)(params[0])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        ),
        grads[0], g_single,
    )


def test_boundary_halo_two_layer_and_auto():
    """Two stacked layers re-exchange between layers; halo='auto' falls
    back to gather on a partition-hostile random graph."""
    rng = np.random.default_rng(23)
    n_parts = 4
    # dense random graph at exactly per=128: every pair's boundary list
    # approaches the full sender range -> auto falls back to gather
    nd, ed = 512, 16384
    sg_auto, _ = partition_by_dst(
        rng.integers(0, nd, ed), rng.integers(0, nd, ed),
        rng.integers(0, 3, ed), nd, 3, n_parts, tile=8, halo="auto",
    )
    assert jax.tree.map(lambda a: a[0], sg_auto).halo_send_idx is None
    # sparse local graph -> auto picks boundary
    n, e, r = 160, 640, 3
    src, dst, rel = (rng.integers(0, n, e), rng.integers(0, n, e),
                     rng.integers(0, r, e))
    sg_auto2, _ = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, halo="auto"
    )
    assert jax.tree.map(lambda a: a[0], sg_auto2).halo_send_idx is not None

    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, halo="boundary"
    )
    sg = shard_stacked(sg, mesh)
    F = 8
    x = rng.standard_normal((n, F), dtype=np.float32)
    x_pad = jnp.asarray(info.pad_node_data(x))
    layers = [
        RGCNLayer(in_feat=F, out_feat=8, num_rels=r, activation=jax.nn.relu),
        RGATLayer(in_feat=8, out_feat=4, num_rels=r, num_heads=1,
                  dropout=0.0),
    ]
    dp = DPGNN(layers, mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)
    out_dp = jax.jit(lambda p, xx: dp.apply(p, sg, xx))(params, x_pad)
    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    h = layers[0].apply(params[0], g1, jnp.asarray(x))
    out_1 = layers[1].apply(params[1], g1, h)
    relabeled = info.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-3, atol=1e-4,
    )


@pytest.mark.slow
def test_check_vma_value_and_grad():
    """shard_map runs vma-checked by default now (round-2 weak #8):
    replicated weights are pcast-to-varying at the custom_vjp wrappers
    (ops/common.py match_vma) so the transpose's psum is statically
    visible.  This exercises the previously-failing path — value_and_grad
    through edge_rel_inner's custom VJP (attn_l/attn_r grads) — with
    check_vma forced ON."""
    from het_tpu.parallel.dp import dp_apply, halo_gather

    src, dst, rel, n, r = _coo(seed=13, n=160, e=600)
    n_parts = 4
    mesh = make_mesh(n_parts)
    sg, info = partition_by_dst(src, dst, rel, n, r, n_parts, tile=8)
    sg = shard_stacked(sg, mesh)
    F = 8
    x_pad = jnp.asarray(
        info.pad_node_data(
            np.random.default_rng(0).standard_normal((n, F), dtype=np.float32)
        )
    )
    layer = RGATLayer(in_feat=F, out_feat=4, num_rels=r, num_heads=2,
                      dropout=0.0)
    dp = DPGNN([layer], mesh)
    params = dp.init(jax.random.PRNGKey(0), sg, x_pad)

    def fwd(p, g_local, x_loc):
        h_glob = halo_gather(x_loc)
        return layer.apply(p[0], g_local, h_glob, x_dst=x_loc)

    def loss(p):
        out = dp_apply(fwd, p, sg, x_pad, mesh, check_vma=True)
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_two_level_mesh_boundary_halo():
    """(host, chip) two-level mesh (make_mesh2): the boundary halo
    exchange runs over the axis PAIR, results match the single-chip
    layer, per-link-class bytes split ICI vs DCN, and the compiled HLO
    shows the exchange is data-independent of the local aggregation (the
    property XLA's latency-hiding scheduler needs to overlap them on
    ICI)."""
    from het_tpu.parallel import halo_bytes
    from het_tpu.parallel.dp import make_mesh2

    H, C = 2, 4
    n_parts = H * C
    rng = np.random.default_rng(23)
    n, e, r = 256, 1000, 3
    per_block = n // n_parts
    dst = rng.integers(0, n, e)
    local = rng.random(e) < 0.85
    src = np.where(
        local,
        (dst // per_block) * per_block + rng.integers(0, per_block, e),
        rng.integers(0, n, e),
    )
    rel = rng.integers(0, r, e)
    mesh = make_mesh2(H, C)
    axis = ("host", "chip")
    sg, info = partition_by_dst(
        src, dst, rel, n, r, n_parts, tile=8, halo="boundary"
    )
    g0 = jax.tree.map(lambda a: a[0], sg)
    b = halo_bytes(g0, n_parts, feat_width=8, chips_per_host=C)
    assert b["mode"] == "boundary"
    assert b["ici_bytes"] + b["dcn_bytes"] == (n_parts - 1) * int(
        g0.halo_send_idx.shape[-1]
    ) * 8 * 4
    # contiguous-range placement: intra-host peers are the C-1 nearest
    # shards, so ICI carries C-1 of the P-1 peer blocks
    assert b["ici_bytes"] == (C - 1) * int(
        g0.halo_send_idx.shape[-1]
    ) * 8 * 4
    sg = shard_stacked(sg, mesh, axis=axis)

    F, O = 8, 4
    x = rng.standard_normal((n, F), dtype=np.float32)
    x_pad = jnp.asarray(info.pad_node_data(x))
    layer = RGATLayer(in_feat=F, out_feat=O, num_rels=r, num_heads=2,
                      dropout=0.0)
    dp = DPGNN([layer], mesh, axis=axis)
    params = dp.init(jax.random.PRNGKey(1), sg, x_pad)
    step = jax.jit(lambda p, xx: dp.apply(p, sg, xx))
    out_dp = step(params, x_pad)

    g1 = build_heterograph(src, dst, rel, n, r, tile=8)
    out_1 = layer.apply(params[0], g1, jnp.asarray(x))
    relabeled = info.relabel(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(out_dp)[relabeled], np.asarray(out_1),
        rtol=2e-4, atol=1e-5,
    )

    # overlap structure: in the optimized HLO, the all-to-all must not
    # (transitively) depend on any dot/reduce that consumes its OUTPUT's
    # descendants — i.e. the exchange and the local segment matmuls are
    # parallel branches of the dataflow, so a latency-hiding schedule can
    # run them concurrently.  Cheap necessary check on text: the
    # all-to-all's operand chain contains no 'dot' ops.
    txt = step.lower(params, x_pad).compile().as_text()
    import re

    a2a = [ln for ln in txt.splitlines() if "all-to-all" in ln
           and "=" in ln]
    assert a2a, "boundary exchange did not lower to an all-to-all"
    # collect the operand names of the first all-to-all and walk back two
    # levels: none may be produced by a dot/custom-call (local compute)
    defs = {}
    for ln in txt.splitlines():
        m = re.match(r"\s*(%[\w.\-]+) = .*", ln)
        if m:
            defs[m.group(1)] = ln
    frontier = re.findall(r"%[\w.\-]+", a2a[0].split("=", 1)[1])
    seen = set()
    for _ in range(3):
        nxt = []
        for name in frontier:
            if name in seen or name not in defs:
                continue
            seen.add(name)
            ln = defs[name]
            assert " dot(" not in ln and "custom-call" not in ln, (
                f"all-to-all depends on local compute: {ln[:120]}"
            )
            nxt.extend(re.findall(r"%[\w.\-]+",
                                  ln.split("=", 1)[1]))
        frontier = nxt
