"""XLA op-path correctness vs dense numpy oracles (reference pattern:
hrt/python/testing/ref_kernels_lite + check_equal rtol=1e-3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import random_heterograph
from het_tpu import ops
from . import oracle


def _toy(seed=0, **kw):
    kw.setdefault("num_nodes", 50)
    kw.setdefault("num_edges", 300)
    kw.setdefault("num_rels", 5)
    return random_heterograph(seed=seed, tile=8, **kw)


def _allclose(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.parametrize("side", ["src", "dst"])
@pytest.mark.parametrize("heads", [1, 4])
def test_edge_typed_linear(side, heads, rng):
    g = _toy()
    x = rng.standard_normal((g.num_nodes, 16), dtype=np.float32)
    w = rng.standard_normal((g.num_rels, heads, 16, 8), dtype=np.float32)
    y = ops.edge_typed_linear(g, jnp.asarray(x), jnp.asarray(w), side=side)
    assert y.shape == (g.num_padded_edges, heads, 8)
    ref = oracle.typed_linear_edges(g, x, w, side=side)
    _allclose(y[: g.num_edges], ref)
    # padding edges exactly zero
    assert np.all(np.asarray(y)[g.num_edges :] == 0)


def test_edge_typed_linear_per_head_input(rng):
    g = _toy(seed=3)
    H = 2
    x = rng.standard_normal((g.num_nodes, H, 16), dtype=np.float32)
    w = rng.standard_normal((g.num_rels, H, 16, 8), dtype=np.float32)
    y = ops.edge_typed_linear(g, jnp.asarray(x), jnp.asarray(w))
    ref = oracle.typed_linear_edges(g, x, w)
    _allclose(y[: g.num_edges], ref)


def test_compact_typed_linear_matches_edge(rng):
    """Compact materialization must be numerically identical to the per-edge
    path once expanded (Hector's key invariant)."""
    g = _toy(seed=1)
    x = rng.standard_normal((g.num_nodes, 16), dtype=np.float32)
    w = rng.standard_normal((g.num_rels, 2, 16, 8), dtype=np.float32)
    per_edge = ops.edge_typed_linear(g, jnp.asarray(x), jnp.asarray(w))
    compact = ops.compact_typed_linear(g, jnp.asarray(x), jnp.asarray(w))
    expanded = ops.expand_compact(g, compact, side="src")
    _allclose(
        expanded[: g.num_edges], per_edge[: g.num_edges], rtol=1e-5
    )


def test_ntype_linear(rng):
    g = _toy(seed=2, num_nodes=60, ntype_offsets=(0, 10, 35, 60))
    x = rng.standard_normal((60, 12), dtype=np.float32)
    w = rng.standard_normal((3, 2, 12, 6), dtype=np.float32)
    y = ops.ntype_linear(g, jnp.asarray(x), jnp.asarray(w))
    ref = oracle.ntype_linear(g, x, w)
    _allclose(y, ref)


def test_inner_product(rng):
    g = _toy(seed=4)
    left = rng.standard_normal((g.num_padded_edges, 2, 8), dtype=np.float32)
    right = rng.standard_normal((g.num_nodes, 2, 8), dtype=np.float32)
    got = ops.inner_product_edge_node(g, jnp.asarray(left), jnp.asarray(right))
    ref = oracle.inner_product(g, left, right, side="dst")
    _allclose(got[: g.num_edges], ref)


@pytest.mark.parametrize("stable", [False, True])
def test_fused_gat(stable, rng):
    g = _toy(seed=5)
    H, D = 2, 8
    feat = rng.standard_normal((g.num_padded_edges, H, D), dtype=np.float32)
    el = rng.standard_normal((g.num_padded_edges, H), dtype=np.float32)
    er = rng.standard_normal((g.num_padded_edges, H), dtype=np.float32)
    out = ops.relational_fused_gat(
        g, jnp.asarray(feat), jnp.asarray(el), jnp.asarray(er), 0.2,
        stable=stable,
    )
    ref = oracle.fused_gat(g, feat, el, er, 0.2)
    _allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_fused_gat_grads_finite(rng):
    """Gradients must be finite and padding-clean."""
    g = _toy(seed=6)
    H, D = 2, 4
    feat = jnp.asarray(rng.standard_normal((g.num_padded_edges, H, D), dtype=np.float32))
    el = jnp.asarray(rng.standard_normal((g.num_padded_edges, H), dtype=np.float32))
    er = jnp.asarray(rng.standard_normal((g.num_padded_edges, H), dtype=np.float32))

    def loss(f, a, b):
        return jnp.sum(ops.relational_fused_gat(g, f, a, b, 0.2) ** 2)

    gf, ga, gb = jax.grad(loss, argnums=(0, 1, 2))(feat, el, er)
    for gr in (gf, ga, gb):
        assert np.all(np.isfinite(np.asarray(gr)))
        # padding-edge grads must be zero
        assert np.all(np.asarray(gr)[g.num_edges :] == 0)


def test_hgt_softmax_agg(rng):
    g = _toy(seed=7)
    H, D = 2, 8
    msg = rng.standard_normal((g.num_padded_edges, H, D), dtype=np.float32)
    sc = rng.standard_normal((g.num_padded_edges, H), dtype=np.float32)
    mu = rng.standard_normal((g.num_rels, H), dtype=np.float32)
    out = ops.hgt_softmax_weighted_agg(
        g, jnp.asarray(msg), jnp.asarray(sc), jnp.asarray(mu)
    )
    ref = oracle.hgt_softmax_agg(g, msg, sc, mu)
    _allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_rgcn_layer1(rng):
    g = _toy(seed=8)
    x = rng.standard_normal((g.num_nodes, 12), dtype=np.float32)
    w = rng.standard_normal((g.num_rels, 12, 6), dtype=np.float32)
    norm = ops.rgcn_norm(g)
    out = ops.rgcn_layer1(g, jnp.asarray(x), jnp.asarray(w), norm)
    ref = oracle.rgcn_layer1(g, x, w, np.asarray(norm))
    _allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_scatter_sum_src(rng):
    g = _toy(seed=9)
    vals = rng.standard_normal((g.num_padded_edges, 4), dtype=np.float32)
    got = ops.scatter_sum_src(g, jnp.asarray(vals))
    src = np.asarray(g.src)[: g.num_edges]
    ref = np.zeros((g.num_nodes, 4))
    for e in range(g.num_edges):
        ref[src[e]] += vals[e]
    _allclose(got, ref, rtol=1e-4, atol=1e-5)
