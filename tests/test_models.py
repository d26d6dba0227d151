"""Model-level tests: init/apply, flag-equivalence (compact and
multiply_first must match the default path — Hector's key invariants),
gradient health."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import random_heterograph
from het_tpu.models import (
    GATModel,
    HGTLayer,
    HGTModel,
    RGATLayer,
    RGATModel,
    RGCNModel,
)


def _toy(seed=0, **kw):
    kw.setdefault("num_nodes", 40)
    kw.setdefault("num_edges", 200)
    kw.setdefault("num_rels", 4)
    return random_heterograph(seed=seed, tile=8, **kw)


def _x(g, dim, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (g.num_nodes, dim))


@pytest.mark.slow
def test_rgat_forward_and_grad():
    g = _toy()
    x = _x(g, 16)
    model = RGATModel(
        in_feat=16, hidden=8, num_classes=4, num_rels=g.num_rels,
        num_heads=2, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    assert out.shape == (g.num_nodes, 4)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        return jnp.sum(model.apply(p, g, x) ** 2)

    grads = jax.grad(loss)(params)
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(grads)
    )


@pytest.mark.parametrize("multiply_first", [False, True])
def test_rgat_compact_matches_default(multiply_first):
    """compact materialization must not change the numerics (rounding
    aside) — the core Hector correctness claim."""
    g = _toy(seed=1)
    x = _x(g, 12)
    kw = dict(in_feat=12, out_feat=8, num_rels=g.num_rels, num_heads=2,
              bias=False, dropout=0.0)
    base = RGATLayer(**kw)
    params = base.init(jax.random.PRNGKey(0), g, x)
    out_base = base.apply(params, g, x)
    variant = RGATLayer(compact=True, multiply_first=multiply_first, **kw)
    out_v = variant.apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_v), rtol=2e-3, atol=1e-4
    )


def test_rgat_multiply_first_matches_default():
    g = _toy(seed=2)
    x = _x(g, 12)
    kw = dict(in_feat=12, out_feat=8, num_rels=g.num_rels, num_heads=2,
              bias=False, dropout=0.0)
    base = RGATLayer(**kw)
    params = base.init(jax.random.PRNGKey(0), g, x)
    out_base = base.apply(params, g, x)
    out_mf = RGATLayer(multiply_first=True, **kw).apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_mf), rtol=2e-3, atol=1e-4
    )


def test_hgt_forward_variants():
    g = _toy(seed=3, num_nodes=45, ntype_offsets=(0, 15, 45))
    x = _x(g, 16)
    kw = dict(in_dim=16, out_dim=16, num_ntypes=2, num_rels=g.num_rels,
              num_heads=2, dropout=0.0)
    base = HGTLayer(**kw)
    params = base.init(jax.random.PRNGKey(0), g, x)
    out = base.apply(params, g, x)
    assert out.shape == (g.num_nodes, 16)
    # compact path must match
    out_c = HGTLayer(compact=True, **kw).apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_c), rtol=2e-3, atol=1e-4
    )


def test_hgt_multiply_first_matches_default():
    # rels: 0,1 from t0->t0 is wrong for typed weights; build a graph whose
    # relations connect fixed ntypes so reassociation is well-defined
    rng = np.random.default_rng(0)
    n0, n1 = 20, 25
    N = n0 + n1
    E = 150
    rel = rng.integers(0, 2, E)
    src = np.where(rel == 0, rng.integers(0, n0, E), rng.integers(n0, N, E))
    dst = np.where(rel == 0, rng.integers(n0, N, E), rng.integers(0, n0, E))
    from het_tpu.graph import build_heterograph

    g = build_heterograph(
        src, dst, rel, N, 2, ntype_offsets=(0, n0, N), tile=8
    )
    x = _x(g, 16)
    kw = dict(in_dim=16, out_dim=16, num_ntypes=2, num_rels=2, num_heads=2,
              dropout=0.0)
    base = HGTLayer(**kw)
    params = base.init(jax.random.PRNGKey(0), g, x)
    out = base.apply(params, g, x)
    out_mf = HGTLayer(
        multiply_first=True,
        src_ntype_per_rel=(0, 1),
        dst_ntype_per_rel=(1, 0),
        **kw,
    ).apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_mf), rtol=2e-3, atol=1e-4
    )


def test_hgt_model_stack():
    g = _toy(seed=4)
    x = _x(g, 8)
    model = HGTModel(
        in_dim=8, hidden=8, num_classes=5, num_ntypes=1,
        num_rels=g.num_rels, num_heads=1, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    assert out.shape == (g.num_nodes, 5)


@pytest.mark.parametrize("featureless", [True, False])
def test_rgcn_model(featureless):
    g = _toy(seed=5)
    model = RGCNModel(
        num_nodes=g.num_nodes, hidden=8, num_classes=3,
        num_rels=g.num_rels, featureless=featureless, in_feat=10,
    )
    x = None if featureless else _x(g, 10)
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    assert out.shape == (g.num_nodes, 3)

    def loss(p):
        return jnp.sum(model.apply(p, g, x) ** 2)

    grads = jax.grad(loss)(params)
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(grads)
    )


def test_rgcn_compact_matches_default():
    g = _toy(seed=6)
    x = _x(g, 10)
    model = RGCNModel(
        num_nodes=g.num_nodes, hidden=8, num_classes=3, num_rels=g.num_rels,
        featureless=False, in_feat=10,
    )
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    model_c = RGCNModel(
        num_nodes=g.num_nodes, hidden=8, num_classes=3, num_rels=g.num_rels,
        featureless=False, in_feat=10, compact=True,
    )
    out_c = model_c.apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_c), rtol=2e-3, atol=1e-4
    )


def test_gat_model():
    g = _toy(seed=7, num_rels=1)
    x = _x(g, 12)
    model = GATModel(in_feat=12, hidden=8, num_classes=3, num_heads=2)
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    assert out.shape == (g.num_nodes, 3)
    assert np.all(np.isfinite(np.asarray(out)))
