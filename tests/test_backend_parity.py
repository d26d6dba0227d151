"""Full-model parity between the XLA backend and the Pallas backend
(interpret mode on CPU): forward activations AND gradients must agree.
This is the framework-level analogue of the reference's oracle backend
(hrt/python/testing/ref_backend) swapped under the same model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import random_heterograph
from het_tpu import ops
from het_tpu.models import HGTLayer, RGATLayer, RGCNModel


@pytest.fixture
def pallas_backend():
    ops.set_backend("pallas")
    yield
    ops.set_backend("xla")


def _toy(seed=0):
    return random_heterograph(
        num_nodes=48, num_edges=400, num_rels=4, seed=seed, tile=8
    )


def _grads_close(model, params, g, x, tol=2e-4):
    def loss(p):
        return jnp.sum(model.apply(p, g, x) ** 2)

    ops.set_backend("xla")
    out_x = model.apply(params, g, x)
    g_x = jax.grad(loss)(params)
    ops.set_backend("pallas")
    out_p = model.apply(params, g, x)
    g_p = jax.grad(loss)(params)
    ops.set_backend("xla")
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=tol, atol=tol)
    jax.tree.map(
        lambda va, vb: np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=5e-3, atol=tol
        ),
        g_x,
        g_p,
    )


def test_rgat_layer_backend_parity(pallas_backend):
    g = _toy()
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 12))
    layer = RGATLayer(in_feat=12, out_feat=8, num_rels=g.num_rels,
                      num_heads=2, bias=False, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), g, x)
    _grads_close(layer, params, g, x)


def test_hgt_layer_backend_parity(pallas_backend):
    g = _toy(seed=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 8))
    layer = HGTLayer(in_dim=8, out_dim=8, num_ntypes=1, num_rels=g.num_rels,
                     num_heads=2, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), g, x)
    _grads_close(layer, params, g, x)


def test_rgcn_model_backend_parity(pallas_backend):
    g = _toy(seed=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 10))
    model = RGCNModel(num_nodes=g.num_nodes, hidden=8, num_classes=3,
                      num_rels=g.num_rels, featureless=False, in_feat=10)
    params = model.init(jax.random.PRNGKey(0), g, x)
    _grads_close(model, params, g, x)


def test_rgat_compact_layer_backend_parity(pallas_backend):
    """Compact path: the pallas backend's single-sided fused op
    (fused_softmax_agg_compact) against the XLA expand-then-aggregate
    composition — forward and parameter gradients."""
    g = _toy(seed=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 12))
    for mult in (False, True):
        layer = RGATLayer(in_feat=12, out_feat=8, num_rels=g.num_rels,
                          num_heads=2, bias=False, dropout=0.0,
                          compact=True, multiply_first=mult)
        params = layer.init(jax.random.PRNGKey(0), g, x)
        _grads_close(layer, params, g, x)


def test_rgcn_compact_backend_parity(pallas_backend):
    """RGCN compact path: single-sided compact_weighted_agg (pallas) vs
    expand-then-aggregate (xla)."""
    g = _toy(seed=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 10))
    model = RGCNModel(num_nodes=g.num_nodes, hidden=8, num_classes=3,
                      num_rels=g.num_rels, featureless=False, in_feat=10,
                      compact=True)
    params = model.init(jax.random.PRNGKey(0), g, x)
    _grads_close(model, params, g, x)


def test_hgt_compact_layer_backend_parity(pallas_backend):
    """HGT compact path: single-sided compact_dst_inner score (pallas) vs
    expand-then-inner-product (xla)."""
    g = _toy(seed=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 8))
    layer = HGTLayer(in_dim=8, out_dim=8, num_ntypes=1, num_rels=g.num_rels,
                     num_heads=2, dropout=0.0, compact=True)
    params = layer.init(jax.random.PRNGKey(0), g, x)
    _grads_close(layer, params, g, x)


def test_compact_single_sided_op_parity(pallas_backend):
    """Op-level grads for the two single-sided compact ops added in round 2:
    rgcn_aggregate_compact (weighted mean aggregation from compact rows)
    and compact_dst_inner (compact SDDMM)."""
    g = _toy(seed=7)
    UCs = g.compact_src.seg.n_rows
    UCd = g.compact_dst.seg.n_rows
    H, dk, C = 2, 6, 10
    feat_c = jax.random.normal(jax.random.PRNGKey(2), (UCs, C))
    norm_e = ops.rgcn_norm(g)
    c_dst = jax.random.normal(jax.random.PRNGKey(3), (UCd, H, dk))
    x_src = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, H, dk))

    def run_agg(fc, ne):
        return jnp.sum(ops.rgcn_aggregate_compact(g, fc, ne) ** 2)

    def run_inner(c, x):
        s = ops.compact_dst_inner(g, c, x)
        return jnp.sum(g.edge_mask(s) ** 2)

    for fn, args in ((run_agg, (feat_c, norm_e)), (run_inner, (c_dst, x_src))):
        ops.set_backend("xla")
        vx = fn(*args)
        gx = jax.grad(fn, argnums=(0, 1))(*args)
        ops.set_backend("pallas")
        vp = fn(*args)
        gp = jax.grad(fn, argnums=(0, 1))(*args)
        np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
        for a, b in zip(gx, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-4)


def test_fused_compact_op_parity(pallas_backend):
    """Op-level: relational_fused_gat_compact pallas vs xla, grads wrt all
    three compact inputs, under both clip and raw softmax modes."""
    g = _toy(seed=4)
    H, D = 2, 6
    UCs = g.compact_src.seg.n_rows
    UCd = g.compact_dst.seg.n_rows
    k = jax.random.PRNGKey(2)
    feat_c = jax.random.normal(k, (UCs, H, D))
    el_c = jax.random.normal(jax.random.PRNGKey(3), (UCs, H)) * 0.3
    er_c = jax.random.normal(jax.random.PRNGKey(4), (UCd, H)) * 0.3

    for stable in (False, "clip"):
        def run(fc, el, er):
            out = ops.relational_fused_gat_compact(
                g, fc, el, er, 0.2, stable=stable)
            return jnp.sum(out ** 2)

        ops.set_backend("xla")
        vx = run(feat_c, el_c, er_c)
        gx = jax.grad(run, argnums=(0, 1, 2))(feat_c, el_c, er_c)
        ops.set_backend("pallas")
        vp = run(feat_c, el_c, er_c)
        gp = jax.grad(run, argnums=(0, 1, 2))(feat_c, el_c, er_c)
        np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
        for a, b in zip(gx, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-4)


def test_packed_compact_op_parity(pallas_backend):
    """The packed-operand compact fused op (memory form, auto-selected
    above models.rgat.PACKED_COMPACT_ROWS rows) must match the split form
    exactly — fwd, d_fe, and d_er."""
    g = _toy(seed=11)
    H, D = 2, 6
    UCs = g.compact_src.seg.n_rows
    UCd = g.compact_dst.seg.n_rows
    fe = jax.random.normal(jax.random.PRNGKey(5), (UCs, H, 1 + D)) * 0.4
    er_c = jax.random.normal(jax.random.PRNGKey(6), (UCd, H)) * 0.3

    def run_packed(fe_, er_):
        out = ops.relational_fused_gat_compact_packed(
            g, fe_, er_, 0.2, stable="clip")
        return jnp.sum(out ** 2)

    def run_split(fe_, er_):
        out = ops.relational_fused_gat_compact(
            g, fe_[..., 1:], fe_[..., 0], er_, 0.2, stable="clip")
        return jnp.sum(out ** 2)

    vp = run_packed(fe, er_c)
    gp = jax.grad(run_packed, argnums=(0, 1))(fe, er_c)
    vs = run_split(fe, er_c)
    gs = jax.grad(run_split, argnums=(0, 1))(fe, er_c)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-5)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    # and against the XLA lowering
    ops.set_backend("xla")
    vx = run_packed(fe, er_c)
    gx = jax.grad(run_packed, argnums=(0, 1))(fe, er_c)
    ops.set_backend("pallas")
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-4)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_hgt_fused_compact_attention_parity(pallas_backend):
    """The fully-fused HGT compact attention chain vs the unfused XLA
    composition: fwd + grads wrt (msg_c, attq_c, k, mu)."""
    g = _toy(seed=13)
    H, dk = 2, 4
    UCs = g.compact_src.seg.n_rows
    UCd = g.compact_dst.seg.n_rows
    msg_c = jax.random.normal(jax.random.PRNGKey(7), (UCs, H, dk)) * 0.5
    attq_c = jax.random.normal(jax.random.PRNGKey(8), (UCd, H, dk)) * 0.5
    k_n = jax.random.normal(jax.random.PRNGKey(9), (g.num_nodes, H, dk)) * 0.5
    mu = jax.random.uniform(jax.random.PRNGKey(10), (g.num_rels, H)) + 0.5

    def run(mc, aq, kk, m):
        out = ops.hgt_compact_attention(g, mc, aq, kk, m, stable="clip")
        return jnp.sum(out ** 2)

    args = (msg_c, attq_c, k_n, mu)
    ops.set_backend("xla")
    vx = run(*args)
    gx = jax.grad(run, argnums=(0, 1, 2, 3))(*args)
    ops.set_backend("pallas")
    vp = run(*args)
    gp = jax.grad(run, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


@pytest.mark.parametrize(
    "H,D",
    [
        (2, 8),  # HD=16: wide-path fold widths 16 vs 32 in fwd AND bwd
        (2, 6),  # HD=12: narrow fwd (H+HD=14<=16) AND narrow bwd (16<=16)
        (4, 7),  # HD=28: narrow fwd (32<=32), wide bwd (HD+2H=36>32)
    ],
)
def test_gat_node_fused_parity(pallas_backend, H, D):
    """Node-sided fused GAT vs the gather-then-aggregate XLA composition:
    fwd + grads wrt (feat, el, er).  Configs cover both sides of the
    _fold_width narrow/wide branch in forward and backward."""
    g = _toy(seed=17)
    feat = jax.random.normal(jax.random.PRNGKey(11), (g.num_nodes, H, D))
    el = jax.random.normal(jax.random.PRNGKey(12), (g.num_nodes, H)) * 0.3
    er = jax.random.normal(jax.random.PRNGKey(13), (g.num_nodes, H)) * 0.3

    def run(f, l, r):
        out = ops.gat_node_fused(g, f, l, r, 0.2, stable="clip")
        return jnp.sum(out ** 2)

    ops.set_backend("xla")
    vx = run(feat, el, er)
    gx = jax.grad(run, argnums=(0, 1, 2))(feat, el, er)
    ops.set_backend("pallas")
    vp = run(feat, el, er)
    gp = jax.grad(run, argnums=(0, 1, 2))(feat, el, er)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_hgt_fused_plain_attention_parity(pallas_backend):
    """The fused PLAIN-path HGT attention chain (score SDDMM
    q[dst]·W_att[rel]·k[src] + typed softmax + aggregation in one
    custom-VJP op) vs the unfused XLA composition: fwd + grads wrt
    (msg_e, q, k, w_att, mu)."""
    g = _toy(seed=17)
    H, dk = 2, 4
    EP = g.num_padded_edges
    msg_e = g.edge_mask(
        jax.random.normal(jax.random.PRNGKey(3), (EP, H, dk)) * 0.5
    )
    q_n = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, H, dk)) * 0.5
    k_n = jax.random.normal(jax.random.PRNGKey(5), (g.num_nodes, H, dk)) * 0.5
    w_att = jax.random.normal(
        jax.random.PRNGKey(6), (g.num_rels, H, dk, dk)
    ) * 0.4
    mu = jax.random.uniform(jax.random.PRNGKey(7), (g.num_rels, H)) + 0.5

    def run(me, qq, kk, w, m):
        out = ops.hgt_plain_attention(g, me, qq, kk, w, m, stable="clip")
        return jnp.sum(out ** 2)

    args = (msg_e, q_n, k_n, w_att, mu)
    ops.set_backend("xla")
    vx = run(*args)
    gx = jax.grad(run, argnums=(0, 1, 2, 3, 4))(*args)
    ops.set_backend("pallas")
    vp = run(*args)
    gp = jax.grad(run, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_hgt_fused_plain_full_parity(pallas_backend):
    """The fully-fused plain-path HGT core (message transform + score
    SDDMM + typed softmax + aggregation in one custom-VJP op) vs the
    unfused XLA composition: fwd + grads wrt (v, q, k, w_msg, w_att, mu)."""
    g = _toy(seed=19)
    H, dk = 2, 4
    v_n = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, H, dk)) * 0.5
    q_n = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, H, dk)) * 0.5
    k_n = jax.random.normal(jax.random.PRNGKey(5), (g.num_nodes, H, dk)) * 0.5
    w_msg = jax.random.normal(
        jax.random.PRNGKey(8), (g.num_rels, H, dk, dk)
    ) * 0.4
    w_att = jax.random.normal(
        jax.random.PRNGKey(6), (g.num_rels, H, dk, dk)
    ) * 0.4
    mu = jax.random.uniform(jax.random.PRNGKey(7), (g.num_rels, H)) + 0.5

    def run(vv, qq, kk, wm, wa, m):
        out = ops.hgt_plain_layer_core(
            g, vv, qq, kk, wm, wa, m, stable="clip"
        )
        return jnp.sum(out ** 2)

    args = (v_n, q_n, k_n, w_msg, w_att, mu)
    ops.set_backend("xla")
    vx = run(*args)
    gx = jax.grad(run, argnums=tuple(range(6)))(*args)
    ops.set_backend("pallas")
    vp = run(*args)
    gp = jax.grad(run, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-4)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


@pytest.mark.parametrize("H,D,F", [(2, 4, 4), (4, 8, 8), (1, 6, 3)])
def test_gat_layer_core_parity(pallas_backend, H, D, F):
    """The fully-fused GAT layer core (projection inside the op; backward
    reassociations for dW/dx) must match the composed XLA path in fwd AND
    all four gradients."""
    from het_tpu import ops

    g = random_heterograph(
        num_nodes=96, num_edges=420, num_rels=1, seed=31, tile=8
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, F), dtype=np.float32))
    w = jnp.asarray(
        rng.standard_normal((F, H * D), dtype=np.float32) * 0.4
    )
    al = jnp.asarray(rng.standard_normal((H, D), dtype=np.float32) * 0.4)
    ar = jnp.asarray(rng.standard_normal((H, D), dtype=np.float32) * 0.4)

    def run(xx, ww, a, b):
        return ops.gat_layer_core(g, xx, ww, a, b, 0.2, stable="clip")

    def loss(args):
        return jnp.sum(run(*args) ** 2)

    ops.set_backend("xla")
    out_x = run(x, w, al, ar)
    gx = jax.grad(loss)((x, w, al, ar))
    ops.set_backend("pallas")
    try:
        out_p = run(x, w, al, ar)
        gp = jax.grad(loss)((x, w, al, ar))
    finally:
        ops.set_backend("xla")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=1e-5
    )
    for a, b, name in zip(gp, gx, ("dx", "dW", "d_al", "d_ar")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=name,
        )
