"""End-to-end ACCURACY parity against independent dense-math training.

BASELINE.md asks for accuracy parity with the reference models, but the
reference tree ships no labels (hrt/data/ogbn_mag_0.1 holds only COO shards
— see docs/BASELINE_STATUS.md), so the checkable artifact is this test: the
framework-trained model must match a from-scratch DENSE implementation of
the same math (per-relation dense adjacency matmuls — no segment machinery,
no shared code with het_tpu/ops) trained side by side from identical
parameters on planted-structure synthetic data: per-step losses allclose
and final train/test accuracy equal within tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from het_tpu.data import load_dataset
from het_tpu.models import RGCNModel


def _dense_operators(g):
    """P[r][d, s] = multiplicity(s->r->d) / in_deg(d) as dense matrices."""
    E = g.num_edges
    src = np.asarray(g.src)[:E]
    dst = np.asarray(g.dst)[:E]
    rel = np.asarray(g.rel)[:E]
    n, R = g.num_nodes, g.num_rels
    indeg = np.maximum(np.bincount(dst, minlength=n), 1)
    P = np.zeros((R, n, n), dtype=np.float32)
    np.add.at(P, (rel, dst, src), 1.0)
    P /= indeg[None, :, None]
    return jnp.asarray(P)


def test_rgcn_accuracy_parity_vs_dense_math():
    data = load_dataset("aifb", scale=0.02, num_classes=4, seed=0, tile=8)
    g = data.graph
    F, HID = 12, 16
    model = RGCNModel(
        num_nodes=g.num_nodes, hidden=HID, num_classes=4,
        num_rels=g.num_rels, featureless=False, in_feat=F, dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, F))
    params = model.init(jax.random.PRNGKey(1), g, x)
    labels = jnp.asarray(data.labels, jnp.int32)
    train_idx = jnp.asarray(data.train_idx, jnp.int32)
    test_idx = jnp.asarray(data.test_idx, jnp.int32)

    P = _dense_operators(g)
    flat = jax.tree_util.tree_leaves_with_path(params)
    dense_params = {
        "/".join(str(k) for k in path): leaf for path, leaf in flat
    }
    (k1,) = [k for k in dense_params if "RGCNLayer_0" in k and "weight" in k]
    (b1,) = [k for k in dense_params if "RGCNLayer_0" in k and "bias" in k]
    (k2,) = [k for k in dense_params if "RGCNLayer_1" in k and "weight" in k]
    (b2,) = [k for k in dense_params if "RGCNLayer_1" in k and "bias" in k]

    def dense_forward(p, x):
        # out[d] = sum_r P[r] @ (x @ W[r]) — independent dense math
        h = jnp.einsum("rds,sk,rko->do", P, x, p[k1]) + p[b1]
        h = jax.nn.relu(h)
        return jnp.einsum("rds,sk,rko->do", P, h, p[k2]) + p[b2]

    def make_train(forward, params):
        tx = optax.adam(5e-2)
        opt = tx.init(params)

        def loss_fn(p):
            logp = jax.nn.log_softmax(forward(p, x), axis=-1)
            ll = jnp.take(logp, train_idx, axis=0)
            ly = jnp.take(labels, train_idx, axis=0)
            return -jnp.mean(jnp.take_along_axis(ll, ly[:, None], axis=1))

        @jax.jit
        def step(p, opt):
            l, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, l

        return step, params, opt

    def acc(forward, p, idx):
        pred = jnp.argmax(forward(p, x), axis=-1)
        return float(jnp.mean(
            (jnp.take(pred, idx) == jnp.take(labels, idx)).astype(
                jnp.float32)))

    fwd_frame = lambda p, xx: model.apply(p, g, xx)  # noqa: E731
    step_a, pa, oa = make_train(fwd_frame, params)
    step_b, pb, ob = make_train(dense_forward, dense_params)
    losses_a, losses_b = [], []
    for _ in range(30):
        pa, oa, la = step_a(pa, oa)
        pb, ob, lb = step_b(pb, ob)
        losses_a.append(float(la))
        losses_b.append(float(lb))
    # identical math, identical init -> loss trajectories track tightly
    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-2, atol=2e-3)
    ta, sa = acc(fwd_frame, pa, train_idx), acc(fwd_frame, pa, test_idx)
    tb, sb = acc(dense_forward, pb, train_idx), acc(dense_forward, pb,
                                                   test_idx)
    assert ta > 0.5, ta  # planted labels are learnable
    assert abs(ta - tb) <= 0.05 and abs(sa - sb) <= 0.08, (ta, tb, sa, sb)
