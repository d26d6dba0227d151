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
