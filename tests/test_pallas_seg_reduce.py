"""Pallas dst-segment-sum kernel vs XLA segment_sum (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import random_heterograph
from het_tpu import ops
from het_tpu.ops.pallas.seg_reduce import seg_sum_dst_pallas, seg_sum_dst_pallas_raw


def _toy(seed=0, **kw):
    kw.setdefault("num_nodes", 50)
    kw.setdefault("num_edges", 600)
    kw.setdefault("num_rels", 4)
    return random_heterograph(seed=seed, tile=8, **kw)


@pytest.mark.parametrize("C", [4, 64])
def test_seg_sum_matches_xla(C, rng):
    g = _toy()
    vals = jnp.asarray(
        rng.standard_normal((g.num_padded_edges, C), dtype=np.float32)
    )
    want = ops.scatter_sum_nodes(vals, g.dst, g.num_nodes,
                                 indices_are_sorted=True)
    got = seg_sum_dst_pallas_raw(g, vals, interpret=True, nb=16, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_seg_sum_power_law(rng):
    # hub-heavy graph: one node tile processes most edges
    g = _toy(seed=1, power_law=True, num_edges=2000)
    vals = jnp.asarray(
        rng.standard_normal((g.num_padded_edges, 8), dtype=np.float32)
    )
    want = ops.scatter_sum_nodes(vals, g.dst, g.num_nodes,
                                 indices_are_sorted=True)
    got = seg_sum_dst_pallas_raw(g, vals, interpret=True, nb=16, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_seg_sum_grad_is_gather(rng):
    g = _toy(seed=2)
    vals = jnp.asarray(
        rng.standard_normal((g.num_padded_edges, 2, 4), dtype=np.float32)
    )

    def loss_p(v):
        return jnp.sum(seg_sum_dst_pallas(g, v) ** 2)

    def loss_x(v):
        return jnp.sum(ops.scatter_sum_nodes(
            v, g.dst, g.num_nodes, indices_are_sorted=True) ** 2)

    gp = jax.grad(loss_p)(vals)
    gx = jax.grad(loss_x)(vals)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(gp)[g.num_edges:] == 0)


def test_seg_max_matches_xla(rng):
    from het_tpu.ops.pallas.seg_reduce import seg_max_dst_pallas_raw

    g = _toy(seed=4)
    vals = jnp.asarray(
        rng.standard_normal((g.num_padded_edges, 4), dtype=np.float32)
    )
    # mask padding lanes to -inf like the stable-softmax caller does
    masked = jnp.where(g.edge_valid[:, None], vals, -jnp.inf)
    want = jax.ops.segment_max(
        masked, g.dst, num_segments=g.num_nodes + 1, indices_are_sorted=True
    )[: g.num_nodes]
    want = np.where(np.isfinite(np.asarray(want)), np.asarray(want), 0.0)
    got = seg_max_dst_pallas_raw(g, masked, interpret=True, nb=16, chunk=128)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_bf16_payload_single_pass():
    """bf16 payloads take the single-pass MXU path; sums of bf16 values in
    the f32 accumulator are exact (equal to summing upcast f32 values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from het_tpu.graph import random_heterograph
    from het_tpu.ops.pallas.seg_reduce import seg_sum_dst_pallas

    g = random_heterograph(num_nodes=48, num_edges=500, num_rels=3, tile=8)
    vals = jax.random.normal(
        jax.random.PRNGKey(0), (g.num_padded_edges, 5)
    ).astype(jnp.bfloat16)
    got = seg_sum_dst_pallas(g, vals)
    assert got.dtype == jnp.bfloat16
    want = jax.ops.segment_sum(
        g.edge_mask(vals).astype(jnp.float32), g.dst,
        num_segments=g.num_nodes + 1, indices_are_sorted=True,
    )[: g.num_nodes]
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want),
        rtol=8e-3, atol=1e-2,  # one final f32->bf16 round on the output
    )
    # grads flow with matching dtype
    gr = jax.grad(lambda v: jnp.sum(seg_sum_dst_pallas(g, v) ** 2))(vals)
    assert gr.dtype == jnp.bfloat16


def test_extreme_degree_skew():
    """A hub node holding half of all edges (the MySegmentCSR scenario,
    reference MyHyb.h:480) must reduce exactly — the chunk loop covers
    arbitrarily long per-node edge ranges."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from het_tpu.graph import build_heterograph
    from het_tpu.ops.pallas.seg_reduce import seg_sum_dst_pallas_raw

    rng = np.random.default_rng(0)
    n, e = 64, 4000
    dst = np.where(rng.random(e) < 0.5, 3, rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    g = build_heterograph(src, dst, rng.integers(0, 3, e), n, 3, tile=8,
                          build_compact=False)
    vals = jax.random.normal(jax.random.PRNGKey(1),
                             (g.num_padded_edges, 6))
    got = seg_sum_dst_pallas_raw(g, vals)
    want = jax.ops.segment_sum(
        g.edge_mask(vals), g.dst, num_segments=g.num_nodes + 1,
        indices_are_sorted=True)[: g.num_nodes]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert int(np.asarray(g.in_deg)[3]) > 1500
