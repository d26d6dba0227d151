"""Pallas segment-matmul kernels vs the XLA path and numpy oracle, run in
interpreter mode on CPU (reference pattern: oracle-vs-kernel allclose)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import build_segments, random_heterograph
from het_tpu import ops
from het_tpu.ops.linear import segment_matmul_rows
from het_tpu.ops.pallas.segment_mm import (
    segment_matmul_rows_dw,
    segment_matmul_rows_dx,
    segment_matmul_rows_fwd,
    segment_matmul_rows_pallas,
)


def _seg(n_src=100, n_segments=5, tile=8, seed=0):
    rng = np.random.default_rng(seed)
    return build_segments(rng.integers(0, n_segments, n_src), n_segments, tile)


@pytest.mark.parametrize("xdim", ["2d", "3d1", "3dH"])
@pytest.mark.parametrize("heads", [1, 3])
def test_fwd_matches_xla(xdim, heads, rng):
    seg = _seg()
    K, O = 16, 8
    if xdim == "2d":
        x = rng.standard_normal((seg.n_rows, K), dtype=np.float32)
    elif xdim == "3d1":
        x = rng.standard_normal((seg.n_rows, 1, K), dtype=np.float32)
    else:
        x = rng.standard_normal((seg.n_rows, heads, K), dtype=np.float32)
    w = rng.standard_normal((seg.n_segments, heads, K, O), dtype=np.float32)
    got = segment_matmul_rows_fwd(jnp.asarray(x), jnp.asarray(w), seg,
                                  interpret=True)
    want = segment_matmul_rows(jnp.asarray(x), jnp.asarray(w), seg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("xdim", ["2d", "3d1", "3dH"])
def test_grads_match_xla(xdim, rng):
    seg = _seg(seed=1)
    K, O, H = 12, 8, 2
    if xdim == "2d":
        x = rng.standard_normal((seg.n_rows, K), dtype=np.float32)
    elif xdim == "3d1":
        x = rng.standard_normal((seg.n_rows, 1, K), dtype=np.float32)
    else:
        x = rng.standard_normal((seg.n_rows, H, K), dtype=np.float32)
    w = rng.standard_normal((seg.n_segments, H, K, O), dtype=np.float32)
    ct = rng.standard_normal((seg.n_rows, H, O), dtype=np.float32)
    # zero x on padding rows (the invariant the real pipeline guarantees)
    x = np.where(
        np.asarray(seg.row_valid).reshape((-1,) + (1,) * (x.ndim - 1)), x, 0
    )
    # zero ct on padding rows (nothing reads them back)
    ct = np.where(np.asarray(seg.row_valid)[:, None, None], ct, 0)

    def loss_xla(x, w):
        return jnp.sum(segment_matmul_rows(x, w, seg) * ct)

    def loss_pl(x, w):
        return jnp.sum(segment_matmul_rows_pallas(x, w, seg) * ct)

    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    gx_p, gw_p = jax.grad(loss_pl, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-4)


def test_empty_segments(rng):
    # segments with zero rows must not break scheduling
    seg = build_segments(np.array([3, 3, 3, 0]), 6, 8)
    x = rng.standard_normal((seg.n_rows, 8), dtype=np.float32)
    w = rng.standard_normal((6, 1, 8, 4), dtype=np.float32)
    got = segment_matmul_rows_fwd(jnp.asarray(x), jnp.asarray(w), seg,
                                  interpret=True)
    want = segment_matmul_rows(jnp.asarray(x), jnp.asarray(w), seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backend_dispatch_end_to_end(rng):
    """ops.set_backend('pallas') must route typed_linear through the kernels
    (interpret mode on CPU) and agree with the XLA backend."""
    g = random_heterograph(num_nodes=40, num_edges=200, num_rels=4, tile=8)
    x = jnp.asarray(rng.standard_normal((40, 12), dtype=np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 2, 12, 8), dtype=np.float32)
    )
    want = ops.edge_typed_linear(g, x, w)
    ops.set_backend("pallas")
    try:
        got = ops.edge_typed_linear(g, x, w)
    finally:
        ops.set_backend("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_static_mix_matches_xla(rng):
    """Static-hybrid large-R path (per-relation static slices + gather
    tail): forward and grads vs the gather-einsum, 2-D and 3-D inputs,
    including zero-row relations inside and outside the static set."""
    from het_tpu.ops.linear import segment_matmul_static_mix

    R = 17
    seg_of_row = np.sort(rng.integers(0, R, 900))
    seg_of_row = seg_of_row[seg_of_row != 5]  # a zero-row relation
    seg = build_segments(seg_of_row, R, 8)
    assert seg.seg_ptrs_static is not None
    w = jnp.asarray(rng.standard_normal((R, 2, 12, 8), dtype=np.float32))
    for hx in (0, 1, 2):
        shape = (seg.n_rows, 12) if hx == 0 else (seg.n_rows, hx, 12)
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

        def loss_mix(xx, ww):
            return jnp.sum(
                segment_matmul_static_mix(xx, ww, seg, k_static=4) ** 2
            )

        def loss_ref(xx, ww):
            return jnp.sum(segment_matmul_rows(xx, ww, seg) ** 2)

        got = segment_matmul_static_mix(x, w, seg, k_static=4)
        want = segment_matmul_rows(x, w, seg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        gm = jax.grad(loss_mix, argnums=(0, 1))(x, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        for a, b in zip(gm, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)
