"""Shared gather/scatter primitives over the canonical edge layout.

These encode the padding/sentinel discipline once so every op above them is
provably clean at the pad boundary:

* node gathers accept sentinel index ``num_nodes`` (padding edges) and return
  a zero row for it;
* node scatters allocate ``num_nodes + 1`` segments so sentinel-indexed
  updates land in a discard row — the TPU-native replacement for the
  reference's out-of-bounds-free atomicAdd scatters.

Both directions are exact transposes of each other, so JAX autodiff through
them keeps padding cotangents at exactly zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def match_vma(ref: Array, x: Array) -> Array:
    """Promote ``x``'s varying-manual-axes set to include ``ref``'s
    (``shard_map(check_vma=True)`` support).

    custom_vjp boundaries are opaque to shard_map's static replication
    checker, so a REPLICATED operand (typically a weight) entering one next
    to shard-varying data leaves the checker unable to prove its gradient
    psum-reduced.  Casting it to varying first moves the cast's transpose
    (``psum_invariant`` over the mesh axis) OUTSIDE the custom_vjp where
    the checker can see it.  No-op outside shard_map, when vma already
    matches, and on backends without vma typing."""
    try:
        want = jax.typeof(ref).vma - jax.typeof(x).vma
    except (AttributeError, TypeError):
        return x
    for ax in want:
        x = jax.lax.pcast(x, ax, to="varying")
    return x


def out_struct(shape, dtype, *operands) -> jax.ShapeDtypeStruct:
    """``jax.ShapeDtypeStruct`` for a pallas_call output whose vma (varying
    manual axes) is the union of the operands' — required under
    ``shard_map(check_vma=True)``, harmless elsewhere."""
    vma = frozenset()
    for x in operands:
        try:
            vma |= jax.typeof(x).vma
        except (AttributeError, TypeError):
            pass
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # older jax without the vma kwarg
        return jax.ShapeDtypeStruct(shape, dtype)


def pad_zero_row(x: Array) -> Array:
    """Append one all-zero row along axis 0."""
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


def take_rows(x: Array, idx: Array) -> Array:
    """Row gather with trailing dims flattened: XLA's gather is several
    times slower on >2-D operands (measured 9x on TPU for (E, H, D)), so
    every row-indexed take in the framework routes through here."""
    if x.ndim <= 2:
        return jnp.take(x, idx, axis=0)
    flat = x.reshape(x.shape[0], -1)
    out = jnp.take(flat, idx, axis=0)
    return out.reshape((idx.shape[0],) + x.shape[1:])


def _narrow_pad_lanes(x: Array, idx=None):
    """Lane count a row-gather source should be padded to, or 0 if wide
    enough.  XLA scalarizes gathers whose rows are under ~32 BYTES into
    per-element reads (round-4: a 1-lane f32 gather at 2 GB/s; round-5: a
    bf16 8-lane gather at 6 GB/s — 801 us on the canon-to-row gather), so
    the threshold is bytes, not lanes."""
    if x.ndim != 2:
        return 0
    # 32 lanes: measured round 5, rows need 64 BYTES for full-rate row
    # gathers (142k-row isolation: bf16 w=16 1.28 ms, bf16 w=32 0.19,
    # f32 w=16 0.13), and consumers that downcast make XLA hoist the
    # convert into the gather source (optimization_barrier lowers to a
    # plain copy on TPU and converts commute through copies), halving
    # the row bytes post-pad — so the pad anticipates a 2-byte dtype.
    # Row gathers are row-dispatch-bound, so extra lanes cost nothing —
    # AS LONG AS the padded gather output stays small enough for XLA to
    # lay it out row-major: past ~16 GB-scale working sets (full-mag)
    # layout assignment flips narrow per-edge arrays col-major to dodge
    # the 128-lane tile padding, and a col-major gather runs at ~6 GB/s
    # PER ELEMENT — padding then multiplies the damage (round-5
    # full-scale trace: the padded er gather at 455 ms).  Cap the padded
    # output at 256 MB.
    # 64 bytes by dtype: f32 -> 16 lanes, bf16 -> 32.  (An earlier
    # uniform 32-lane rule anticipated convert-hoisting on f32 sources,
    # but it also made every consumer of a padded f32 gather read 4x the
    # real bytes — the GAT per-edge inner products measured ~1.9 ms of
    # that; the convert-hoisting case it protected was stall-bound
    # anyway.)
    want = max(8, 64 // jnp.dtype(x.dtype).itemsize)
    if x.shape[1] >= want:
        return 0
    if idx is not None:
        rows = int(idx.shape[0]) if hasattr(idx, "shape") else 0
        if rows * want * jnp.dtype(x.dtype).itemsize > 256 * 1024 * 1024:
            return 0
    return want


def take_rows_padded(x: Array, idx: Array) -> Array:
    """``take_rows`` with narrow sources lane-padded to a >=32-byte row.

    The padded source is pinned with ``optimization_barrier``: without it
    XLA's algebraic simplifier cancels the pad against the output slice
    (slice(gather(pad(x))) -> gather(x)) and hoists narrowing converts
    above the gather, recreating exactly the scalarized sub-32-byte row
    gather this helper exists to avoid (round-5 trace: the d_er
    canon-to-row gather stayed at 6 GB/s / 801 us until pinned).  The
    barrier materializes only the source-scale padded copy."""
    pad_c = _narrow_pad_lanes(x, idx)
    if not pad_c:
        return take_rows(x, idx)
    c = x.shape[1]
    src = jax.lax.optimization_barrier(
        jnp.pad(x, ((0, 0), (0, pad_c - c)))
    )
    return take_rows(src, idx)[:, :c]


def gather_nodes(x: Array, idx: Array, *, pin_output: bool = False) -> Array:
    """``x[idx]`` where ``idx`` may contain the sentinel ``x.shape[0]``
    (returns zeros there).

    Narrow rows are column-padded before the gather (see
    ``_narrow_pad_lanes``); the pad is node-scale and the slice fuses
    away.  ``pin_output``: barrier the (still wide, still f32) gather
    output before slicing — for gathers whose consumers downcast to
    bf16, where XLA otherwise hoists the convert into the gather source
    and bf16 row gathers run ~4x slower per row than f32 ones (round-5
    trace: the d_er canon-to-row gather at 801 us vs ~190 expected)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    pad_c = _narrow_pad_lanes(x, idx)
    if pad_c:
        c = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, pad_c - c)))
    src = pad_zero_row(x)
    if pad_c:
        # pin the pad against simplifier cancellation (take_rows_padded)
        src = jax.lax.optimization_barrier(src)
    out = take_rows(src, idx)
    if pin_output:
        out = jax.lax.optimization_barrier(out)
    if pad_c:
        out = out[:, :c]
    return out[:, 0] if squeeze else out


@jax.custom_vjp
def take_rows_injective(
    y: Array, inv: Array, perm: Array, row_valid: Array
) -> Array:
    """``y[inv]`` where ``inv``/``perm`` are mutually inverse injections
    (padded segment space <-> source rows).  The transpose of an injective
    gather is another gather, so the custom VJP replaces XLA's unsorted
    scatter-add backward (~4x slower on TPU) with a masked take.

    Correctness requires the framework invariant that cotangents on invalid
    (padding) rows are never produced by consumers (nothing reads them).

    Index arrays are explicit arguments (None cotangents) rather than
    closure captures: custom_vjp closures over traced values break under
    shard_map."""
    return take_rows(y, inv)


def _tri_fwd(y, inv, perm, row_valid):
    return take_rows(y, inv), (perm, row_valid)


def _tri_bwd(res, ct):
    perm, row_valid = res
    dy = take_rows(ct, perm)
    mask = row_valid.reshape((-1,) + (1,) * (dy.ndim - 1))
    return (jnp.where(mask, dy, jnp.zeros_like(dy)), None, None, None)


take_rows_injective.defvjp(_tri_fwd, _tri_bwd)


def scatter_sum_nodes(
    vals: Array, idx: Array, num_nodes: int, *, indices_are_sorted: bool = False
) -> Array:
    """Segment-sum ``vals`` rows into ``num_nodes`` rows by ``idx``;
    sentinel-indexed rows are dropped.  Trailing dims are flattened (same
    >2-D XLA scatter penalty as gathers)."""
    shape = vals.shape
    flat = vals.reshape(shape[0], -1) if vals.ndim > 2 else vals
    out = jax.ops.segment_sum(
        flat,
        idx,
        num_segments=num_nodes + 1,
        indices_are_sorted=indices_are_sorted,
    )
    out = out[:num_nodes]
    if vals.ndim > 2:
        out = out.reshape((num_nodes,) + shape[1:])
    return out


def gather_dst(g, node_vals: Array) -> Array:
    return gather_nodes(node_vals, g.dst)


def gather_src(g, node_vals: Array) -> Array:
    return gather_nodes(node_vals, g.src)


def scatter_sum_dst(g, edge_vals: Array) -> Array:
    """Sum per-edge rows into destination nodes. Canonical order is
    dst-sorted, so this is a sorted segment reduction (no atomics).

    Dispatches to the Pallas one-hot-MXU kernel when the pallas backend is
    selected (XLA lowers sorted segment_sum to a slow serialized scatter)."""
    from . import get_backend

    if get_backend() == "pallas":
        from .pallas.seg_reduce import seg_sum_dst_pallas

        return seg_sum_dst_pallas(g, edge_vals)
    return scatter_sum_nodes(
        edge_vals, g.dst, g.num_nodes, indices_are_sorted=True
    )


@jax.custom_vjp
def _scatter_sum_src_pallas(vals2d: Array, g) -> Array:
    # packed entry point: narrow payloads fold k edges per 128-lane row
    # instead of zero-padding to 128 (half/quarter the kernel bytes), and
    # the src-order permute fuses into the payload-pack pass (one gather,
    # no separately materialized permuted buffer) — round-3 probe: the
    # pad+permute form measured 5.0 ms for (EP, 64) at mag scale
    from .pallas.seg_reduce import seg_sum_sorted_packed

    C = vals2d.shape[1]
    out = seg_sum_sorted_packed(
        [vals2d],
        C,
        vals2d.dtype,
        g.out_row_ptr,
        g.src_space,
        g.num_padded_edges,
        g.num_edges,
        g.out_tables,
        perm=g.out_perm,
    )
    return out[:, :C]


def _sss_fwd(vals2d, g):
    return _scatter_sum_src_pallas(vals2d, g), g


def _sss_bwd(g, ct):
    # transpose of (permute to src order + sorted segment sum) is a plain
    # gather at each edge's source (sentinel src -> zero row)
    return take_rows(pad_zero_row(ct), g.src), None


_scatter_sum_src_pallas.defvjp(_sss_fwd, _sss_bwd)


def scatter_sum_src(g, edge_vals: Array) -> Array:
    """Sum per-edge rows into source nodes via the precomputed src-sorted
    permutation (``g.out_perm``), again a sorted reduction."""
    from . import get_backend

    if get_backend() == "pallas":
        shape = edge_vals.shape
        flat = edge_vals.reshape(shape[0], -1)
        out = _scatter_sum_src_pallas(flat, g)
        return out.reshape((g.src_space,) + shape[1:])
    vals_p = take_rows(edge_vals, g.out_perm)
    idx_p = jnp.take(g.src, g.out_perm, axis=0)
    return scatter_sum_nodes(vals_p, idx_p, g.src_space,
                             indices_are_sorted=True)


def safe_div(num: Array, den: Array) -> Array:
    """``num / den`` with 0 where ``den == 0`` (padding lanes)."""
    den_ok = jnp.where(den != 0, den, jnp.ones_like(den))
    return jnp.where(den != 0, num / den_ok, jnp.zeros_like(num))
