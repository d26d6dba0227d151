"""Message-passing ops: SDDMM inner products, fused relational edge softmax +
aggregation (RGAT/GAT), HGT typed edge softmax + weighted aggregation, RGCN
normalized aggregation.

TPU-native replacements for the reference kernel families:

* inner product — hrt/include/DGLHackKernel/RGNN/InnerProduct.cu.h:7-50,
  InnerProductEdgeParallel.cu.h (op ``rgnn_inner_product_right_node``).
* fused GAT — RGAT/RGATKernelsSeparateCOO.cu.h:17-215 (ExpLeakyReluSum +
  SumProdZipDiv stages) and GAT/FusedGAT.cu.h.
* HGT softmax/aggregation — HGT/HGTForwardKernels.cu.h:51,247,428.
* RGCN — RGCN/SeastarRGCNKernels.cu.h:60-236, RGCNKernelsEdgeParallel.cu.h.

Where the reference resolves the scatter with atomicAdd, these use the
canonical dst-sorted edge order + sorted segment reductions (see
het_tpu/ops/common.py).  Everything here is plain differentiable jnp — the
XLA fusion engine handles elementwise fusion; Pallas kernels (ops/pallas/)
replace the hot paths behind the same signatures via ``jax.custom_vjp``.

Note on numerics: the reference computes raw ``exp`` with no max-subtraction
(RGATKernelsSeparateCOO.cu.h, HGTForwardKernels.cu.h).  We keep that default
for activation parity, with an optional ``stable=True`` max-subtracted form
(per-destination max via segment-max) for bf16/production use.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.structures import HeteroGraph
from .common import (
    gather_dst,
    gather_nodes,
    gather_src,
    safe_div,
    scatter_sum_dst,
)

Array = jax.Array


def _segment_max_dst(g: HeteroGraph, edge_vals: Array) -> Array:
    # note: a Pallas seg-max exists (pallas/seg_reduce.py) but measures
    # slower than XLA's sorted segment_max here (VPU column loop + grid
    # overhead vs tiny payload), so XLA stays the default for both backends
    out = jax.ops.segment_max(
        edge_vals,
        g.dst,
        num_segments=g.num_nodes + 1,
        indices_are_sorted=True,
    )
    out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    # softmax is shift-invariant: the subtracted max contributes exactly
    # zero gradient analytically, so cut it out of the autodiff graph
    # (XLA's segment-max backward is an expensive scatter)
    return jax.lax.stop_gradient(out[: g.num_nodes])


def _make_inner_product(side: str):
    is_dst = side == "dst"

    @jax.custom_vjp
    def ip(left_e, right, g):
        r_e = gather_nodes(right, g.dst if is_dst else g.src)
        return jnp.sum(
            left_e.astype(jnp.float32) * r_e.astype(jnp.float32), axis=-1
        ).astype(left_e.dtype)

    def fwd(left_e, right, g):
        return ip(left_e, right, g), (left_e, right, g)

    def bwd(res, ct):
        from .common import scatter_sum_src

        left_e, right, g = res
        r_e = gather_nodes(right, g.dst if is_dst else g.src)
        ct32 = ct.astype(jnp.float32)
        d_left = (ct32[..., None] * r_e.astype(jnp.float32)).astype(
            left_e.dtype
        )
        # node-side cotangent: sorted segment reduction, not autodiff's
        # unsorted scatter-add (the framework-wide rule)
        payload = ct32[..., None] * left_e.astype(jnp.float32)
        flat = payload.reshape(payload.shape[0], -1)
        d_right = (
            scatter_sum_dst(g, flat) if is_dst else scatter_sum_src(g, flat)
        )
        d_right = d_right.reshape(right.shape).astype(right.dtype)
        return d_left, d_right, None

    ip.defvjp(fwd, bwd)
    return ip


_inner_product = {
    "dst": _make_inner_product("dst"),
    "src": _make_inner_product("src"),
}


def inner_product_edge_node(
    g: HeteroGraph, left_e: Array, right: Array, side: str = "dst"
) -> Array:
    """score_e[h] = <left_e[h, :], right[side(e), h, :]> — the SDDMM step.

    ``left_e``: (EP, H, D) per-edge; ``right``: (N, H, D) per-node.
    Reference: ``rgnn_inner_product_right_node_separatecoo``
    (RGNNOps.inc.h:609).  Custom VJP: the node-side gradient runs as a
    sorted segment reduction instead of autodiff's unsorted scatter."""
    return _inner_product[side](left_e, right, g)


CLIP_LOGIT = 60.0  # exp(60) ~ 1e26: far from f32 overflow, preserves order


def _stabilize(g: HeteroGraph, logits: Array, stable) -> Array:
    """Overflow protection for the raw-exp edge softmax.

    stable=False/"raw": reference parity (exp overflows past ~88);
    stable="clip": clamp logits to +-CLIP_LOGIT — no extra passes, exact
    softmax whenever logits are within range (always true in healthy
    training), bounded otherwise;
    stable=True/"max": exact max-subtracted softmax (costs a segment-max
    pass + gather each direction)."""
    if stable in (False, "raw"):
        return logits
    if stable == "clip":
        return jnp.clip(logits, -CLIP_LOGIT, CLIP_LOGIT)
    m = _segment_max_dst(g, g.edge_mask(logits, fill=-jnp.inf))
    return logits - gather_dst(g, m)


def edge_softmax(
    g: HeteroGraph, logits: Array, *, stable=False
) -> Array:
    """Per-destination softmax over incoming edges: (EP, H) -> (EP, H).

    Padding lanes come out exactly 0."""
    logits = _stabilize(g, logits, stable)
    e = g.edge_mask(jnp.exp(logits))
    s = scatter_sum_dst(g, e)
    return safe_div(e, gather_dst(g, s))


def relational_fused_gat(
    g: HeteroGraph,
    feat_src_e: Array,
    el_e: Array,
    er_e: Array,
    slope: float,
    *,
    stable: bool = False,
) -> Array:
    """Fused relational GAT: edge softmax of leaky_relu(el+er) + weighted
    aggregation of per-edge source features into destinations.

    feat_src_e: (EP, H, D) canonical order; el_e/er_e: (EP, H).
    Returns (N, H, D).  Reference two-stage kernels
    ``gatExpLeakyReluSumKernel`` + ``gatSumProdZipDivKernel``
    (RGATKernelsSeparateCOO.cu.h:17-215).  [The reference's python oracle
    divides by the *source* running sum (ref_rgat.py:30) which contradicts
    its own backward and the CUDA kernels; we normalize by destination.]"""
    from . import get_backend

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        # fully fused single pass: leaky_relu, clip, exp, message scaling
        # and the packed (denominator + numerator) segment reduction all
        # happen inside the kernel; backward is pure gathers
        from .pallas.fused_agg import fused_softmax_agg

        return fused_softmax_agg(
            g,
            feat_src_e,
            el_e + er_e,
            act="leaky_relu",
            slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    logits = jax.nn.leaky_relu(el_e + er_e, negative_slope=slope)
    if get_backend() == "pallas":
        # stable='max': exact max-subtracted softmax, two-pass packed form
        logits = _stabilize(g, logits, stable)
        z = g.edge_mask(jnp.exp(logits))  # (EP, H)
        EP, H = z.shape
        D = feat_src_e.shape[-1]
        zf = (feat_src_e * z[..., None]).reshape(EP, H * D)
        packed = jnp.concatenate([z, zf], axis=1)
        agg = scatter_sum_dst(g, packed)  # (N, H + H*D)
        s, out_raw = agg[:, :H], agg[:, H:].reshape(-1, H, D)
        return safe_div(out_raw, s[..., None])
    alpha = edge_softmax(g, logits, stable=stable)  # (EP, H)
    return scatter_sum_dst(g, feat_src_e * alpha[..., None])


def relational_fused_gat_compact_packed(
    g: HeteroGraph,
    fe: Array,
    er_c: Array,
    slope: float,
    *,
    stable: bool = False,
) -> Array:
    """Compact fused GAT over the PACKED fused-projection output: fe
    (UCs, H, 1+D) carries per-head ``[el | feat]`` lanes from ONE segment
    matmul (the multiply_first path's combined projection).  Keeping the
    buffer packed end-to-end matters at scale: every separate narrow
    compact array costs a full 128-lane row of HBM per compact row
    (1.5-3 GB each at full-mag's 6.2M rows)."""
    from . import get_backend

    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and g.compact_src.edge_sort_perm is not None
    ):
        from .pallas.fused_agg import fused_softmax_agg_compact_packed

        return fused_softmax_agg_compact_packed(
            g, fe, er_c, act="leaky_relu", slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    return relational_fused_gat_compact(
        g, fe[..., 1:], fe[..., 0], er_c, slope, stable=stable
    )


def gat_node_fused(
    g: HeteroGraph,
    feat: Array,
    el: Array,
    er: Array,
    slope: float,
    *,
    stable: bool = False,
) -> Array:
    """Homogeneous fused GAT with NODE-level inputs: feat (src_space, H, D),
    el (src_space, H), er (N, H) -> (N, H, D).  On the pallas backend the
    per-edge feature expansion never materializes outside the reduce
    producers (the (EP, H*D) gather + its backward scatter measured 9.4 ms
    alone at GAT's 256-lane width).  Reference: ``fused_gat_csr``
    (GAT/FusedGAT.cu.h:8-21, GATOps.inc.h:130-135)."""
    from . import get_backend
    from .common import gather_dst, gather_src

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import fused_gat_nodes

        return fused_gat_nodes(
            g, feat, el, er, act="leaky_relu", slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    return relational_fused_gat(
        g, gather_src(g, feat), gather_src(g, el), gather_dst(g, er),
        slope, stable=stable,
    )


def gat_node_fused2d(
    g: HeteroGraph,
    feat2d: Array,
    el: Array,
    er: Array,
    slope: float,
    *,
    num_heads: int,
    stable: bool = False,
) -> Array:
    """Strictly-2D form of :func:`gat_node_fused`: feat2d (src_space, H*D)
    head-major -> (N, H*D).  Wide-payload models (GAT: H*D = 256) must stay
    2D end-to-end — 3D (rows, H, D) views make XLA assign column-major
    layouts to the elementwise chains while the reduce-kernel operands need
    row-major, inserting ~2 GB of physical layout copies into the step HLO
    (docs/ROUND2_NOTES.md "GAT residue")."""
    from . import get_backend

    H = num_heads
    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import fused_gat_nodes2d

        return fused_gat_nodes2d(
            g, feat2d, el, er, act="leaky_relu", slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    D = feat2d.shape[1] // H
    out = gat_node_fused(
        g, feat2d.reshape(-1, H, D), el, er, slope, stable=stable
    )
    return out.reshape(g.num_nodes, H * D)


def relational_fused_gat_compact(
    g: HeteroGraph,
    feat_c: Array,
    el_c: Array,
    er_c: Array,
    slope: float,
    *,
    stable: bool = False,
) -> Array:
    """Single-sided compact fused GAT: inputs live on compact rows
    (feat_c/el_c source-side (UCs, ...), er_c destination-side (UCd, H))
    and are softmax-aggregated into destinations without materializing
    per-edge tensors as standalone arrays.

    Reference: ``relational_fused_gat_compact_as_of_node_separate_coo_
    single_sided`` (hrt/python/backend/rgat_layers_and_funcs.py:826) with
    direct-index compact resolution (kernel_enums.h:100-119)."""
    from . import get_backend

    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and g.compact_src.edge_sort_perm is not None
    ):
        from .pallas.fused_agg import fused_softmax_agg_compact

        return fused_softmax_agg_compact(
            g,
            feat_c,
            el_c,
            er_c,
            act="leaky_relu",
            slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    from .linear import expand_compact

    feat_e = expand_compact(g, feat_c, side="src")
    el_e = expand_compact(g, el_c, side="src")
    er_e = expand_compact(g, er_c, side="dst")
    return relational_fused_gat(g, feat_e, el_e, er_e, slope, stable=stable)


def hgt_edge_softmax(
    g: HeteroGraph, score_e: Array, mu: Array, *, stable: bool = False
) -> Array:
    """HGT typed edge softmax: softmax_dst(score_e * mu[rel_e]).

    ``mu`` is relation_pri / sqrt(d_k), shape (R, H); score_e (EP, H).
    Reference: ``HET_HGTEdgeSoftmaxAccumStageOnlyKernel``
    (HGTForwardKernels.cu.h:428)."""
    mu_e = jnp.take(mu, g.rel, axis=0)  # (EP, H); padding rel=0 harmless
    return edge_softmax(g, score_e * mu_e, stable=stable)


def hgt_softmax_weighted_agg(
    g: HeteroGraph,
    message_e: Array,
    score_e: Array,
    mu: Array,
    *,
    stable: bool = False,
) -> Array:
    """Fused HGT edge softmax + attention-weighted message aggregation.

    message_e: (EP, H, D); returns (N, H, D).  Reference:
    edge_softmax_ops + message_mean_aggregation (HGTOps.inc.h:660-662,
    HGTForwardKernels.cu.h:51,247) and the fused COO variant
    (HGTOpsEdgeParallel.inc.h:391)."""
    from . import get_backend

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import fused_softmax_agg

        mu_e = jnp.take(mu, g.rel, axis=0)
        return fused_softmax_agg(
            g,
            message_e,
            score_e * mu_e,
            act="identity",
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    if get_backend() == "pallas":
        mu_e = jnp.take(mu, g.rel, axis=0)
        logits = _stabilize(g, score_e * mu_e, stable)
        z = g.edge_mask(jnp.exp(logits))
        EP, H = z.shape
        D = message_e.shape[-1]
        zf = (message_e * z[..., None]).reshape(EP, H * D)
        agg = scatter_sum_dst(g, jnp.concatenate([z, zf], axis=1))
        s, out_raw = agg[:, :H], agg[:, H:].reshape(-1, H, D)
        return safe_div(out_raw, s[..., None])
    alpha = hgt_edge_softmax(g, score_e, mu, stable=stable)
    return scatter_sum_dst(g, message_e * alpha[..., None])


def hgt_softmax_weighted_agg_compact(
    g: HeteroGraph,
    message_c: Array,
    score_e: Array,
    mu: Array,
    *,
    stable: bool = False,
) -> Array:
    """HGT softmax + weighted aggregation with COMPACT messages: the
    v·W_msg[rel] transform is materialized once per unique (rel, src)
    and aggregated single-sided; scores stay per-edge.

    Reference: the compact flag covers the message relational matmul the
    same way (hrt/python/HGT/models.py:255 with unique-node row indices +
    mean aggregation)."""
    from . import get_backend

    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and g.compact_src.edge_sort_perm is not None
    ):
        from .pallas.fused_agg import fused_softmax_agg_src_compact

        mu_e = jnp.take(mu, g.rel, axis=0)
        return fused_softmax_agg_src_compact(
            g,
            message_c,
            score_e * mu_e,
            act="identity",
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    from .linear import expand_compact

    message_e = expand_compact(g, message_c, side="src")
    return hgt_softmax_weighted_agg(g, message_e, score_e, mu, stable=stable)


def hgt_compact_attention(
    g: HeteroGraph,
    message_c: Array,
    att_q_c: Array,
    k_nodes: Array,
    mu: Array,
    *,
    stable: bool = False,
) -> Array:
    """HGT compact attention chain: score SDDMM + typed softmax + compact
    message aggregation.  On the pallas backend the whole chain runs as ONE
    fused custom-VJP op — per-edge scores never cross an op boundary
    (narrow (EP, H) boundary tensors force XLA layout copies; the unfused
    chain measured 18.0 ms fwd+bwd vs 7-8 fused at mag scale).

    Reference: the fused CUDA pair hgt_full_graph_hetero_attention_ops_coo
    + hgt_full_graph_fused_message_calc_and_mean_aggregation_separate_coo
    (HGTOpsEdgeParallel.inc.h:384,391)."""
    from . import get_backend

    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and g.compact_src.edge_sort_perm is not None
        and g.compact_dst.canon_ptr is not None
    ):
        from .pallas.fused_agg import hgt_fused_compact_attention

        return hgt_fused_compact_attention(
            g, message_c, att_q_c, k_nodes, mu,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    from .linear import compact_dst_inner

    score = compact_dst_inner(g, att_q_c, k_nodes)
    return hgt_softmax_weighted_agg_compact(
        g, message_c, score, mu, stable=stable
    )


def hgt_plain_attention(
    g: HeteroGraph,
    message_e: Array,
    q_nodes: Array,
    k_nodes: Array,
    w_att: Array,
    mu: Array,
    *,
    stable: bool = False,
) -> Array:
    """HGT plain-path (non-compact) attention chain: per-edge score SDDMM
    q[dst]·W_att[rel]·k[src] + typed softmax + weighted message
    aggregation.  On the pallas backend the whole chain runs as ONE fused
    custom-VJP op — ``att_q_e`` (EP, H, dk) never crosses an op boundary
    in either direction (unfused it is written + re-read forward AND its
    cotangent materialized + pushed through a separate typed-linear
    backward, the two slowest rows of the round-2 breakdown).

    Reference: the edge-parallel fused score op
    ``hgt_full_graph_hetero_attention_ops_coo``
    (HGTOpsEdgeParallel.inc.h:384, HGT/HGTForwardKernels.cu.h)."""
    from . import get_backend

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import hgt_fused_plain_attention

        return hgt_fused_plain_attention(
            g, message_e, q_nodes, k_nodes, w_att, mu,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    from .linear import edge_typed_linear

    att_q_e = edge_typed_linear(g, q_nodes, w_att, side="dst")
    score = inner_product_edge_node(g, att_q_e, k_nodes, side="src")
    return hgt_softmax_weighted_agg(g, message_e, score, mu, stable=stable)


def hgt_plain_layer_core(
    g: HeteroGraph,
    v_nodes: Array,
    q_nodes: Array,
    k_nodes: Array,
    w_msg: Array,
    w_att: Array,
    mu: Array,
    *,
    stable: bool = False,
) -> Array:
    """Plain-path HGT layer core: message transform v·W_msg[rel] + score
    SDDMM q[dst]·W_att[rel]·k[src] + typed softmax + aggregation.  On the
    pallas backend the WHOLE core is one custom-VJP op: neither
    ``message_e`` nor ``att_q_e`` (both (EP, H, dk)) crosses an op
    boundary in either direction, and the backward's two src-side node
    cotangents (d_k, d_v) share one permute+reduce pass.

    Reference: the fused pair ``hgt_full_graph_hetero_attention_ops_coo``
    + ``hgt_full_graph_fused_message_calc_and_mean_aggregation_separate_
    coo`` (HGTOpsEdgeParallel.inc.h:384,391)."""
    from . import get_backend

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import hgt_fused_plain_full

        return hgt_fused_plain_full(
            g, v_nodes, q_nodes, k_nodes, w_msg, w_att, mu,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    from .linear import edge_typed_linear

    message_e = edge_typed_linear(g, v_nodes, w_msg, side="src")
    return hgt_plain_attention(
        g, message_e, q_nodes, k_nodes, w_att, mu, stable=stable
    )


def edge_softmax_weighted_sum(
    g: HeteroGraph, logits: Array, vec_e: Array, *, stable: bool = False
) -> Array:
    """out[dst] = sum_e softmax_dst(logits)_e * vec_e — the generic fused
    edge-softmax aggregation (compiler fusion target; relational_fused_gat
    and the HGT aggregation are special cases).  logits (EP, H) or (EP,);
    vec_e (EP, [H,] D)."""
    squeeze = logits.ndim == 1
    if squeeze:
        logits = logits[:, None]
        vec_e = vec_e[:, None, :]
    from . import get_backend

    if get_backend() == "pallas" and stable in (False, "raw", "clip"):
        from .pallas.fused_agg import fused_softmax_agg

        out = fused_softmax_agg(
            g,
            vec_e,
            logits,
            act="identity",
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
        return out[:, 0, :] if squeeze else out
    logits = _stabilize(g, logits, stable)
    z = g.edge_mask(jnp.exp(logits))  # (EP, H)
    EP, H = z.shape
    D = vec_e.shape[-1]
    if get_backend() == "pallas":
        zf = (vec_e * z[..., None]).reshape(EP, H * D)
        agg = scatter_sum_dst(g, jnp.concatenate([z, zf], axis=1))
        s, out_raw = agg[:, :H], agg[:, H:].reshape(-1, H, D)
        out = safe_div(out_raw, s[..., None])
    else:
        s = scatter_sum_dst(g, z)
        alpha = safe_div(z, gather_dst(g, s))
        out = scatter_sum_dst(g, vec_e * alpha[..., None])
    return out[:, 0, :] if squeeze else out


def rgcn_norm(g: HeteroGraph, kind: str = "in_degree") -> Array:
    """Per-edge normalization constants, canonical order (EP,).

    ``in_degree``: 1/|in(dst)| over all relations (DGL 'right' norm, the
    reference's default norm input to seastar_rgcn_layer1)."""
    if kind == "in_degree":
        deg = jnp.maximum(g.in_deg, 1).astype(jnp.float32)
        inv = 1.0 / deg
        return g.edge_mask(gather_dst(g, inv))
    raise ValueError(kind)


def rgcn_aggregate(g: HeteroGraph, feat_e: Array, norm_e: Array) -> Array:
    """ret[dst] = sum_e feat_e * norm_e — normalized sum into destinations.

    Reference: rgcn_node_mean_aggregation / Layer1 accumulation
    (RGCNOps.inc.h:678, ref_rgcn.py:6-23)."""
    extra = (1,) * (feat_e.ndim - norm_e.ndim)
    return scatter_sum_dst(g, feat_e * norm_e.reshape(norm_e.shape + extra))


def rgcn_aggregate_compact(
    g: HeteroGraph, feat_c: Array, norm_e: Array
) -> Array:
    """ret[dst] = sum_e norm_e * feat_c[compact_src_row(e)] — single-sided
    compact mean aggregation: compact rows are aggregated directly, never
    expanded to a standalone per-edge tensor.

    feat_c: (UCs, C) source-compact rows.  Reference:
    ``rgcn_node_mean_aggregation_compact_as_of_node_separate_coo_single_
    sided`` (hrt/python/backend/rgcn_layers_and_funcs.py:782-800) with
    direct-index compact resolution (kernel_enums.h:100-119)."""
    from . import get_backend

    if get_backend() == "pallas" and g.compact_src.edge_sort_perm is not None:
        from .pallas.fused_agg import compact_weighted_agg

        return compact_weighted_agg(g, feat_c, norm_e)
    from .linear import expand_compact

    feat_e = expand_compact(g, feat_c[:, None, :], side="src")[:, 0, :]
    return rgcn_aggregate(g, g.edge_mask(feat_e), norm_e)


def rgcn_layer1(
    g: HeteroGraph, x: Array, w: Array, norm_e: Array
) -> Array:
    """ret[dst] = sum_e norm_e * (x[src] @ W[rel]).  w: (R, in, out).

    Reference: ``rgcn_layer1_separate_coo`` (RGCNOps.inc.h:678,
    RGCNKernelsEdgeParallel.cu.h) — edge-parallel typed linear + normalized
    aggregation."""
    from .linear import edge_typed_linear

    feat_e = edge_typed_linear(g, x, w[:, None, :, :], side="src")  # (EP,1,O)
    out = rgcn_aggregate(g, feat_e[:, 0, :], norm_e)
    return out


def rgcn_layer0(g: HeteroGraph, w: Array, norm_e: Array) -> Array:
    """Featureless first layer: ret[dst] = sum_e norm_e * W[rel][src].

    Input features are implicit one-hot node ids, so the typed linear
    degenerates to a weight-row gather.  w: (R, N, out).
    Reference: ``seastar_rgcn_layer0_csr``
    (RGCN/SeastarRGCNKernels.cu.h:60, Layer0 variants)."""
    feat_e = w[g.rel, jnp.minimum(g.src, g.num_nodes - 1)]  # (EP, out)
    feat_e = g.edge_mask(feat_e)
    return rgcn_aggregate(g, feat_e, norm_e)


def gat_layer_core(
    g: HeteroGraph,
    x2d: Array,
    w: Array,
    attn_l: Array,
    attn_r: Array,
    slope: float,
    *,
    stable: bool = False,
) -> Array:
    """Homogeneous GAT layer core: projection x·W + attention logits +
    fused edge softmax + weighted aggregation -> (N, H*D) head-major.

    On the pallas backend (raw/clip softmax, F <= H*D, single-chip node
    spaces) the WHOLE core runs as one custom-VJP op whose backward
    reassociates both wide source-side passes away (dW as one MXU
    contraction over edges; dx as an F-lane head-mixed reduce) — see
    pallas/fused_agg._make_gat_layer_op.  Reference: ``fused_gat_csr``
    (GAT/FusedGAT.cu.h:8-21, GATOps.inc.h:130-135)."""
    from . import get_backend

    H, D = attn_l.shape
    F = x2d.shape[1]
    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and F <= H * D
        and g.src_space == g.num_nodes
        # the fused op's backward assumes x2d rows == num_nodes (its
        # d_er pad is S - N rows on top of a src_space-row d_el reduce);
        # a caller passing extra rows must take the composed path
        # (ADVICE r4)
        and x2d.shape[0] == g.num_nodes
    ):
        from .pallas.fused_agg import gat_layer_fused

        return gat_layer_fused(
            g, x2d, w, attn_l, attn_r, slope=slope,
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
    # composed fallback: node-scale projection + block-diagonal logits +
    # node-sided fused aggregation (strictly 2D, see models/gat.py notes)
    feat2d = x2d @ w
    eye = jnp.eye(H, dtype=jnp.float32)
    a_lr = jnp.concatenate(
        [
            (attn_l.astype(jnp.float32)[:, :, None] * eye[:, None, :])
            .reshape(H * D, H),
            (attn_r.astype(jnp.float32)[:, :, None] * eye[:, None, :])
            .reshape(H * D, H),
        ],
        axis=1,
    )
    eler = feat2d @ a_lr.astype(feat2d.dtype)
    return gat_node_fused2d(
        g, feat2d, eler[:, :H], eler[:, H:], slope, num_heads=H,
        stable=stable,
    )


def edge_softmax_weighted_sum_compact(
    g: HeteroGraph, logits: Array, msg_c: Array, *, stable=False
) -> Array:
    """out[dst] = sum_e softmax_dst(logits)_e * msg_c[compact_src_row(e)]
    — the generic fused softmax aggregation with SOURCE-COMPACT messages
    (compiler fusion target, compiler/fuse.fuse_compact_agg; reference:
    the single-sided compact aggregation kernels,
    rgat_layers_and_funcs.py:826).  logits (EP, H) or (EP,); msg_c
    (UCs, [H,] D)."""
    squeeze = logits.ndim == 1
    if squeeze:
        logits = logits[:, None]
        msg_c = msg_c[:, None, :]
    from . import get_backend

    if (
        get_backend() == "pallas"
        and stable in (False, "raw", "clip")
        and g.compact_src.edge_sort_perm is not None
    ):
        from .pallas.fused_agg import fused_softmax_agg_src_compact

        out = fused_softmax_agg_src_compact(
            g, msg_c, logits, act="identity",
            clip=CLIP_LOGIT if stable == "clip" else None,
        )
        return out[:, 0, :] if squeeze else out
    from .linear import expand_compact

    msg_e = expand_compact(g, msg_c, side="src")
    out = edge_softmax_weighted_sum(g, logits, msg_e, stable=stable)
    return out[:, 0, :] if squeeze else out
