"""Differentiable graph ops — the layer the reference exposes as
``hrt/python/backend`` autograd wrappers over ``torch.ops.torch_hrt``.

Here ops are plain functional JAX: XLA implementations in ``linear``/``spmm``
(fully autodiff-able), Pallas TPU kernels in ``pallas/`` wired in behind the
same signatures via ``jax.custom_vjp``. Select with ``set_backend``/
``use_pallas``.
"""

from .common import (  # noqa: F401
    gather_dst,
    gather_nodes,
    gather_src,
    scatter_sum_dst,
    scatter_sum_nodes,
    scatter_sum_src,
)
from .linear import (  # noqa: F401
    compact_dst_inner,
    compact_typed_linear,
    edge_rel_inner,
    edge_typed_linear,
    expand_compact,
    ntype_linear,
    segment_matmul_rows,
    typed_linear,
)
from .spmm import (  # noqa: F401
    edge_softmax,
    edge_softmax_weighted_sum,
    edge_softmax_weighted_sum_compact,
    gat_layer_core,
    gat_node_fused,
    gat_node_fused2d,
    hgt_compact_attention,
    hgt_edge_softmax,
    hgt_plain_attention,
    hgt_plain_layer_core,
    hgt_softmax_weighted_agg,
    hgt_softmax_weighted_agg_compact,
    inner_product_edge_node,
    relational_fused_gat,
    relational_fused_gat_compact,
    relational_fused_gat_compact_packed,
    rgcn_aggregate,
    rgcn_aggregate_compact,
    rgcn_layer0,
    rgcn_layer1,
    rgcn_norm,
)

_BACKEND = "xla"


def set_backend(name: str) -> None:
    """Select the op backend: 'xla' (portable) or 'pallas' (TPU kernels)."""
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND
