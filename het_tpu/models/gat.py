"""Homogeneous GAT (Seastar EGL port in the reference,
hrt/python/GAT/egl_gat.py).

A single-relation special case of the relational machinery: the fused edge
softmax + aggregation is the same kernel with R == 1 (reference
``fused_gat_csr``, GAT/FusedGAT.cu.h:8-21, GATOps.inc.h:130-135)."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..graph.structures import HeteroGraph

Array = jax.Array


class GATLayer(nn.Module):
    in_feat: int
    out_feat: int  # per-head
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    leaky_relu_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable[[Array], Array]] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, g: HeteroGraph, x: Array, *, deterministic: bool = True
    ) -> Array:
        H, D = self.num_heads, self.out_feat
        init = nn.initializers.xavier_uniform()
        w = self.param("fc", init, (self.in_feat, H * D), self.param_dtype)
        attn_l = self.param("attn_l", init, (H, D), self.param_dtype)
        attn_r = self.param("attn_r", init, (H, D), self.param_dtype)

        x = nn.Dropout(rate=self.feat_drop)(x, deterministic=deterministic)
        # STRICTLY 2D head-major layout discipline for GAT's wide payloads:
        # (N, H, D) views + einsum backwards pick conflicting XLA layouts
        # (~2 GB of physical copies in the step HLO, docs/ROUND2_NOTES.md
        # "GAT residue").  el/er ride one block-diagonal (H*D, 2H) matmul.
        feat2d = x @ w  # (N, H*D) dense: single relation
        eye = jnp.eye(H, dtype=jnp.float32)
        a_lr = jnp.concatenate(
            [
                (attn_l.astype(jnp.float32)[:, :, None] * eye[:, None, :])
                .reshape(H * D, H),
                (attn_r.astype(jnp.float32)[:, :, None] * eye[:, None, :])
                .reshape(H * D, H),
            ],
            axis=1,
        )  # (H*D, 2H) block-diagonal; grads flow back to attn_l/attn_r
        eler = feat2d @ a_lr.astype(feat2d.dtype)  # (N, 2H)
        el, er = eler[:, :H], eler[:, H:]
        # node-level fused aggregation: per-edge features never materialize
        # outside the reduce producers (ops.gat_node_fused2d)
        h = ops.gat_node_fused2d(
            g, feat2d, el, er, self.leaky_relu_slope, num_heads=H
        )  # (N, H*D)
        if self.residual:
            if self.in_feat == H * D:
                h = h + x
            else:
                res_w = self.param(
                    "res_fc", init, (self.in_feat, H * D), self.param_dtype
                )
                h = h + x @ res_w
        if self.activation is not None:
            h = self.activation(h)
        return h


class GATModel(nn.Module):
    in_feat: int
    hidden: int  # per-head
    num_classes: int
    num_heads: int
    num_layers: int = 2
    feat_drop: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, g: HeteroGraph, x: Array, *, deterministic: bool = True
    ) -> Array:
        h = x
        for i in range(self.num_layers - 1):
            h = GATLayer(
                in_feat=self.in_feat if i == 0 else self.hidden * self.num_heads,
                out_feat=self.hidden,
                num_heads=self.num_heads,
                feat_drop=self.feat_drop,
                activation=jax.nn.elu,
                param_dtype=self.param_dtype,
            )(g, h, deterministic=deterministic)  # already 2D (N, H*D)
        h = GATLayer(
            in_feat=self.hidden * self.num_heads
            if self.num_layers > 1
            else self.in_feat,
            out_feat=self.num_classes,
            num_heads=1,
            param_dtype=self.param_dtype,
        )(g, h, deterministic=deterministic)
        return h.reshape(g.num_nodes, self.num_classes)
