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
        # whole layer core (projection + logits + softmax + aggregation)
        # through one op: fully fused on the pallas backend (the backward
        # reassociations need the projection inside the boundary), the
        # strictly-2D composed path otherwise (ops.gat_layer_core)
        h = ops.gat_layer_core(
            g, x, w, attn_l, attn_r, self.leaky_relu_slope
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
