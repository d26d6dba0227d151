"""RGCN — Seastar-style and edge-parallel relational graph convolution.

Re-design of the reference RGCN family (hrt/python/RGCN/RGCN.py):

* ``SeastarRGCNLayer0`` — featureless first layer, weight-row gather
  (``seastar_rgcn_layer0_csr``, RGCN.py:117-193,
  SeastarRGCNKernels.cu.h:60);
* ``RGCNLayer`` — x·W[rel] per edge + normalized aggregation, the
  edge-parallel path (``HET_EglRelGraphConv_EdgeParallel``, RGCN.py:194-352)
  with optional compact materialization;
* ``RGCNModel`` — 2-layer entity classification with train/val/test eval
  (RGCN.py:554-619).

The reference's node-parallel vs edge-parallel vs hybrid-assign kernel
variants are load-balancing schedules, handled inside the Pallas kernels
here, not at model level.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..graph.structures import HeteroGraph

Array = jax.Array


class SeastarRGCNLayer0(nn.Module):
    """Featureless input layer: out[dst] = sum_e norm_e * W[rel_e][src_e].

    ``weight`` has shape (R, num_nodes, out) — input features are implicit
    one-hot node ids."""

    num_nodes: int
    num_rels: int
    out_feat: int
    bias: bool = True
    activation: Optional[callable] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: HeteroGraph, norm_e: Optional[Array] = None) -> Array:
        init = nn.initializers.xavier_uniform()
        w = self.param(
            "weight", init, (self.num_rels, self.num_nodes, self.out_feat),
            self.param_dtype,
        )
        if norm_e is None:
            norm_e = ops.rgcn_norm(g)
        h = ops.rgcn_layer0(g, w, norm_e)
        if self.bias:
            h = h + self.param(
                "bias", nn.initializers.zeros, (self.out_feat,),
                self.param_dtype,
            )
        if self.activation is not None:
            h = self.activation(h)
        return h


class RGCNLayer(nn.Module):
    """Edge-parallel RGCN layer: out[dst] = sum_e norm_e * (x[src_e] @ W[rel_e]).

    ``compact=True`` computes x·W once per unique (rel, src) then aggregates
    compact rows single-sided — no per-edge expansion (reference compact
    path, RGCN.py:316-331 + rgcn_layers_and_funcs.py:782)."""

    in_feat: int
    out_feat: int
    num_rels: int
    bias: bool = True
    activation: Optional[callable] = None
    self_loop: bool = False
    compact: bool = False
    dropout: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        g: HeteroGraph,
        x: Array,
        norm_e: Optional[Array] = None,
        *,
        x_dst: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if x_dst is None:
            x_dst = x
        init = nn.initializers.xavier_uniform()
        w = self.param(
            "weight", init, (self.num_rels, self.in_feat, self.out_feat),
            self.param_dtype,
        )
        if norm_e is None:
            norm_e = ops.rgcn_norm(g)
        if self.compact:
            feat_c = ops.compact_typed_linear(
                g, x, w[:, None, :, :], side="src"
            )  # (U, 1, out)
            h = ops.rgcn_aggregate_compact(g, feat_c[:, 0, :], norm_e)
        else:
            h = ops.rgcn_layer1(g, x, w, norm_e)
        if self.self_loop:
            loop_w = self.param(
                "loop_weight", init, (self.in_feat, self.out_feat),
                self.param_dtype,
            )
            h = h + x_dst @ loop_w
        if self.bias:
            h = h + self.param(
                "bias", nn.initializers.zeros, (self.out_feat,),
                self.param_dtype,
            )
        if self.activation is not None:
            h = self.activation(h)
        return nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)


class RGCNModel(nn.Module):
    """Two-layer entity-classification RGCN (reference RGCN.py:554-619)."""

    num_nodes: int
    hidden: int
    num_classes: int
    num_rels: int
    featureless: bool = True
    in_feat: Optional[int] = None
    compact: bool = False
    dropout: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        g: HeteroGraph,
        x: Optional[Array] = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        norm_e = ops.rgcn_norm(g)
        if self.featureless:
            h = SeastarRGCNLayer0(
                num_nodes=self.num_nodes,
                num_rels=self.num_rels,
                out_feat=self.hidden,
                activation=jax.nn.relu,
                param_dtype=self.param_dtype,
            )(g, norm_e)
        else:
            h = RGCNLayer(
                in_feat=self.in_feat,
                out_feat=self.hidden,
                num_rels=self.num_rels,
                activation=jax.nn.relu,
                compact=self.compact,
                dropout=self.dropout,
                param_dtype=self.param_dtype,
            )(g, x, norm_e, deterministic=deterministic)
        return RGCNLayer(
            in_feat=self.hidden,
            out_feat=self.num_classes,
            num_rels=self.num_rels,
            compact=self.compact,
            param_dtype=self.param_dtype,
        )(g, h, norm_e, deterministic=deterministic)
