"""Learned node embeddings for featureless heterographs.

Reference: ``RelGraphEmbed`` / ``HET_RelGraphEmbed``
(hrt/python/RGNNUtils/RGNNUtils.py:36,78) — one embedding row per node,
trained jointly with the model."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class NodeEmbed(nn.Module):
    num_nodes: int
    embed_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> Array:
        emb = self.param(
            "embed",
            nn.initializers.uniform(scale=1.0),
            (self.num_nodes, self.embed_dim),
            self.param_dtype,
        )
        return emb
