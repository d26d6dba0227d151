"""Minibatch (neighbor-sampled) training.

The reference's ``HET_RGNN_train`` drives either full-graph or DGL-sampled
minibatch iterations (hrt/python/RGNNUtils/RGNNUtils.py:199-433 +
mydglgraph_converters.py:18-103).  Here the sampler is the in-tree
:class:`~het_tpu.data.sampling.NeighborSampler`; per-batch subgraphs are
ordinary HeteroGraphs.

jit-stability note: each batch's subgraph has its own shapes, so a naive
loop recompiles per batch.  Shapes are stabilized by (a) fixed seed count
per batch and (b) padding edge totals to a shared bucket
(``pad_edges_to``); node counts still vary, so the loss is computed under
``jax.jit`` keyed by the (bucketed) shape tuple — a handful of compiles,
then cache hits.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import Dataset, load_dataset
from ..data.sampling import NeighborSampler
from ..graph.build import round_up
from .config import TrainConfig
from .driver import build_model


def train_minibatch(
    cfg: TrainConfig, data: Optional[Dataset] = None
) -> Dict[str, Any]:
    """Neighbor-sampled minibatch training over seed-node batches."""
    from .. import ops as _ops

    _ops.set_backend(cfg.backend)
    if data is None:
        data = load_dataset(
            cfg.dataset, scale=cfg.dataset_scale,
            num_classes=cfg.num_classes, seed=cfg.seed, tile=cfg.tile,
            build_compact=cfg.compact,
        )
    g_full = data.graph
    E = g_full.num_edges
    sampler = NeighborSampler(
        np.asarray(g_full.src)[:E],
        np.asarray(g_full.dst)[:E],
        np.asarray(g_full.rel)[:E],
        g_full.num_nodes,
        g_full.num_rels,
        fanout=cfg.fanout,
        num_hops=cfg.num_hops,
        seed=cfg.seed,
    )
    model = build_model(cfg, data)
    labels_full = np.asarray(data.labels)

    # feature source: learned global embedding table, rows gathered per batch
    key = jax.random.PRNGKey(cfg.seed)
    k_emb, key = jax.random.split(key)
    embed = jax.random.uniform(k_emb, (g_full.num_nodes, cfg.n_infeat))

    params = None
    tx = optax.adam(cfg.lr)
    opt_state = None

    B = cfg.batch_size  # static: the loop only runs full-size batches

    @jax.jit
    def step(params, opt_state, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            logp = jax.nn.log_softmax(logits[:B], axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, y[:B, None], axis=1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    t0 = time.perf_counter()
    seeds_all = np.asarray(data.train_idx)
    n_batches = 0
    # pad to shared shapes: fixed seed count, bucketed edge totals
    assert not cfg.compact, "minibatch mode: compact not supported yet"
    max_edges = cfg.batch_size * sum(
        cfg.fanout ** h for h in range(1, cfg.num_hops + 1)
    )
    pad_edges = round_up(max_edges + 2048, 2048)
    pad_nodes = round_up(max_edges + cfg.batch_size, max(cfg.tile, 128))
    for ep in range(cfg.num_epochs):
        rng = np.random.default_rng(cfg.seed + ep)
        order = rng.permutation(len(seeds_all))
        for i in range(0, len(order) - cfg.batch_size + 1, cfg.batch_size):
            seeds = seeds_all[order[i : i + cfg.batch_size]]
            sub, node_map = sampler.sample(
                seeds, tile=cfg.tile, pad_edges_to=pad_edges,
                pad_nodes_to=pad_nodes,
            )
            x = jnp.asarray(np.asarray(embed)[node_map])
            y = jnp.asarray(labels_full[node_map].astype(np.int32))
            if params is None:
                k_init, key = jax.random.split(key)
                params = model.init(k_init, sub, x)
                opt_state = tx.init(params)
            params, opt_state, loss = step(params, opt_state, sub, x, y)
            losses.append(float(loss))
            n_batches += 1
            if n_batches >= cfg.max_batches:
                break
        if n_batches >= cfg.max_batches:
            break
    wall = time.perf_counter() - t0
    return {
        "task": "minibatch_entity",
        "dataset": data.name,
        "loss_list": losses,
        "n_batches": n_batches,
        "wall_s": wall,
        "batch_size": cfg.batch_size,
        "fanout": cfg.fanout,
        "num_hops": cfg.num_hops,
        "synthetic_data": data.meta.get("synthetic", False),
    }
