"""Link prediction: RGNN encoder + DistMult decoder.

Covers the knowledge-graph configs the reference targets with
ogbl-wikikg2 / FB15k-237 / ogbl-biokg (BASELINE.json config
"RGAT link prediction on FB15k-237"; the reference trains these datasets
through the same entity pipeline — hrt/python/utils_lite/
graphiler_datasets.py — without a dedicated decoder, so this is the
completed form of that capability).

Training: split edges into message-passing / supervision sets, encode
nodes with any het_tpu model, score (s, r, o) triples with DistMult
(score = <e_s, w_r * e_o>), binary cross-entropy against uniform
corrupted negatives.  Eval: filtered-free MRR/Hits@k over sampled
candidate sets.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import Dataset, load_dataset
from ..graph.build import build_heterograph
from ..models import NodeEmbed, RGATModel
from .config import TrainConfig


def _distmult(emb, w_rel, s, r, o):
    return jnp.sum(emb[s] * jnp.take(w_rel, r, axis=0) * emb[o], axis=-1)


def train_link(cfg: TrainConfig, data: Optional[Dataset] = None,
               neg_ratio: int = 4, return_state: bool = False
               ) -> Dict[str, Any]:
    """Link-prediction training; returns metrics incl. MRR / Hits@10.

    ``return_state`` adds a non-serializable ``_state`` entry (final
    embeddings, relation weights, supervision triples) so tests can
    re-derive the MRR independently (tests/test_accuracy_parity.py)."""
    from .. import ops as _ops

    _ops.set_backend(cfg.backend)
    if data is None:
        data = load_dataset(
            cfg.dataset, scale=cfg.dataset_scale, seed=cfg.seed,
            tile=cfg.tile, build_compact=cfg.compact,
        )
    g_full = data.graph
    E = g_full.num_edges
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(E)
    n_sup = max(E // 10, 1)
    sup_idx, msg_idx = perm[:n_sup], perm[n_sup:]
    src = np.asarray(g_full.src)[:E]
    dst = np.asarray(g_full.dst)[:E]
    rel = np.asarray(g_full.rel)[:E]
    # message-passing graph excludes supervision edges (standard KG setup)
    g = build_heterograph(
        src[msg_idx], dst[msg_idx], rel[msg_idx], g_full.num_nodes,
        g_full.num_rels, tile=cfg.tile, build_compact=cfg.compact,
    )
    sup_s = jnp.asarray(src[sup_idx], jnp.int32)
    sup_o = jnp.asarray(dst[sup_idx], jnp.int32)
    sup_r = jnp.asarray(rel[sup_idx], jnp.int32)

    key = jax.random.PRNGKey(cfg.seed)
    k_embed, k_model, k_run = jax.random.split(key, 3)
    embed = NodeEmbed(num_nodes=g.num_nodes, embed_dim=cfg.n_infeat)
    e_params = embed.init(k_embed)
    model = RGATModel(
        in_feat=cfg.n_infeat, hidden=cfg.hidden, num_classes=cfg.hidden,
        num_rels=g.num_rels, num_heads=cfg.num_heads,
        num_layers=max(cfg.num_layers, 1), compact=cfg.compact,
        multiply_first=cfg.multiply_first, dropout=cfg.dropout,
        stable_softmax=cfg.stable_softmax,
    )
    m_params = model.init(k_model, g, embed.apply(e_params))
    w_rel = jax.random.normal(k_model, (g.num_rels, cfg.hidden)) * 0.1
    params = {"embed": e_params, "model": m_params, "w_rel": w_rel}

    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    def encode(params):
        x = embed.apply(params["embed"])
        return model.apply(params["model"], g, x)

    def loss_fn(params, key):
        emb = encode(params)
        pos = _distmult(emb, params["w_rel"], sup_s, sup_r, sup_o)
        k1, k2 = jax.random.split(key)
        n = sup_s.shape[0] * neg_ratio
        neg_o = jax.random.randint(k1, (n,), 0, g.num_nodes)
        neg_s = jnp.repeat(sup_s, neg_ratio)
        neg_r = jnp.repeat(sup_r, neg_ratio)
        neg = _distmult(emb, params["w_rel"], neg_s, neg_r, neg_o)
        loss = jnp.mean(jax.nn.softplus(-pos)) + jnp.mean(
            jax.nn.softplus(neg)
        )
        return loss

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def mrr_eval(params, key, num_cand: int = 100):
        emb = encode(params)
        cand = jax.random.randint(
            key, (sup_s.shape[0], num_cand), 0, g.num_nodes
        )
        pos = _distmult(emb, params["w_rel"], sup_s, sup_r, sup_o)
        e_s = emb[sup_s] * jnp.take(params["w_rel"], sup_r, axis=0)
        cand_sc = jnp.einsum("bd,bcd->bc", e_s, emb[cand])
        rank = 1 + jnp.sum(cand_sc > pos[:, None], axis=1)
        return jnp.mean(1.0 / rank), jnp.mean((rank <= 10).astype(
            jnp.float32))

    losses = []
    t0 = time.perf_counter()
    for ep in range(cfg.num_epochs):
        k_run, k = jax.random.split(k_run)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    wall = time.perf_counter() - t0
    mrr, hits10 = mrr_eval(params, jax.random.PRNGKey(1))
    state = {}
    if return_state:
        state["_state"] = {
            "emb": np.asarray(encode(params)),
            "w_rel": np.asarray(params["w_rel"]),
            "sup": (np.asarray(sup_s), np.asarray(sup_r),
                    np.asarray(sup_o)),
        }
    return {
        **state,
        "task": "link_prediction",
        "dataset": data.name,
        "loss_list": losses,
        "mrr": float(mrr),
        "hits@10": float(hits10),
        "epochs": cfg.num_epochs,
        "wall_s": wall,
        "num_supervision_edges": int(n_sup),
        "synthetic_data": data.meta.get("synthetic", False),
    }
