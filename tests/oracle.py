"""Brute-force numpy oracles for every op — the test-side ground truth.

Mirrors the reference's oracle strategy (hrt/python/testing/ref_kernels_lite):
straight-line dense implementations with no padding/tiling tricks, written
independently of the framework code paths, used for allclose checks.
"""

from __future__ import annotations

import numpy as np


def edges_of(g):
    """Real (unpadded) src, dst, rel as numpy."""
    E = g.num_edges
    return (
        np.asarray(g.src)[:E],
        np.asarray(g.dst)[:E],
        np.asarray(g.rel)[:E],
    )


def typed_linear_edges(g, x, w, side="src"):
    """(E, H, O): y_e = x[side(e)] @ W[rel(e)]."""
    src, dst, rel = edges_of(g)
    idx = src if side == "src" else dst
    x = np.asarray(x)
    w = np.asarray(w)  # (R, H, K, O)
    E, (R, H, K, O) = len(idx), w.shape
    out = np.zeros((E, H, O), dtype=np.float64)
    for e in range(E):
        xe = x[idx[e]]
        for h in range(H):
            v = xe if x.ndim == 2 else xe[h if x.shape[1] > 1 else 0]
            out[e, h] = v @ w[rel[e], h]
    return out


def ntype_linear(g, x, w):
    """(N, H, O): y_n = x[n] @ W[ntype(n)]."""
    x, w = np.asarray(x), np.asarray(w)
    N = g.num_nodes
    R, H, K, O = w.shape
    ntype = np.zeros(N, dtype=np.int64)
    for t in range(g.num_ntypes):
        ntype[g.ntype_offsets[t] : g.ntype_offsets[t + 1]] = t
    out = np.zeros((N, H, O), dtype=np.float64)
    for n in range(N):
        for h in range(H):
            v = x[n] if x.ndim == 2 else x[n, h if x.shape[1] > 1 else 0]
            out[n, h] = v @ w[ntype[n], h]
    return out


def leaky_relu(x, slope):
    return np.where(x >= 0, x, slope * x)


def fused_gat(g, feat_src_e, el_e, er_e, slope):
    """(N, H, D) dense edge-softmax aggregation."""
    src, dst, rel = edges_of(g)
    E = len(src)
    feat = np.asarray(feat_src_e, dtype=np.float64)[:E]
    el = np.asarray(el_e, dtype=np.float64)[:E]
    er = np.asarray(er_e, dtype=np.float64)[:E]
    N, H, D = g.num_nodes, feat.shape[1], feat.shape[2]
    expv = np.exp(leaky_relu(el + er, slope))  # (E, H)
    s = np.zeros((N, H))
    for e in range(E):
        s[dst[e]] += expv[e]
    out = np.zeros((N, H, D))
    for e in range(E):
        out[dst[e]] += feat[e] * (expv[e] / s[dst[e]])[:, None]
    return out


def hgt_softmax_agg(g, message_e, score_e, mu):
    src, dst, rel = edges_of(g)
    E = len(src)
    msg = np.asarray(message_e, dtype=np.float64)[:E]
    sc = np.asarray(score_e, dtype=np.float64)[:E]
    mu = np.asarray(mu, dtype=np.float64)
    N, H, D = g.num_nodes, msg.shape[1], msg.shape[2]
    expv = np.exp(sc * mu[rel])  # (E, H)
    s = np.zeros((N, H))
    for e in range(E):
        s[dst[e]] += expv[e]
    out = np.zeros((N, H, D))
    for e in range(E):
        out[dst[e]] += msg[e] * (expv[e] / s[dst[e]])[:, None]
    return out


def inner_product(g, left_e, right, side="dst"):
    src, dst, rel = edges_of(g)
    E = len(src)
    idx = dst if side == "dst" else src
    left = np.asarray(left_e, dtype=np.float64)[:E]
    r = np.asarray(right, dtype=np.float64)
    return np.sum(left * r[idx], axis=-1)


def rgcn_layer1(g, x, w, norm_e):
    src, dst, rel = edges_of(g)
    E = len(src)
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)  # (R, K, O)
    norm = np.asarray(norm_e, dtype=np.float64)[:E]
    out = np.zeros((g.num_nodes, w.shape[2]))
    for e in range(E):
        out[dst[e]] += norm[e] * (x[src[e]] @ w[rel[e]])
    return out
