"""Dissect the headline RGAT compact+multfirst step: where do the ms go?

Times cumulative sub-chains of the exact bench step on device plus a set
of micro-experiments on narrow-lane (EP, 12)-class traffic, to locate the
composition overhead (BREAKDOWN_r2: fwd 7.4 ms vs ~3.5 ms of components).

Run: python scripts/dissect_rgat.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from het_tpu import ops
from het_tpu.data import load_dataset
from het_tpu.models import RGATModel
from het_tpu.utils.timing import op_time_ms

heads, f_in, hidden = 4, 64, 64
scale = float(os.environ.get("HET_BENCH_SCALE", "0.018"))
data = load_dataset("mag", tile=128, num_classes=8, scale=scale)
g = data.graph
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (g.num_nodes, f_in))
labels = jnp.asarray(data.labels) % 8

model = RGATModel(
    in_feat=f_in, hidden=hidden, num_classes=8, num_rels=g.num_rels,
    num_heads=heads, num_layers=1, dropout=0.0, stable_softmax="clip",
    compact=True, multiply_first=True,
)
ops.set_backend("xla")
params = model.init(jax.random.PRNGKey(1), g, x)
ops.set_backend("pallas")

R = g.num_rels
H = heads
D = 8 // H  # out_feat = num_classes = 8 for the 1-layer model
results = {}


def t(name, fn, x0=x):
    ms = op_time_ms(fn, x0, n1=2, n2=14, trials=2)
    results[name] = round(ms, 3)
    print(f"{name:55s} {ms:8.3f} ms", flush=True)
    return ms


def loss_of(logits):
    from het_tpu.utils.misc import nll_loss

    return nll_loss(logits, labels)


# ---------------- 1. the full step and coarse splits
def step(xx):
    def loss_fn(p):
        return loss_of(model.apply(p, g, xx))

    return jax.value_and_grad(loss_fn)(params)


t("full step (value_and_grad)", step)
t("fwd only (model.apply + loss)", lambda xx: loss_of(model.apply(params, g, xx)))
t("fwd only (model.apply, no loss)", lambda xx: model.apply(params, g, xx))

# ---------------- 2. layer sub-chains (mirror models/rgat.py compact+multfirst)
p = params["params"]["RGATLayer_0"]
conv_w = p["conv_weights"]  # (R, H, f_in, D)
attn_l, attn_r = p["attn_l"], p["attn_r"]
bias = p["h_bias"]

wa_l = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_l)
wa_r = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_r)
w_cat = jnp.concatenate([conv_w, wa_l[..., None]], axis=-1)


def fe_of(xx):
    return ops.compact_typed_linear(g, xx, w_cat, side="src")


def er_of(xx):
    return ops.compact_typed_linear(g, xx, wa_r[..., None], side="dst")[..., 0]


t("A: fe = compact_typed_linear src (D+1)", fe_of)
t("B: A + er_c (dst typed linear)", lambda xx: (fe_of(xx), er_of(xx)))


def fused_of(xx):
    fe = fe_of(xx)
    feat_c, el_c = fe[..., :D], fe[..., D]
    er_c = er_of(xx)
    return ops.relational_fused_gat_compact(
        g, feat_c, el_c, er_c, 0.2, stable="clip"
    )


t("C: B + fused compact agg fwd", fused_of)
t("D: C + bias (== layer fwd)", lambda xx: fused_of(xx).reshape(g.num_nodes, 8) + bias)

# fused fwd from fixed compact inputs (isolate from the producers)
ops.set_backend("xla")
fe0 = fe_of(x)
feat_c0, el_c0 = fe0[..., :D], fe0[..., D]
er_c0 = er_of(x)
ops.set_backend("pallas")
UCs = feat_c0.shape[0]

t(
    "fused compact fwd alone (fixed inputs)",
    lambda fc: ops.relational_fused_gat_compact(g, fc, el_c0, er_c0, 0.2, stable="clip"),
    feat_c0,
)


def fused_vjp(fc):
    out, vjp = jax.vjp(
        lambda a, b, c: ops.relational_fused_gat_compact(g, a, b, c, 0.2, stable="clip"),
        fc, el_c0, er_c0,
    )
    return vjp(out)


t("fused compact fwd+bwd alone (fixed inputs)", fused_vjp, feat_c0)

# ---------------- 3. inside the fused fwd: producers vs kernel
from het_tpu.ops.common import take_rows, gather_dst
from het_tpu.ops.pallas.seg_reduce import seg_sum_dst_pallas_raw

infoS, infoD = g.compact_src, g.compact_dst
EP = g.num_padded_edges
HD = H * D
feat_c2d0 = feat_c0.reshape(UCs, HD)


def producers(fc2d):
    raw = take_rows(el_c0, infoS.edge_map) + take_rows(er_c0, infoD.edge_map)
    z = jnp.exp(jnp.clip(jax.nn.leaky_relu(raw, 0.2), -60, 60))
    feat_e = take_rows(fc2d, infoS.edge_map)
    zf = (feat_e.reshape(EP, H, D) * z[..., None]).reshape(EP, HD)
    pad = -(H + HD) % 128
    return jnp.concatenate([z, zf, jnp.zeros((EP, pad), jnp.float32)], axis=1)


t("fused-fwd producers only (gathers+exp+pack)", producers, feat_c2d0)

packed0 = jax.jit(producers)(feat_c2d0)
t("seg_sum kernel only (on prebuilt packed)", lambda pk: seg_sum_dst_pallas_raw(g, pk), packed0)

t(
    "raw-logit gathers only (el+er -> (EP,H))",
    lambda e: take_rows(e, infoS.edge_map) + take_rows(er_c0, infoD.edge_map),
    el_c0,
)
t("feat gather only ((UC,8) -> (EP,8))", lambda fc: take_rows(fc, infoS.edge_map), feat_c2d0)

# ---------------- 4. micro-experiments: narrow-lane traffic
UC128 = jnp.zeros((UCs, 128), jnp.float32) + 1.0
idx = infoS.edge_map

t("micro: take (UC,128) -> (EP,128)", lambda a: take_rows(a, idx), UC128)
t("micro: take (UC,12) -> (EP,12)", lambda a: take_rows(a, idx), UC128[:, :12] + 0.0)
t("micro: take (UC,16) -> (EP,16)", lambda a: take_rows(a, idx), UC128[:, :16] + 0.0)

# folded flat gather: out[i, j] = flat[fidx[i, j]] with static fold indices
kfold = 8
EPf = EP // kfold
C_useful = 16
fidx = (
    np.asarray(idx).reshape(EPf, kfold)[:, :, None] * C_useful
    + np.arange(C_useful)[None, None, :]
).reshape(EPf, kfold * C_useful)
fidx = jnp.asarray(fidx, jnp.int32)
flat_src = jnp.reshape(UC128[:, :C_useful] + 0.0, (-1,))
t("micro: flat-gather folded (EP/8,128)", lambda fs: jnp.take(fs, fidx), flat_src)

# elementwise pass over (EP,128) for reference
E128 = jnp.zeros((EP, 128), jnp.float32) + 1.0
t("micro: elementwise (EP,128) r+w", lambda a: a * 1.0001 + 0.5, E128)
t("micro: gather_dst (N,128) -> (EP,128)", lambda a: gather_dst(g, a), jnp.zeros((g.num_nodes, 128), jnp.float32) + 1.0)

print(json.dumps(results, indent=1))
