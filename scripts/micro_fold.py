"""Micro-benchmarks for the folded edge layout plan: can XLA produce
(EP/8, 128)-folded per-edge data cheaply from row gathers, and how fast are
folded elementwise / constant-matmul lane shuffles?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from het_tpu.data import load_dataset
from het_tpu.utils.timing import op_time_ms

data = load_dataset("mag", tile=128, num_classes=8, scale=0.018)
g = data.graph
EP = g.num_padded_edges
idx = g.compact_src.edge_map  # (EP,) random-ish rows
UC = int(jnp.max(idx)) + 1
k, C = 8, 16
EPf = EP // k

src16 = jnp.ones((UC, C), jnp.float32)
src128 = jnp.ones((UC, 128), jnp.float32)
dst = g.dst
N = g.num_nodes


def t(name, fn, x0):
    ms = op_time_ms(fn, x0, n1=2, n2=14, trials=2)
    print(f"{name:58s} {ms:8.3f} ms", flush=True)
    return ms


# M1: folded gather — take + reshape fused?
t("take (UC,16) -> (EP,16) [unfolded ref]", lambda a: jnp.take(a, idx, axis=0), src16)
t(
    "take (UC,16) -> reshape (EP/8,128) [folded]",
    lambda a: jnp.take(a, idx, axis=0).reshape(EPf, 128),
    src16,
)
# gather already-folded indices: out rows pick 8 source rows each -> (EPf,8,16)->reshape
idx2 = idx.reshape(EPf, k)
t(
    "take (UC,16) by (EP/8,8) idx -> reshape (EP/8,128)",
    lambda a: jnp.take(a, idx2, axis=0).reshape(EPf, 128),
    src16,
)

# M1b: folded dst gather (for ct gathers in backward)
nsrc16 = jnp.ones((N + 1, C), jnp.float32)
t(
    "gather_dst folded: take (N,16) by dst -> (EP/8,128)",
    lambda a: jnp.take(a, dst, axis=0).reshape(EPf, 128),
    nsrc16,
)

# M2: folded elementwise + exp
Ef = jnp.ones((EPf, 128), jnp.float32)
t("elementwise (EP/8,128) r+w", lambda a: a * 1.0001 + 0.5, Ef)
t("exp (EP/8,128)", lambda a: jnp.exp(a * 0.9), Ef)

# M3: constant 0/1 matmul lane shuffle on folded rows
SEL = jnp.asarray(np.eye(128, dtype=np.float32)[np.arange(128) // 16 * 16])
t(
    "const matmul (EP/8,128)@(128,128) [lane bcast]",
    lambda a: jax.lax.dot(a, SEL, precision=jax.lax.Precision.HIGHEST),
    Ef,
)
t(
    "const matmul bf16 (EP/8,128)@(128,128)",
    lambda a: jax.lax.dot_general(
        a.astype(jnp.bfloat16), SEL.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ),
    Ef,
)

# M4: two gathers + elementwise + fold, all in one jit (the real producer)
el16 = jnp.ones((UC, C), jnp.float32)


def producer(a):
    ge = jnp.take(a, idx, axis=0)  # (EP,16)
    gr = jnp.take(el16, idx, axis=0)
    z = jnp.exp(jnp.clip(ge + gr, -60, 60))
    return z.reshape(EPf, 128)


t("2 gathers + exp + fold (one jit)", producer, src16)

# M5: unfold (EP/8,128) -> (EP,16) then narrow gather back? (permute check)
perm = g.compact_src.edge_sort_perm
t(
    "permute folded: unfold+take+fold",
    lambda a: jnp.take(a.reshape(EP, C), perm, axis=0).reshape(EPf, 128),
    Ef,
)
