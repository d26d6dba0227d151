"""Compiler tests: DSL parse -> golden conformance, serialization
round-trip, compiled execution vs hand-written model math, IR autodiff vs
jax.grad (the check the reference never reached — its autodiff is a stub).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.compiler import (
    Program,
    Var,
    compile_dsl,
    compile_program,
    differentiate,
    dumps,
    grad_program,
    loads,
    parse_dsl,
)
from het_tpu.compiler.passes import run_default
from het_tpu.graph import random_heterograph
from het_tpu import ops

REF_DSL = "/root/reference/hrt/pyctor/examples/inter-op-dsl"
REF_SSA = "/root/reference/hrt/pyctor/examples/inter-op-ssa"

RGAT_DSL = """
for e in g.edges():
    e["zi"] = e.src.feature * W[e.etype]
    e["raw_attn_tmp1"] = inner_product(attn_vec[e.etype], e.zi)
    e["raw_attn_tmp2"] = leakyrelu(e.raw_attn_tmp1)
    e["raw_attn"] = exp(e.raw_attn_tmp2)

for n in g.dst_nodes():
    n["attn_sum"] = 0.0
    for e in n.incoming_edges():
        n["attn_sum"] += e.raw_attn
for e in g.edges():
    e["attn"] = e.raw_attn / e.dst.attn_sum

for n in g.dst_nodes():
    n["output"] = 0.0
    for e in n.incoming_edges():
        n["output"] += e.attn * e.zi
"""


def _toy(seed=0):
    return random_heterograph(
        num_nodes=30, num_edges=150, num_rels=3, seed=seed, tile=8
    )


def test_parse_reference_rgat_dsl():
    """The reference's own rgat.inter-op must parse into the op mix its
    rgat.inter-op-ssa golden documents."""
    src = open(os.path.join(REF_DSL, "rgat.inter-op")).read()
    prog = run_default(parse_dsl(src))
    kinds = sorted(op.kind for op in prog.ops)
    for expected in (
        "NodeDense",
        "Concatenate",
        "EdgeInnerProduct",
        "LeakyRelu",
        "Exponential",
        "NodeSumAccumulation",
        "ScalarDivide",
        "EdgeScalarVectorMul",
    ):
        assert expected in kinds, f"missing {expected} in {kinds}"
    # two typed denses (zi from src, zj from dst), two aggregations
    assert kinds.count("NodeDense") == 2
    assert kinds.count("NodeSumAccumulation") == 2


def test_loads_reference_ssa_goldens():
    """Parse every well-formed reference .inter-op-ssa example."""
    for name in (
        "rgat.inter-op-ssa",
        "single_dense.inter-op-ssa",
        "hgt.inter-op-ssa",  # nested fused TraversalOp scopes
    ):
        prog = loads(open(os.path.join(REF_SSA, name)).read())
        assert prog.ops, name
        prog.validate()


def test_serialize_roundtrip():
    prog = run_default(parse_dsl(RGAT_DSL))
    text = dumps(prog)
    prog2 = loads(text)
    assert len(prog.ops) == len(prog2.ops)
    for a, b in zip(prog.ops, prog2.ops):
        assert a.kind == b.kind and a.outputs == b.outputs, (a, b)


def test_compiled_rgat_matches_manual():
    """The compiled DSL program must equal the hand-written op math."""
    g = _toy()
    F, D = 8, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, F), dtype=np.float32))
    W = jnp.asarray(
        rng.standard_normal((g.num_rels, F, D), dtype=np.float32)
    )
    a = jnp.asarray(rng.standard_normal((g.num_rels, D), dtype=np.float32))

    fn, prog = compile_dsl(RGAT_DSL)
    out = fn(g, {"feature": x}, {"W": W, "attn_vec": a})["output"]

    # manual: zi = x[src] W[rel]; logits = <a[rel], zi>; softmax over dst;
    # output = sum attn * zi
    zi = ops.edge_typed_linear(g, x, W[:, None])[:, 0]
    logits = jnp.sum(jnp.take(a, g.rel, axis=0) * zi, axis=-1)
    alpha = ops.edge_softmax(g, jax.nn.leaky_relu(logits, 0.2)[:, None])
    want = ops.scatter_sum_dst(g, zi * alpha)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_ir_autodiff_matches_jax_grad():
    """IR-level reverse mode vs jax.grad of the compiled forward."""
    g = _toy(seed=1)
    F, D = 6, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, F), dtype=np.float32))
    W = jnp.asarray(
        rng.standard_normal((g.num_rels, F, D), dtype=np.float32) * 0.5
    )
    a = jnp.asarray(rng.standard_normal((g.num_rels, D), dtype=np.float32))

    fwd_prog = run_default(parse_dsl(RGAT_DSL))
    fwd = compile_program(fwd_prog)

    def loss(x, W, a):
        return jnp.sum(fwd(g, {"feature": x}, {"W": W, "attn_vec": a})["output"])

    gx, gW, ga = jax.grad(loss, argnums=(0, 1, 2))(x, W, a)

    comb_prog = grad_program(fwd_prog)
    comb = compile_program(
        comb_prog,
        outputs=[
            Var("SRCNODE", "feature_delta"),
            Var("EDGETYPE", "W_delta"),
            Var("EDGETYPE", "attn_vec_delta"),
        ],
    )
    seed = jnp.ones((g.num_nodes, D), jnp.float32)
    res = comb(
        g,
        {"feature": x, "output_delta": seed},
        {"W": W, "attn_vec": a},
    )
    np.testing.assert_allclose(np.asarray(res["feature_delta"]),
                               np.asarray(gx), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res["W_delta"]),
                               np.asarray(gW), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res["attn_vec_delta"]),
                               np.asarray(ga), rtol=1e-3, atol=1e-4)


def test_compiled_program_jits():
    g = _toy(seed=2)
    fn, _ = compile_dsl(RGAT_DSL)
    x = jnp.ones((g.num_nodes, 4))
    W = jnp.ones((g.num_rels, 4, 4)) * 0.1
    a = jnp.ones((g.num_rels, 4)) * 0.1
    out = jax.jit(
        lambda x, W, a: fn(g, {"feature": x}, {"W": W, "attn_vec": a})
    )(x, W, a)
    assert np.all(np.isfinite(np.asarray(out["output"])))


def test_emit_python_is_executable():
    """The emitted source must exec and reproduce the compiled closure."""
    from het_tpu.compiler import emit_python

    g = _toy(seed=3)
    fn, prog = compile_dsl(RGAT_DSL)
    x = jnp.ones((g.num_nodes, 4))
    W = jnp.ones((g.num_rels, 4, 4)) * 0.1
    a = jnp.ones((g.num_rels, 4)) * 0.1
    want = fn(g, {"feature": x}, {"W": W, "attn_vec": a})["output"]

    src = emit_python(prog, "generated")
    ns = {}
    exec(src, ns)
    got = ns["generated"](g, {"feature": x}, {"W": W, "attn_vec": a})[
        "output"
    ]
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-6)
