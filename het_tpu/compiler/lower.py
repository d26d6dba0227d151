"""Lowering: Inter-Op SSA program -> executable JAX closure.

Replaces the reference's Jinja-to-CUDA codegen (hrt/pyctor/ir/OpSpecSSA/
codegen.py — left partially NotImplemented upstream) with something
TPU-appropriate: each IR op maps to the framework's differentiable graph
ops (het_tpu.ops), which already dispatch to the Pallas kernels; XLA then
fuses the elementwise chains the reference's TraversalOp fusion would have
hand-scheduled, and ``jax.grad`` of the compiled closure provides an
independent check of the IR-level autodiff.

Source-level codegen lives in ``compiler.codegen`` (standalone emitted
Python with no interpreter dependency); this module is the reference
interpreter the emitted source is tested against."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import ops
from ..ops.common import safe_div
from ..graph.structures import HeteroGraph
from .ir import Op, Program, Var

Array = jax.Array

NODE_KINDS = ("NODEWISE", "DSTNODE", "SRCNODE")


class _Env:
    def __init__(self, g: HeteroGraph):
        self.g = g
        self.vals: Dict[Tuple[str, str], Array] = {}

    def set(self, var: Var, val: Array) -> None:
        self.vals[(var.kind, var.name)] = val

    def lookup(self, var: Var):
        key = (var.kind, var.name)
        if key in self.vals:
            return self.vals[key], var.kind
        # name-aliased node/edge reads (the goldens use kinds loosely)
        for k in NODE_KINDS + ("EDGEWISE",):
            if (k, var.name) in self.vals:
                return self.vals[(k, var.name)], k
        raise KeyError(f"undefined variable {var}")

    def as_edge(self, var: Var) -> Array:
        """Coerce a value to per-edge canonical space (EP, ...)."""
        g = self.g
        if var.is_weight:
            w, _ = self.lookup(var)
            if var.kind == "EDGETYPE":
                return jnp.take(w, g.rel, axis=0)
            if var.kind == "NODETYPE":
                raise ValueError("node-typed weight used edge-wise")
            return jnp.broadcast_to(w, (g.num_padded_edges,) + w.shape)
        val, kind = self.lookup(var)
        if kind == "EDGEWISE":
            return val
        if var.kind == "SRCNODE" or (kind == "SRCNODE"):
            return ops.gather_src(g, val)
        return ops.gather_dst(g, val)

    def as_node(self, var: Var) -> Array:
        val, kind = self.lookup(var)
        assert kind != "EDGEWISE", f"{var} is edge-wise, node value expected"
        return val


def _leaky(x, slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def _exec_op(env: _Env, op: Op) -> None:
    g = env.g
    k = op.kind
    out = op.outputs[0]

    if k in ("NodeDense", "EdgeDense", "CompactDense"):
        xv = op.inputs["input"]
        w, _ = env.lookup(op.inputs["weight"])
        wslice = op.inputs["weight"].kind
        if wslice == "NONE":
            # untyped dense: plain matmul in the input's own space
            x = (
                env.as_node(xv)
                if xv.kind in NODE_KINDS
                else env.as_edge(xv)
            )
            y = x @ w
            if out.kind == "EDGEWISE" and xv.kind in NODE_KINDS:
                y = (
                    ops.gather_src(g, y)
                    if xv.kind == "SRCNODE"
                    else ops.gather_dst(g, y)
                )
            env.set(out, y)
            return
        if wslice == "NODETYPE":
            x = env.as_node(xv)
            env.set(out, ops.ntype_linear(g, x, w[:, None])[:, 0])
            return
        w4 = w[:, None] if w.ndim == 3 else w  # (R, 1, K, O)
        if k == "CompactDense":
            side = op.attrs.get("side", "src")
            x = env.as_node(xv)
            env.set(out, ops.compact_typed_linear(g, x, w4, side=side)[:, 0])
            return
        if xv.kind in ("SRCNODE", "DSTNODE"):
            x = env.as_node(xv)
            side = "src" if xv.kind == "SRCNODE" else "dst"
            env.set(out, ops.edge_typed_linear(g, x, w4, side=side)[:, 0])
        else:
            # per-edge input rows times W[rel]
            x_e = env.as_edge(xv)
            seg = g.edge_rel_seg
            from ..ops.common import take_rows
            rows = take_rows(x_e, seg.perm)
            rows = jnp.where(
                seg.row_valid[:, None], rows, jnp.zeros_like(rows)
            )
            y = ops.segment_matmul_rows(rows, w4, seg)[:, 0]
            env.set(out, seg.scatter_back(y))
        return

    if k == "NodeLinear":
        w, _ = env.lookup(op.inputs["weight"])
        x = env.as_node(op.inputs["input"])
        env.set(out, ops.ntype_linear(g, x, w[:, None])[:, 0])
        return

    if k == "WeightDense":
        l, _ = env.lookup(op.inputs["left"])
        r, _ = env.lookup(op.inputs["right"])
        if r.ndim == l.ndim - 1:
            # matrix x vector per relation: (R, A, B) x (R, B) -> (R, A)
            env.set(out, jnp.einsum("r...ab,r...b->r...a", l, r))
        else:
            env.set(out, jnp.einsum("r...ab,r...bc->r...ac", l, r))
        return

    if k == "Copy":
        # Copy coerces into the destination kind's space (the goldens use
        # it to move node values edge-wise and vice versa)
        if out.kind == "EDGEWISE":
            env.set(out, env.as_edge(op.inputs["input"]))
        else:
            val, kind = env.lookup(op.inputs["input"])
            env.set(out, val)
        return

    if k == "Concatenate":
        l = env.as_edge(op.inputs["left"])
        r = env.as_edge(op.inputs["right"])
        env.set(out, jnp.concatenate([l, r], axis=-1))
        return

    if k == "Split":
        val, _ = env.lookup(op.inputs["input"])
        h = val.shape[-1] // 2
        env.set(op.outputs[0], val[..., :h])
        env.set(op.outputs[1], val[..., h:])
        return

    if k == "Transpose":
        val, _ = env.lookup(op.inputs["input"])
        env.set(out, jnp.swapaxes(val, -1, -2))
        return

    if k == "EdgeInnerProduct":
        if op.attrs.get("compact"):
            # compact-space SDDMM: operands per unique (rel, node) row
            side = op.attrs.get("side", "src")
            info = g.compact_src if side == "src" else g.compact_dst

            def as_c(v):
                val, _ = env.lookup(v)
                if v.is_weight and v.kind == "EDGETYPE":
                    return jnp.take(val, info.seg.row_seg, axis=0)
                return val

            l = as_c(op.inputs["left"])
            r = as_c(op.inputs["right"])
            env.set(out, jnp.sum(l * r, axis=-1))
            return
        l = env.as_edge(op.inputs["left"])
        r = env.as_edge(op.inputs["right"])
        env.set(out, jnp.sum(l * r, axis=-1))
        return

    if k in ("EdgeOuterProduct", "NodeOuterProduct"):
        if out.kind != "EDGEWISE" and all(
            v.kind in NODE_KINDS for v in op.inputs.values()
        ):
            # node-space outer product (dW of a node-space dense)
            l = env.as_node(op.inputs["left"])
            r = env.as_node(op.inputs["right"])
        else:
            l = env.as_edge(op.inputs["left"])
            r = env.as_edge(op.inputs["right"])
        env.set(out, l[..., :, None] * r[..., None, :])
        return

    if k == "EdgeScalarVectorMul":
        s = env.as_edge(op.inputs["scalar"])
        v = env.as_edge(op.inputs["vector"])
        env.set(out, s[..., None] * v)
        return

    if k in ("LeakyRelu", "Exponential", "Tanh", "Negative"):
        val, _ = env.lookup(op.inputs["input"])
        fn = {
            "LeakyRelu": _leaky,
            "Exponential": jnp.exp,
            "Tanh": jnp.tanh,
            "Negative": jnp.negative,
        }[k]
        env.set(out, fn(val))
        return

    if k == "GradLeakyRelu":
        d, _ = env.lookup(op.inputs["delta"])
        p, _ = env.lookup(op.inputs["primal"])
        env.set(out, d * jnp.where(p >= 0, 1.0, 0.2))
        return

    if k in ("ScalarDivide", "ScalarMultiply", "ScalarAdd", "VectorAdd",
             "MatrixAdd"):
        if out.is_weight or (
            op.inputs["left"].is_weight and op.inputs["right"].is_weight
        ):
            l, _ = env.lookup(op.inputs["left"])
            r, _ = env.lookup(op.inputs["right"])
        elif out.kind == "EDGEWISE":
            l = env.as_edge(op.inputs["left"])
            r = env.as_edge(op.inputs["right"])
        else:
            l = env.as_node(op.inputs["left"])
            r = env.as_node(op.inputs["right"])
        if k == "ScalarDivide":
            env.set(out, safe_div(l, r))
        elif k == "ScalarMultiply":
            env.set(out, l * r)
        else:
            env.set(out, l + r)
        return

    if k == "NodeSumAccumulation":
        v = env.as_edge(op.inputs["input"])
        v = g.edge_mask(v)
        if out.kind == "SRCNODE":
            env.set(out, ops.scatter_sum_src(g, v))
        else:
            env.set(out, ops.scatter_sum_dst(g, v))
        return

    if k == "EdgeTypeSumAccumulation":
        v = env.as_edge(op.inputs["input"])
        v = g.edge_mask(v)
        env.set(
            out,
            jax.ops.segment_sum(v, g.rel, num_segments=g.num_rels),
        )
        return

    if k == "RowSumAccumulation":
        xv = op.inputs["input"]
        if xv.kind == "EDGEWISE":
            v = env.as_edge(xv)
            env.set(out, jnp.sum(g.edge_mask(v), axis=0))
        else:
            env.set(out, jnp.sum(env.as_node(xv), axis=0))
        return

    if k == "NodeTypeSumAccumulation":
        val = env.as_node(op.inputs["input"])
        offs = jnp.asarray(g.ntype_offsets)
        node_ntype = jnp.searchsorted(
            offs[1:], jnp.arange(g.num_nodes), side="right"
        ).astype(jnp.int32)
        env.set(
            out,
            jax.ops.segment_sum(val, node_ntype,
                                num_segments=g.num_ntypes),
        )
        return

    if k == "FusedEdgeSoftmaxAgg":
        logits = env.as_edge(op.inputs["logits"])
        msg = env.as_edge(op.inputs["msg"])
        env.set(out, ops.edge_softmax_weighted_sum(g, logits, msg))
        return

    if k == "ExpandCompact":
        val, _ = env.lookup(op.inputs["input"])
        side = op.attrs.get("side", "src")
        env.set(out, ops.expand_compact(g, val, side=side))
        return

    raise NotImplementedError(f"no lowering for op kind {k}")


def compile_program(prog: Program, outputs=None) -> Callable:
    """Program -> ``fn(graph, inputs: dict[name], weights: dict[name]) ->
    dict[name, Array]``, fully jit/grad-able."""
    prog.validate()
    if outputs is None:
        # final values: defined but never read afterwards
        read = set()
        for op in prog.ops:
            for v in op.inputs.values():
                read.add(v.name)
        outputs = []
        for op in prog.ops:
            for o in op.outputs:
                if o.name not in read:
                    outputs.append(o)

    def fn(g: HeteroGraph, inputs: Dict[str, Array],
           weights: Dict[str, Array]) -> Dict[str, Array]:
        env = _Env(g)
        for v in prog.inputs:
            env.set(v, inputs[v.name])
        for v in prog.weights:
            env.set(v, weights[v.name])
        for op in prog.ops:
            _exec_op(env, op)
        return {o.name: env.lookup(o)[0] for o in outputs}

    fn.output_vars = outputs  # type: ignore[attr-defined]
    return fn


