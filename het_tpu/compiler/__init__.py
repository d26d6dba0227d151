"""het_tpu.compiler — the two-level graph-program compiler ("pyctor" in the
reference, hrt/pyctor/): Inter-Op DSL -> Inter-Op SSA -> passes (value
numbering, shape inference, binop realization) -> rewrites (compact
materialization, linear-operator reordering) -> autodiff -> JAX lowering.
"""

from .ir import Op, Program, Var  # noqa: F401
from .frontend import parse_dsl  # noqa: F401
from .serialize import dumps, loads  # noqa: F401
from .passes import PassManager, Pass, run_default  # noqa: F401
from .autodiff import differentiate  # noqa: F401
from .fuse import fuse_edge_softmax  # noqa: F401
from .lower import compile_program  # noqa: F401
from .codegen import compile_emitted, emit_python  # noqa: F401
from .opspec import (  # noqa: F401
    dumps_opspec,
    parse_opspec_ssa,
    schedule_program,
)


def compile_dsl(source: str, outputs=None, shape_hints=None):
    """DSL source -> (forward closure, analyzed Program)."""
    prog = run_default(parse_dsl(source), shape_hints=shape_hints)
    return compile_program(prog, outputs=outputs), prog


def grad_program(fwd: Program) -> Program:
    """Forward + reverse ops in one executable program: feed primal inputs
    plus ``<output>_delta`` seeds, read ``<input/weight>_delta`` results."""
    from .passes import run_default as _run

    bck = differentiate(fwd)
    combined = Program(ops=list(fwd.ops) + list(bck.ops))
    _run(combined)
    return combined
