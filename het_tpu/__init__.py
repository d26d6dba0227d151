"""het_tpu — a TPU-native relational/heterogeneous GNN framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of K-Wu/HET
("Hector", ASPLOS'24): RGCN / RGAT / HGT training over relation-partitioned
heterographs, with relation-typed segment matmul, fused relational edge
softmax, and gather/segment-reduce aggregation as TPU (Pallas/MXU) kernels,
Hector's compact-materialization and linear-operator-reordering optimizations,
a two-level compiler IR, and a first-class distributed (multi-chip mesh)
layer the single-GPU reference lacks.

Package layout (reference layer map: /root/reference SURVEY — see SURVEY.md):

- ``het_tpu.graph``    — HeteroGraph pytree + host-side format preprocessing
                         (replaces MyDGLGraph, hrt/python/utils/mydgl_graph.py).
- ``het_tpu.ops``      — differentiable graph ops (replaces hrt/python/backend
                         autograd wrappers + the CUDA kernels they call).
- ``het_tpu.ops.pallas`` — hand-written TPU kernels (replaces
                         hrt/include/DGLHackKernel/*.cu.h).
- ``het_tpu.models``   — RGCN / RGAT / HGT / GAT model definitions.
- ``het_tpu.train``    — training drivers, config/flag system, metrics.
- ``het_tpu.parallel`` — device-mesh sharding + halo exchange (new).
- ``het_tpu.compiler`` — two-level IR (Inter-Op SSA -> Op-Spec SSA) compiler
                         ("pyctor" in the reference, hrt/pyctor/).
- ``het_tpu.utils``    — bench/profiling/metrics utilities.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: this framework's graphs have stable
# shapes, so across processes (benchmarks, drivers, tests) identical HLO
# recompiles constantly — and on a remote-tunneled TPU each compile costs
# minutes of round-trips.  Opt out by setting JAX_COMPILATION_CACHE_DIR=""
# or pre-configuring jax yourself before importing het_tpu.
import os as _os

import jax as _jax

if (
    _jax.config.jax_compilation_cache_dir is None
    and _os.environ.get("JAX_COMPILATION_CACHE_DIR") is None
):
    _jax.config.update(
        "jax_compilation_cache_dir", "/tmp/het_tpu_jax_cache"
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import graph  # noqa: F401
