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

from . import graph  # noqa: F401
