"""Hand-written Pallas TPU kernels (the counterpart of the reference's CUDA
kernel library, hrt/include/DGLHackKernel/)."""

from .segment_mm import (  # noqa: F401
    segment_matmul_rows_dw,
    segment_matmul_rows_dx,
    segment_matmul_rows_fwd,
    segment_matmul_rows_pallas,
)
