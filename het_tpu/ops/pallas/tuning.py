"""Per-TPU-generation kernel tuning tables.

The reference keys tile sizes and launch bounds on ``CUDA_ARCHS``
(hrt/include/macros.h:3-73: per-arch ``MY_SGEMM_*`` block shapes, shmem
budgets).  The TPU analogue: every hand-tuned constant in the Pallas
kernels — reduce tile geometry, work-item block size, fold-width floor,
segment-mm super-block rows, weight VMEM-residency budget, the static-mix
top-k — resolves through one table keyed on the detected TPU generation
(``jax.devices()[0].device_kind``).

Row provenance:

* ``v5 lite`` (v5e): MEASURED — scripts/tune_seg_reduce.py and
  scripts/tune_segmm_stream.py device sweeps (rounds 1-3); the roofline
  peaks are this chip's measured streaming bandwidth / small-matmul f32
  throughput (utils/profiling.py history).
* other rows: published hardware specs for the peaks, and VMEM/arithmetic
  scaling arguments for the kernel constants — marked ``measured=False``
  so a future session on that hardware knows to re-run the tune scripts
  and replace them.

The default (unknown device kind, incl. the CPU interpret-mode test runs)
is the measured v5e row — the same values every prior round shipped as
module constants, so behavior off-TPU is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache


@dataclass(frozen=True)
class TuneTable:
    # --- seg_reduce.py (work-list one-hot-MXU segment reductions)
    # round-4 geometry sweep note (scripts/tune_wl_geometry.py): nb=256 +
    # density-matched chunk_edges won the ISOLATED kernel benchmarks by
    # 1.3-2x but lost the composed headline step 12.0 -> 12.6-13.8 ms in
    # interleaved A/B reps, so the tuned global stays authoritative
    nb: int = 128            # nodes per output tile
    chunk_max: int = 512     # edges per DMA chunk (max kernel)
    chunk_edges: int = 1024  # edges per work-item block (sum kernel)
    fold_floor: int = 16     # min folded lane width => fold cap 128/16 = 8
    # --- segment_mm.py (typed segment matmul)
    mm_block_rows: int = 1024      # super-block row target per grid step
    mm_max_g: int = 8              # max row-tiles per super-block
    w_resident_bytes: int = 4 << 20  # weights at most this stay in VMEM
    # --- linear.py (static-hybrid plan)
    static_mix_topk: int = 64  # relations given dedicated static matmuls
    # --- roofline peaks (utils/profiling.py)
    hbm_gbps: float = 470.0
    mxu_tflops_f32: float = 30.0
    measured: bool = True


_V5E = TuneTable()  # measured on this chip (TPU v5 lite)

TABLES = {
    "TPU v5 lite": _V5E,
    "TPU v5e": _V5E,
    # v4: ~1.2 TB/s HBM2, 2x v5e MXU f32; same 128x128 MXU and VMEM per
    # core, so geometry constants carry over — peaks are published specs,
    # NOT measured; re-run scripts/tune_*.py on real hardware.
    "TPU v4": TuneTable(
        hbm_gbps=1100.0, mxu_tflops_f32=60.0, measured=False
    ),
    # v5p: 2.76 TB/s HBM, ~2x v5e FLOPs per chip
    "TPU v5": TuneTable(
        hbm_gbps=2500.0, mxu_tflops_f32=110.0, w_resident_bytes=8 << 20,
        measured=False,
    ),
    # v6e (Trillium): ~1.6 TB/s, ~2.5x v5e MXU; larger VMEM budget
    "TPU v6 lite": TuneTable(
        hbm_gbps=1500.0, mxu_tflops_f32=75.0, w_resident_bytes=8 << 20,
        chunk_edges=2048, measured=False,
    ),
}


@lru_cache(maxsize=1)
def get_table() -> TuneTable:
    """Tuning row for the current default device (cached per process).

    ``HET_TUNE_<FIELD>=value`` env vars override single fields (e.g.
    ``HET_TUNE_NB=256 HET_TUNE_CHUNK_EDGES=2048``) — the e2e geometry
    A/B hook (isolated kernel sweeps invert conclusions; the composed
    step is ground truth, ROUND4_NOTES.md)."""
    import os

    import jax

    def _override(row: TuneTable) -> TuneTable:
        import dataclasses

        changes = {}
        for f in dataclasses.fields(TuneTable):
            v = os.environ.get(f"HET_TUNE_{f.name.upper()}")
            if v is not None:
                changes[f.name] = type(getattr(row, f.name))(
                    float(v) if f.type == "float" else int(v)
                )
        return dataclasses.replace(row, **changes) if changes else row

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return _override(_V5E)
    # exact match first, then longest prefix ("TPU v5" must not shadow
    # "TPU v5 lite")
    if kind in TABLES:
        return _override(TABLES[kind])
    best = None
    for key, row in TABLES.items():
        if kind.startswith(key) and (best is None or len(key) > best[0]):
            best = (len(key), row)
    return _override(best[1] if best else _V5E)
