"""Out-of-band trace analysis: capture a ``jax.profiler`` device trace and
digest it into a per-kernel time table — the TPU counterpart of the
reference's nsys/ncu report pipeline (``hrt/utils/classify_het_kernels.py``,
``load_nsight_report.py``: parse per-kernel device times out of profiler
dumps and classify them fw/bw).

The Perfetto JSON the profiler writes (``*.trace.json.gz``) carries one
complete-event per executed HLO op on the device track with
``device_duration_ps``, ``hlo_category``, ``bytes_accessed``,
``model_flops`` and the full ``long_name`` HLO text — everything the ncu
speed-of-light sheets provided, with no TensorFlow/XProf dependency.

Usage::

    from het_tpu.utils.trace_analysis import op_table, format_table
    rows, meta = op_table(step_fn, x, iters=3)
    print(format_table(rows))

``scripts/trace_breakdown.py`` drives this for the benchmark models and
writes docs/TRACE_r4.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import tempfile
from typing import Any, Dict, List, Optional, Tuple


def capture_trace(fn, *args, iters: int = 3,
                  trace_dir: Optional[str] = None) -> str:
    """Run ``fn(*args)`` ``iters`` times under the profiler (after one
    un-traced warm-up/compile call); return the trace.json.gz path."""
    import jax

    from .timing import force

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="het_tpu_trace_")
    force(fn(*args))  # compile + settle outside the trace
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(iters):
            out = fn(*args)
        force(out)
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"profiler wrote no trace under {trace_dir}"
    return paths[-1]


def classify_phase(name: str, long_name: str) -> str:
    """fw/bw classification from the op name, in the spirit of the
    reference's ctags-based ``classify_het_kernels.py``: XLA carries the
    autodiff provenance in op_name metadata ('transpose(jvp(...))' =
    backward of a custom-vjp region; 'jvp(...)' alone = re-traced
    forward)."""
    s = name + " " + long_name
    if "transpose" in s and "jvp" in s:
        return "bwd"
    if "jvp" in s:
        return "fwd"
    return "?"


def parse_trace(path: str, iters: int = 1) -> Tuple[List[Dict], Dict]:
    """Aggregate device-track complete events by op name.

    Returns (rows sorted by total time desc, meta).  Durations are
    per-iteration (divided by ``iters``); ``gbps`` is the op's effective
    HBM bandwidth from XLA's ``bytes_accessed``."""
    data = json.loads(gzip.open(path).read())
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg: Dict[str, Dict[str, Any]] = {}
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args or "hlo_category" not in args:
            # program/step envelope events (they'd double-count every op)
            continue
        name = e.get("name", "?")
        dur_us = float(args["device_duration_ps"]) / 1e6
        row = agg.setdefault(
            name,
            {
                "name": name,
                "category": args.get("hlo_category", "?"),
                "us": 0.0,
                "count": 0,
                "bytes": 0,
                "flops": 0,
                "long_name": args.get("long_name", "")[:240],
            },
        )
        row["us"] += dur_us
        row["count"] += 1
        row["bytes"] += int(args.get("bytes_accessed", 0) or 0)
        mf = args.get("model_flops", "0")
        row["flops"] += int(mf) if str(mf).isdigit() else 0
        total_us += dur_us
    rows = sorted(agg.values(), key=lambda r: -r["us"])
    for r in rows:
        r["us"] = r["us"] / iters
        r["count"] = r["count"] // iters
        r["bytes"] = r["bytes"] // iters
        r["flops"] = r["flops"] // iters
        r["gbps"] = (
            r["bytes"] / (r["us"] * 1e-6) / 1e9 if r["us"] > 0 else 0.0
        )
        r["phase"] = classify_phase(r["name"], r["long_name"])
    meta = {
        "total_device_us_per_iter": total_us / iters,
        "num_ops": len(rows),
        "path": path,
    }
    return rows, meta


def op_table(fn, *args, iters: int = 3) -> Tuple[List[Dict], Dict]:
    """Capture + parse in one call (per-iteration aggregation)."""
    path = capture_trace(fn, *args, iters=iters)
    return parse_trace(path, iters=iters)


def format_table(rows: List[Dict], top: int = 30,
                 total_us: Optional[float] = None) -> str:
    """Markdown per-kernel table (reference analogue: the per-kernel
    fw/bw sheets of load_nsight_report.py)."""
    tot = total_us or sum(r["us"] for r in rows)
    out = [
        "| op | phase | category | n | us/iter | % | GB/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows[:top]:
        out.append(
            f"| {r['name'][:44]} | {r['phase']} | {r['category'][:18]} "
            f"| {r['count']} | {r['us']:.1f} | "
            f"{100 * r['us'] / max(tot, 1e-9):.1f} | {r['gbps']:.0f} |"
        )
    rest = sum(r["us"] for r in rows[top:])
    if rest:
        out.append(f"| (other {len(rows) - top} ops) |  |  |  | "
                   f"{rest:.1f} | {100 * rest / max(tot, 1e-9):.1f} |  |")
    return "\n".join(out)
