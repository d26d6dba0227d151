"""Standard sweep grid, mirroring the reference's benchmark_all.sh /
_do_all_cases.sh (hrt/utils/_do_all_cases.sh:1-67): models x datasets x
feature dims x {compact, multiply_first} with appended-JSON output.

Usage: python scripts/benchmark_all.py [--quick] [--out sweep.json]
"""

import argparse
import itertools
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from het_tpu.train import TrainConfig, train  # noqa: E402

FULL_GRID = {
    "model": ["RGAT", "HGT", "RGCN", "GAT"],
    "dataset": ["aifb", "mutag", "bgs", "mag", "fb15k"],
    "n_infeat": [32, 64, 128],
    "heads": [1, 4],
    "flags": [(False, False), (True, False), (True, True)],
}
# the round-5 standard grid (VERDICT r4 item 9): >= 40 cases across all
# four families x dims x heads x flags at mag/aifb scale
MID_GRID = {
    "model": ["RGAT", "HGT", "RGCN", "GAT"],
    "dataset": ["aifb", "mag"],
    "n_infeat": [64, 128],
    "heads": [1, 4],
    "flags": [(False, False), (True, False), (True, True)],
}
QUICK_GRID = {
    "model": ["RGAT", "HGT", "RGCN"],
    "dataset": ["aifb", "mag"],
    "n_infeat": [64],
    "heads": [4],
    "flags": [(False, False), (True, True)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grid", default=None, choices=["quick", "mid", "full"])
    ap.add_argument("--out", default="sweep_results.json")
    ap.add_argument("--dataset_scale", type=float, default=0.1)
    ap.add_argument("--num_epochs", type=int, default=5)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()
    grid = {"quick": QUICK_GRID, "mid": MID_GRID, "full": FULL_GRID}[
        args.grid or ("quick" if args.quick else "full")
    ]

    for model, ds, dim, heads, (compact, mult) in itertools.product(
        grid["model"], grid["dataset"], grid["n_infeat"], grid["heads"],
        grid["flags"]
    ):
        if mult and model == "RGCN":
            continue
        if model == "GAT" and (compact or mult):
            continue  # homogeneous GAT has no relational flags
        if model == "RGCN" and heads != grid["heads"][0]:
            continue  # RGCN has no head axis
        if model == "HGT" and heads != grid["heads"][-1]:
            continue  # keep the HGT axis at the standard head count
        cfg = TrainConfig(
            model=model,
            dataset=ds,
            dataset_scale=args.dataset_scale,
            n_infeat=dim,
            hidden=dim,
            num_heads=heads if model != "RGCN" else 1,
            num_layers=1,
            num_epochs=args.num_epochs,
            warmup_epochs=2,
            compact=compact,
            multiply_first=mult,
            dropout=0.0,
            backend=args.backend,
        )
        tag = f"{model}/{ds}/d{dim}/h{heads}/c{int(compact)}m{int(mult)}"
        try:
            m = train(cfg)
            row = {
                "case": tag,
                "mean_forward_time": m["mean_forward_time"],
                "mean_backward_time": m["mean_backward_time"],
                "mean_training_time": m["mean_training_time"],
                "train_acc": m["train_acc"],
                "edges": m["num_edges"],
            }
        except Exception as e:  # record and continue, like the sweep shell
            row = {"case": tag, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        print(json.dumps(row))
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
