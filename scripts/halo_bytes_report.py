"""Quantify the boundary-exchange win on the REAL ogbn-mag sample: bytes a
layer moves over ICI per device under the boundary all_to_all vs the
all-gather fallback, for 2/4/8-way dst-range partitions (VERDICT r3 weak
#8: "nothing even measures the bytes exchanged per layer").  Host-side
computation only — partition quality is a property of the graph.

Writes docs/HALO_BYTES_r4.json and prints a table.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from het_tpu.parallel import halo_bytes, partition_by_dst


def load_mag():
    for root in ("/root/reference/hrt/data/ogbn_mag_0.1",):
        if os.path.isdir(root):
            srcs, dsts, rels = [], [], []
            for i, f in enumerate(sorted(glob.glob(root + "/*.npy"))):
                coo = np.load(f)
                srcs.append(coo[0])
                dsts.append(coo[1])
                rels.append(np.full(coo.shape[1], i))
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            rel = np.concatenate(rels)
            n = int(max(src.max(), dst.max())) + 1
            return src, dst, rel, n, len(srcs)
    raise SystemExit("mag shards not found")


def main():
    src, dst, rel, n, r = load_mag()
    F, itemsize = 64, 4
    rows = []
    for p in (2, 4, 8):
        for balance in ("nodes", "edges"):
            sg, info = partition_by_dst(
                src, dst, rel, n, r, p, tile=128, balance=balance,
                halo="boundary",
            )
            import jax

            g0 = jax.tree.map(lambda a: a[0], sg)
            hb = halo_bytes(g0, p, feat_width=F, itemsize=itemsize)
            rows.append(
                dict(
                    parts=p,
                    balance=balance,
                    b_self=int(g0.halo_self_idx.shape[0]),
                    b_off=int(g0.halo_send_idx.shape[-1]),
                    ici_mb=round(hb["ici_bytes"] / 1e6, 2),
                    gather_mb=round(hb["gather_bytes"] / 1e6, 2),
                    ratio=round(
                        hb["gather_bytes"] / max(hb["ici_bytes"], 1), 2
                    ),
                )
            )
            print(rows[-1], flush=True)
    out = {"graph": f"mag sample n={n} e={len(src)} r={r}",
           "feat_width": F, "itemsize": itemsize, "rows": rows}
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "HALO_BYTES_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/HALO_BYTES_r4.json")


if __name__ == "__main__":
    main()
