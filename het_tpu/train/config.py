"""Config / flag system.

Dataclass-first with an argparse bridge that keeps the reference's flag
names (hrt/python/RGNNUtils/RGNNUtils.py:575-679 ``add_generic_RGNN_args``
plus per-model additions) so the reference's sweep scripts
(hrt/utils/_do_all_cases.sh) port line-for-line.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass
class TrainConfig:
    model: str = "RGAT"  # RGAT | HGT | RGCN | GAT
    task: str = "entity"  # entity (node classification) | link (prediction)
    dataset: str = "aifb"
    n_infeat: int = 64
    num_classes: int = 8
    num_heads: int = 1
    num_layers: int = 1
    hidden: int = 64
    lr: float = 1e-2
    num_epochs: int = 10
    warmup_epochs: int = 5  # reference: 5 warm-up epochs w/ memory capture
    dropout: float = 0.5
    # Hector optimization flags (reference names in comments)
    compact: bool = False  # --compact_as_of_node_flag
    # union-list compact rows (the reference's default Enabled kind:
    # unique (rel, node) over srcs-union-dsts shared by both attention
    # sides); False = dual-list kind (independent per-side lists)
    compact_union: bool = False
    multiply_first: bool = False  # --multiply_among_weights_first_flag
    # numerics / backend
    dtype: str = "float32"  # float32 | bfloat16 (mixed: f32 master params)
    # loss scaling for bf16 ("none" | "dynamic" | a float); bf16 keeps
    # f32's exponent range so "none" is the sound default on TPU
    loss_scale: str = "none"
    backend: str = "xla"  # xla | pallas
    # edge-softmax overflow protection: "clip" (logit clamp, no extra
    # passes — default), "max" (exact max-subtracted), "raw" (reference
    # parity; overflows f32 once logits exceed ~88)
    stable_softmax: str = "clip"
    # dataset synth scale (1.0 = published size)
    dataset_scale: float = 1.0
    seed: int = 0
    full_graph_training: bool = True
    # logging
    logfile_enabled: bool = False
    logfilename: str = "metrics.json"
    no_warm_up: bool = False
    tile: int = 128
    # early stopping on training loss (0 = disabled)
    patience: int = 0
    # execute the model THROUGH the compiler (train/compiled.py): each
    # RGAT layer core runs as a compiled Inter-Op DSL program (parse ->
    # passes -> flag rewrites -> fuse -> Op-Spec schedule -> lowering)
    use_compiler: bool = False
    # checkpoint/resume (reference has none — SURVEY §5 aux subsystem):
    # save_every > 0 writes {params, opt state, loss-scale state, dropout
    # key} to checkpoint_dir every N epochs (train/checkpoint.py: orbax,
    # npz fallback); --resume restarts from the latest step and
    # reproduces the uninterrupted run exactly (test_resume_parity)
    save_every: int = 0
    checkpoint_dir: str = "checkpoints"
    resume: bool = False
    # minibatch mode (reference --full_graph_training False path)
    batch_size: int = 1024
    fanout: int = 10
    num_hops: int = 2
    max_batches: int = 100


def add_args(parser: argparse.ArgumentParser) -> None:
    """Reference-compatible flag spellings."""
    p = parser
    p.add_argument("--model", type=str, default="RGAT")
    p.add_argument("--task", type=str, default="entity",
                   choices=["entity", "link"])
    p.add_argument("--dataset", "-d", type=str, default="aifb")
    p.add_argument("--n_infeat", type=int, default=64)
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--num_heads", type=int, default=1)
    p.add_argument("--num_layers", type=int, default=1)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--num_epochs", "-e", type=int, default=10)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument(
        "--compact_as_of_node_flag", action="store_true", dest="compact"
    )
    p.add_argument(
        "--compact_union_flag", action="store_true", dest="compact_union",
        help="union-list compact rows shared by both attention sides "
             "(reference CompactAsOfNodeKind::Enabled)",
    )
    p.add_argument(
        "--multiply_among_weights_first_flag",
        action="store_true",
        dest="multiply_first",
    )
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--loss_scale", type=str, default="none",
                   help="bf16 loss scaling: none | dynamic | <float>")
    p.add_argument("--backend", type=str, default="xla")
    p.add_argument("--stable_softmax", type=str, default="clip",
                   choices=["clip", "max", "raw"],
                   help="edge-softmax overflow protection mode")
    p.add_argument("--dataset_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--full_graph_training", action="store_true", default=True)
    p.add_argument("--logfile_enabled", action="store_true")
    p.add_argument("--logfilename", type=str, default="metrics.json")
    p.add_argument("--no_warm_up", action="store_true")
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--use_compiler", action="store_true",
                   help="run the model through the compiled DSL pipeline")
    p.add_argument("--save_every", type=int, default=0,
                   help="checkpoint every N epochs (0 = off)")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in "
                        "--checkpoint_dir")
    p.add_argument("--minibatch", action="store_false",
                   dest="full_graph_training",
                   help="neighbor-sampled minibatch training")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--fanout", type=int, default=10)
    p.add_argument("--num_hops", type=int, default=2)
    p.add_argument("--max_batches", type=int, default=100)


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    return TrainConfig(**kw)
