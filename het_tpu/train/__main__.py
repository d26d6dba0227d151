"""CLI entry: ``python -m het_tpu.train --model RGAT --dataset aifb ...``

Plays the role of the reference's per-model train scripts
(hrt/python/{RGAT,HGT,RGCN,GAT}/train.py) behind one binary.
"""

import argparse
import json

from .config import add_args, config_from_args
from .driver import train
from .link import train_link
from .minibatch import train_minibatch


def main() -> None:
    parser = argparse.ArgumentParser("het_tpu trainer")
    add_args(parser)
    args = parser.parse_args()
    cfg = config_from_args(args)
    if cfg.task == "link":
        metrics = train_link(cfg)
    elif not cfg.full_graph_training:
        metrics = train_minibatch(cfg)
    else:
        metrics = train(cfg)
    slim = {
        k: v
        for k, v in metrics.items()
        if not isinstance(v, list)
    }
    print(json.dumps(slim, indent=2, default=str))


if __name__ == "__main__":
    main()
