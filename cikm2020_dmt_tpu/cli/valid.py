"""Evaluator entry point: poll checkpoints, evaluate each new one.

    python -m cikm2020_dmt_tpu.cli.valid --conf_file conf/dmt.conf [--once]

Replaces ``TF_CONFIG={'task':{'type':'evaluator'}} python run_dnn.py``
(reference valid.sh:7-10, run_dnn.py:432-632).
"""

from __future__ import annotations

from ..train.evaluate import validation
from .args import build_parser, load_config


def main(argv=None) -> None:
    parser = build_parser("DMT TPU validation (evaluator role)")
    parser.add_argument("--once", action="store_true",
                        help="evaluate at most one new checkpoint and exit")
    args = parser.parse_args(argv)
    cfg = load_config(args)
    validation(cfg, once=args.once, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
