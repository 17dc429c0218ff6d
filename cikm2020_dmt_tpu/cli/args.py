"""Shared CLI argument parsing (reference parse/parse.py flags)."""

from __future__ import annotations

import argparse
import os

from ..core.config import DMTConfig


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--conf_path", default="./conf/",
                   help="config directory (reference parse.py)")
    p.add_argument("--conf_file", default="dmt.conf",
                   help="config file name, or a full path")
    p.add_argument("--model_ckpt", default="model.ckpt-0",
                   help="checkpoint name model.ckpt-<step>")
    p.add_argument("--test_tag", default="", choices=["", "clk", "ord"],
                   help="test split selector")
    p.add_argument("--test_score_method", default="rel",
                   choices=["rel", "ctr"],
                   help="rel = relevance-only scores; ctr = bias-combined")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override max_iter_step")
    p.add_argument("--log_every", type=int, default=10)
    return p


def load_config(args: argparse.Namespace, **overrides) -> DMTConfig:
    path = args.conf_file
    if not os.path.exists(path):
        path = os.path.join(args.conf_path, args.conf_file)
    return DMTConfig.from_ini(path, **overrides)


def ckpt_step(name: str) -> int:
    """Step from a model.ckpt-<N> name (reference run_dnn.py:119-122);
    'current'/'0' -> 0."""
    if "-" not in name:
        return 0
    try:
        return int(name.rsplit("-", 1)[1])
    except ValueError:
        return 0
