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
    # multi-host bring-up (jax.distributed); single-process when omitted
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0")
    return p


def maybe_init_distributed(args: argparse.Namespace) -> None:
    from ..core.mesh import initialize_distributed
    if args.num_processes and args.num_processes > 1:
        initialize_distributed(coordinator=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)


def load_config(args: argparse.Namespace, **overrides) -> DMTConfig:
    path = args.conf_file
    if not os.path.exists(path):
        path = os.path.join(args.conf_path, args.conf_file)
    cfg = DMTConfig.from_ini(path, **overrides)
    return apply_label_stats(cfg)


def apply_label_stats(cfg: DMTConfig) -> DMTConfig:
    """Cap the step budget from the train label-count stat file
    (reference recsys_conf.py:139-151: one count per line; total examples
    = sum; max_iter_step = epochs * total / (batch * replicas))."""
    import glob

    import jax

    path = cfg.train_data_stat_path
    if not path:
        return cfg
    candidates = [path] if os.path.isfile(path) else \
        sorted(glob.glob(os.path.join(path, "part-*")) +
               glob.glob(os.path.join(path, "stat*")))
    for cand in candidates:
        try:
            with open(cand) as f:
                counts = tuple(int(line.strip()) for line in f
                               if line.strip())
            if counts:
                return cfg.recompute_max_steps(
                    counts, num_replicas=jax.process_count())
        except (OSError, ValueError):
            continue
    return cfg


def ckpt_step(name: str) -> int:
    """Step from a model.ckpt-<N> name (reference run_dnn.py:119-122);
    'current'/'0' -> 0."""
    if "-" not in name:
        return 0
    try:
        return int(name.rsplit("-", 1)[1])
    except ValueError:
        return 0
