"""Export entry point: bundle a checkpoint for serving.

    python -m cikm2020_dmt_tpu.cli.export --conf_file conf/dmt.conf \
        --model_ckpt model.ckpt-150000

Replaces ``python rec_saved_model.py --conf_file=... --model_ckpt=...``
(reference rec_saved_model.py:28-39).
"""

from __future__ import annotations

from ..serve.export import export_model
from .args import build_parser, ckpt_step, load_config


def main(argv=None) -> None:
    args = build_parser("DMT TPU serving export").parse_args(argv)
    cfg = load_config(args)
    out = export_model(cfg, ckpt_step(args.model_ckpt))
    print(f"Successfully exported model to {out}")


if __name__ == "__main__":
    main()
