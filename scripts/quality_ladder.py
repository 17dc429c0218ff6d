"""Quality-parity ladder: train + test every BASELINE.json config rung on
the JD demo shards with a fixed seed, and record per-rung test AUC +
train throughput.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/quality_ladder.py [--rungs 1,2,3,4,5] [--steps N]

Writes ``out/quality_ladder.json`` and prints a markdown table for
PARITY.md.  The 5 rungs mirror BASELINE.json "configs" (the paper's
ablation spine, Tables 3-5) against the reference chain
run_dnn.py train() -> predict() driven by conf/settings/dmt.conf:

    1  mlp                     conf/mlp_demo.conf
    2  embed_mlp               conf/embed_mlp_demo.conf
    3  transformer (clk seq)   conf/transformer_demo.conf
    4  mmoe_transformer (3 seq, 2 tasks)  conf/mmoe_transformer_demo.conf
    5  mmoe_transformer_unbias (full DMT) conf/dmt_demo.conf

Expected ordering on the demo sample (paper Tables 3-5 direction, within
demo-scale noise): AUC rises with the rung, modulo the tiny sample; the
asserted invariant (also in tests/test_quality.py) is rung5 >= rung1 and
every rung learning well above chance.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RUNGS = {
    1: "conf/mlp_demo.conf",
    2: "conf/embed_mlp_demo.conf",
    3: "conf/transformer_demo.conf",
    4: "conf/mmoe_transformer_demo.conf",
    5: "conf/dmt_demo.conf",
}

# Paper-baseline rungs (BASELINE.md Table 1 / reference
# model/inference_mlp.py:27-54): same demo chain and budget as rung 3
# (clk-seq single-task CTR), only the model head differs.  Keyed by
# model name; run with --rungs lr,wnd,dcn,din,dien.
BASELINE_RUNGS = ("lr", "wnd", "dcn", "din", "dien")


def run_rung(rung, conf: str, steps: int | None, seed: int,
             model_type: str | None = None) -> dict:
    from cikm2020_dmt_tpu.core.config import DMTConfig
    from cikm2020_dmt_tpu.train.evaluate import predict
    from cikm2020_dmt_tpu.train.loop import Trainer

    cfg = DMTConfig.from_ini(conf)
    out_dir = f"./out/ladder_rung{rung}/"
    shutil.rmtree(out_dir, ignore_errors=True)
    overrides = dict(output_path=out_dir, seed=seed,
                     summary_path=os.path.join(out_dir, "summary/"))
    if model_type:
        overrides["model_type"] = model_type
    if steps:
        overrides["max_iter_step"] = steps
    cfg = dataclasses.replace(cfg, **overrides)

    trainer = Trainer(cfg)
    t0 = time.time()
    train_vals = trainer.train(log_every=50)
    train_s = time.time() - t0
    final_step = int(trainer.last_step)
    del trainer

    results = predict(cfg, final_step, test_tag="ord",
                      test_score_method="rel")
    r = next(iter(results.values()))
    row = {
        "rung": rung,
        "conf": conf,
        "model_type": cfg.model_type,
        "steps": final_step,
        "seed": seed,
        "train_examples_per_s": round(final_step * cfg.batch_size / train_s, 1),
        "train_streaming": {k: float(v) for k, v in train_vals.items()},
        "test_streaming": {k: float(v) for k, v in r["streaming"].items()},
        "test_overall_auc": r["overall_auc"],
        "test_grouped_auc": {str(k): float(v)
                             for k, v in r["grouped_auc"].items()},
    }
    return row


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="1,2,3,4,5")
    ap.add_argument("--steps", type=int, default=0,
                    help="override max_iter_step (0 = conf value)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="out/quality_ladder.json")
    args = ap.parse_args(argv)

    rows = []
    for r in args.rungs.split(","):
        r = r.strip()
        if r.isdigit():
            rung, conf, mt = int(r), RUNGS[int(r)], None
        else:
            assert r in BASELINE_RUNGS, r
            # baselines reuse the rung-3 chain (clk-seq single-task CTR)
            rung, conf, mt = r, RUNGS[3], r
        print(f"=== rung {rung}: {conf}"
              f"{' model_type=' + mt if mt else ''} ===", flush=True)
        row = run_rung(rung, conf, args.steps or None, args.seed,
                       model_type=mt)
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)

    print("\n| rung | model | steps | test AUC clk | test AUC ord "
          "| grouped AUC clk | train ex/s (CPU) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        oa = r["test_overall_auc"]
        ga = r["test_grouped_auc"]
        print(f"| {r['rung']} | {r['model_type']} | {r['steps']} "
              f"| {oa['click']:.4f} | {oa['order']:.4f} "
              f"| {ga.get('2', ga.get('click', 0)):.4f} "
              f"| {r['train_examples_per_s']} |")


if __name__ == "__main__":
    main()
