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


HOLDOUT_DATA = "/root/reference/jd_recsys_demo/*/test_ord/*/data/"
HOLDOUT_TRAIN = HOLDOUT_DATA + "part-r-00000*"
HOLDOUT_TEST = HOLDOUT_DATA + "part-r-00001*"


def exact_auc_from_detail(out_dir: str) -> dict:
    """Exact sklearn per-head AUC from the predict detail dump (header +
    p_clk + p_ord per row, mask-label convention).  The device streaming
    histogram (200 thresholds, tf.metrics parity) is degenerate when
    scores sit below 1/200 — which held-out sigmoid outputs do."""
    import glob

    import numpy as np
    from sklearn.metrics import roc_auc_score

    paths = glob.glob(os.path.join(out_dir, "*.test_result_*_rel.detail"))
    assert paths, f"no detail dump under {out_dir}"
    labels, p_clk, p_ord = [], [], []
    with open(max(paths, key=os.path.getmtime)) as f:
        for line in f:
            fields = line.rstrip("\n").split("\t")
            labels.append(int(fields[9]))
            p_clk.append(float(fields[-2]))
            p_ord.append(float(fields[-1]))
    lab = np.asarray(labels)
    out = {}
    # single-class guard on BOTH heads: a split with no positives for a
    # head must not crash an otherwise-complete multi-run harness
    for name, y, p in (("click", (lab > 0).astype(int), p_clk),
                       ("order", (lab >= 4).astype(int), p_ord)):
        if 0 < y.sum() < len(y):
            out[name] = float(roc_auc_score(y, p))
    return out


def run_rung(rung, conf: str, steps: int | None, seed: int,
             model_type: str | None = None, holdout: bool = False) -> dict:
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
    if holdout:
        # generalization split (scripts/parity_holdout.py protocol):
        # train shard 0, test shard 1, epoch budget pinned high so
        # max_iter_step binds on the halved stream
        overrides.update(
            train_data_path=HOLDOUT_TRAIN,
            validation_data_path=HOLDOUT_TRAIN,
            test_data_path=HOLDOUT_TEST,
            test_data_path_ord=HOLDOUT_TEST,
            epoch_num=10**6)
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
        "holdout": holdout,
        "test_exact_auc": exact_auc_from_detail(out_dir),
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
    ap.add_argument("--holdout", action="store_true",
                    help="train shard 0 / test shard 1 (generalization "
                         "split; AUC is far from saturation there)")
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
                       model_type=mt, holdout=args.holdout)
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)

    print("\n| rung | model | steps | test AUC clk | test AUC ord "
          "| exact clk | exact ord | grouped AUC clk | train ex/s (CPU) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        oa = r["test_overall_auc"]
        ga = r["test_grouped_auc"]
        ex = r.get("test_exact_auc", {})
        exc = f"{ex['click']:.4f}" if "click" in ex else "-"
        exo = f"{ex['order']:.4f}" if "order" in ex else "-"
        print(f"| {r['rung']} | {r['model_type']} | {r['steps']} "
              f"| {oa['click']:.4f} | {oa['order']:.4f} "
              f"| {exc} | {exo} "
              f"| {ga.get('2', ga.get('click', 0)):.4f} "
              f"| {r['train_examples_per_s']} |")


if __name__ == "__main__":
    main()
