"""Held-out quality parity: train on demo shard part-r-00000, test on
part-r-00001, BOTH sides, 3 runs each (VERDICT r4 weak #1 / next #4).

The r3/r4 parity runs trained and tested on the same ~550 demo rows
(train==test; click AUC saturates at ~1.0), so they measured protocol
parity but not generalization.  This split is the cheapest real
generalization signal the shipped data allows: the two shards are
disjoint halves of the same day's impression log.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/parity_holdout.py [--steps 185] [--runs 3]

Reference side: scripts/reference_oracle.py --holdout (the ACTUAL TF1
code, fresh subprocess per run; TF1's unseeded per-run init supplies
the run-to-run spread, same protocol as results/parity_variance_r4.json).
Ours: conf/dmt_demo.conf with the same split + seeds 42/43/44.
Writes results/parity_holdout_r5.json.

Reference contract: run_dnn.py:635-897 (predict protocol) — this
script only redirects which shards feed train() and predict().
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))  # quality_ladder import

DATA = "/root/reference/jd_recsys_demo/*/test_ord/*/data/"
TRAIN_SHARD = DATA + "part-r-00000*"
TEST_SHARD = DATA + "part-r-00001*"


def run_ours(seed: int, steps: int) -> dict:
    from cikm2020_dmt_tpu.core.config import DMTConfig
    from cikm2020_dmt_tpu.train.evaluate import predict
    from cikm2020_dmt_tpu.train.loop import Trainer

    out_dir = os.path.join(REPO, "out", f"holdout_seed{seed}/")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = dataclasses.replace(
        DMTConfig.from_ini(os.path.join(REPO, "conf/dmt_demo.conf")),
        output_path=out_dir,
        summary_path=os.path.join(out_dir, "summary/"),
        seed=seed,
        max_iter_step=steps,
        # demo epoch_num (~87) only yields `steps` batches over BOTH
        # shards; with half the data the stream exhausts at steps/2
        # (first run trained 93/185).  The oracle side pins epoch_num
        # = 1000 for the same reason — pin high so max_iter_step binds.
        epoch_num=10**6,
        validate_step=10**9,
        train_data_path=TRAIN_SHARD,
        validation_data_path=TRAIN_SHARD,
        test_data_path=TEST_SHARD,
        test_data_path_ord=TEST_SHARD,
    )
    trainer = Trainer(cfg)
    trainer.train(log_every=100)
    final_step = int(trainer.last_step)
    del trainer
    results = predict(cfg, final_step, test_tag="ord",
                      test_score_method="rel")
    r = next(iter(results.values()))

    # EXACT per-head AUC from the predict detail dump (header + p_clk +
    # p_ord per row), sklearn like the oracle side.  The device streaming
    # AUC is a 200-threshold histogram (tf.metrics parity — the reference
    # uses the same estimator) and collapses to a degenerate value when
    # scores sit below 1/200, which is exactly what unseen-data sigmoid
    # outputs do here (~1e-6); the histogram number is therefore NOT
    # comparable to the oracle's sklearn number on this split.
    # (Shared parser: quality_ladder.exact_auc_from_detail — mask-label
    # convention, single-class guards.)
    from quality_ladder import exact_auc_from_detail
    exact = exact_auc_from_detail(out_dir)

    return {
        "side": "ours", "seed": seed, "steps": final_step,
        "streaming_auc": exact,
        "streaming_auc_histogram": {
            "click": float(r["streaming"]["click_auc"]),
            "order": float(r["streaming"]["order_auc"])},
        "overall_auc": {k: float(v) for k, v in r["overall_auc"].items()},
        "grouped_auc": {str(k): float(v)
                        for k, v in r["grouped_auc"].items()},
    }


def run_reference(i: int, steps: int) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/reference_oracle.py"),
         "--steps", str(steps), "--batch", "256", "--holdout"],
        env=env, timeout=3600, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(
            f"reference run {i} failed\n{out.stdout[-2000:]}"
            f"\n{out.stderr[-2000:]}")
    with open(os.path.join(REPO, "out/reference_oracle",
                           "oracle_results.json")) as f:
        res = json.load(f)
    assert res.get("holdout"), "oracle did not run the holdout split"
    return {"side": "reference", "run": i, "steps": res["steps"],
            "streaming_auc": res["streaming_auc"],
            "overall_auc": res["overall_auc"],
            "grouped_auc": res["grouped_auc"],
            "n": res["n"]}


def _spread(rows, path):
    vals = []
    for r in rows:
        v = r
        for k in path:
            v = v.get(k) if isinstance(v, dict) else None
            if v is None:
                break
        if v is not None:
            vals.append(float(v))
    if not vals:
        return {"mean": None, "min": None, "max": None, "n": 0}
    return {"mean": round(sum(vals) / len(vals), 6),
            "min": round(min(vals), 6), "max": round(max(vals), 6)}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=185)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results/parity_holdout_r5.json"))
    args = ap.parse_args(argv)

    runs = []
    for i in range(args.runs):
        print(f"=== reference holdout run {i} ===", flush=True)
        row = run_reference(i, args.steps)
        print(json.dumps(row), flush=True)
        runs.append(row)
    for seed in range(42, 42 + args.runs):
        print(f"=== ours holdout seed {seed} ===", flush=True)
        row = run_ours(seed, args.steps)
        print(json.dumps(row), flush=True)
        runs.append(row)

    ref = [r for r in runs if r["side"] == "reference"]
    ours = [r for r in runs if r["side"] == "ours"]
    summary = {}
    for metric in (("streaming_auc", "click"), ("streaming_auc", "order"),
                   ("overall_auc", "click"), ("overall_auc", "order")):
        key = "/".join(metric)
        summary[key] = {"reference": _spread(ref, metric),
                        "ours": _spread(ours, metric)}
    result = {
        "what": ("held-out split: train part-r-00000, test part-r-00001, "
                 f"{args.steps} steps @256, {args.runs} runs/side "
                 "(reference = actual TF1 code, unseeded per-run init; "
                 "ours = conf/dmt_demo.conf seeds 42..).  streaming_auc "
                 "= EXACT sklearn AUC per head (mask-label convention) "
                 "both sides; the 200-threshold device histogram "
                 "(streaming_auc_histogram, tf.metrics parity) is "
                 "degenerate here because unseen-data scores sit below "
                 "1/200.  grouped AUC is undefined on this split (every "
                 "234-row-shard group is single-class: ours reports 0.0, "
                 "the reference NaN)."),
        "summary": summary,
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
