"""Device-trace decomposition of the flagship train step.

Runs the bench.py step under ``jax.profiler.trace`` and prints per-op
device time per step, aggregated by HLO op metadata name.  This is the
tool behind the perf trails in PARITY.md — naive wall-clock micro-timers
lie on this runtime (async dispatch + DCE), device traces do not.

Usage (real TPU, one process):
    python scripts/trace_step.py [--steps N] [--out DIR] [--top K]
Env:  DMT_FUSED_BLOCK / DMT_BENCH_DTYPE work as for bench.py.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 4096


def run_trace(out_dir: str, steps: int) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import __graft_entry__ as g
    from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
    from cikm2020_dmt_tpu.train.loop import Trainer

    cfg = g._demo_config(sku_rows=5_000_000, batch_size=BATCH,
                         validate_step=10**9,
                         compute_dtype=os.environ.get("DMT_BENCH_DTYPE",
                                                      "bfloat16"),
                         table_bf16_threshold=int(os.environ.get(
                             "DMT_TABLE_BF16_ROWS", 1_000_000)))
    trainer = Trainer(cfg)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch = trainer.device_batch(g._as_batch(g.synthetic_batch(cfg, BATCH)))
    metrics = task_metrics_init()
    rng = jax.random.key(0, impl="rbg")
    for i in range(3):
        tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                        jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        for i in range(steps):
            tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                            jax.random.fold_in(rng, 3 + i))
        jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps


def decompose(out_dir: str, steps: int, top: int) -> None:
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", out_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # the per-op device track is the "XLA Ops" thread of the TPU process
    # ("Steps"/"XLA Modules" threads carry enclosing spans — skip them)
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tracks = {(e["pid"], e["tid"]) for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and e["pid"] in device_pids
                 and e.get("args", {}).get("name") == "XLA Ops"}
    per_cat = collections.Counter()
    per_op = collections.Counter()
    op_src: dict[str, str] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        args = e.get("args", {})
        dur_ms = e.get("dur", 0) / 1e3 / steps
        cat = args.get("hlo_category", "?")
        # strip the per-instance suffix so instances aggregate
        op = args.get("tf_op") or e.get("name", "?")
        per_cat[cat] += dur_ms
        per_op[op] += dur_ms
        src = args.get("source")
        if src and op not in op_src:
            op_src[op] = src
        total += dur_ms
    print(f"RESULT total {total:.1f} ms/step (device-op sum)")
    print("RESULT -- by hlo_category --")
    for name, ms in per_cat.most_common(top):
        print(f"RESULT  {ms:7.2f} ms  {name}")
    print("RESULT -- by op --")
    for name, ms in per_op.most_common(top):
        src = op_src.get(name, "")
        print(f"RESULT  {ms:7.2f} ms  {name}  {src}")
    if os.environ.get("DMT_TRACE_DETAIL", "0") == "1":
        # per-INSTANCE breakdown: the aggregated tf_op lines above hide
        # how many distinct fusions share a source line — this prints
        # each HLO instruction with its expression (shapes included)
        inst = collections.Counter()
        inst_info: dict[str, tuple] = {}
        for e in events:
            if (e.get("ph") != "X"
                    or (e.get("pid"), e.get("tid")) not in op_tracks):
                continue
            a = e.get("args", {})
            name = e.get("name", "?")
            inst[name] += e.get("dur", 0) / 1e3 / steps
            if name not in inst_info:
                inst_info[name] = (a.get("tf_op", ""),
                                   str(a.get("long_name", ""))[:220])
        print("RESULT -- by instance --")
        for name, ms in inst.most_common(top):
            tf_op, long_name = inst_info.get(name, ("", ""))
            print(f"RESULT  {ms:7.2f} ms  {name}  [{tf_op}]")
            if long_name:
                print(f"RESULT           {long_name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/dmt_trace_step")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    wall = run_trace(args.out, args.steps)
    print(f"RESULT wall {wall * 1000:.1f} ms/step")
    decompose(args.out, args.steps, args.top)


if __name__ == "__main__":
    main()
