"""Serving-path benchmark: request assembly + jitted scoring latency on
the exported flagship bundle.

The reference serves via a TF SavedModel with u-side tiling done inside
the graph (reference saved_model/export_model.py:58-99,
model/inference_mlp.py:73-113); here the exported Orbax bundle is scored
by ``serve.export.Scorer`` (jit with folded-in online normalization) and
requests are assembled host-side by ``ServingPreprocessor``.

One JSON line, bench.py-style: value = steady-state p50 request latency
(ms) at 300 candidate items per request (a production-typical rerank
candidate set); vs_baseline = speedup of the jitted scorer over eager
``model.apply`` on the same request (the no-XLA serving baseline).

Run (CPU): env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python bench_serve.py
Run (TPU): python bench_serve.py        # one process, compile cache warm
Needs the flagship export: out/dmt_demo/dmt_demo.model/frozen/ckpt-*
(produced by the demo-chain `cli.export`; see CLAUDE.md).
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np


B = 300           # candidates per rerank request
ITERS = 50


def newest_export(model_path: str) -> str:
    dirs = sorted(glob.glob(os.path.join(model_path, "frozen", "ckpt-*")),
                  key=lambda p: int(p.rsplit("-", 1)[1]))
    if not dirs:
        raise SystemExit(
            f"no export bundle under {model_path}/frozen — run the demo "
            "chain (cli.train + cli.export) first, see CLAUDE.md")
    return dirs[-1]


def build_raw_request(rng, b: int):
    """One user (50-deep click history, 10-deep order/cart histories)
    reranking ``b`` candidate items — raw wire inputs only, so the
    assembly timer below measures ServingPreprocessor.assemble and not
    this harness's random request generation."""
    def seq(n, lo, hi):
        return [str(x).encode() for x in rng.integers(lo, hi, n)]

    id_values = {
        # u-side histories (tiled across the request by the preprocessor)
        "clk_seq_sku_7d_50": seq(50, 1, 10**10),
        "clk_seq_c2_7d_50": seq(50, 1, 5000),
        "clk_seq_c3_7d_50": seq(50, 1, 20000),
        "clk_seq_brand_7d_50": seq(50, 1, 300000),
        "clk_seq_shop_7d_50": seq(50, 1, 800000),
        "clk_seq_ts_7d_50": seq(50, 0, 10**6),
        "ord_seq_sku_12m_10": seq(10, 1, 10**10),
        "ord_seq_c2_12m_10": seq(10, 1, 5000),
        "ord_seq_c3_12m_10": seq(10, 1, 20000),
        "ord_seq_brand_12m_10": seq(10, 1, 300000),
        "ord_seq_shop_12m_10": seq(10, 1, 800000),
        "ord_seq_ts_12m_10": seq(10, 0, 10**7),
        "cart_seq_sku_12m_10": seq(10, 1, 10**10),
        "cart_seq_c2_12m_10": seq(10, 1, 5000),
        "cart_seq_c3_12m_10": seq(10, 1, 20000),
        "cart_seq_brand_12m_10": seq(10, 1, 300000),
        "cart_seq_shop_12m_10": seq(10, 1, 800000),
        "cart_seq_ts_12m_10": seq(10, 0, 10**7),
        "near_expo_seq_c2": seq(10, 1, 5000),
        "near_expo_seq_c3": seq(10, 1, 20000),
        # i-side: one value per candidate row
        "item_fea_sku": seq(b, 1, 10**10),
        "item_c2": seq(b, 1, 5000),
        "item_c3": seq(b, 1, 20000),
        "item_brand": seq(b, 1, 300000),
        "item_shop": seq(b, 1, 800000),
    }
    raw = np.abs(rng.normal(size=(b, 615))).astype(np.float32)
    return id_values, raw


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

    from cikm2020_dmt_tpu.core.config import DMTConfig
    from cikm2020_dmt_tpu.serve.export import (ServingPreprocessor,
                                               load_scorer)

    cfg = DMTConfig.from_ini("conf/dmt_demo.conf")
    # DMT_SERVE_BUNDLE: score an alternate bundle (e.g. the int8-table
    # export — scripts/tpu_r2_experiments.sh A/Bs it against f32)
    export_dir = (os.environ.get("DMT_SERVE_BUNDLE")
                  or newest_export(cfg.model_path))
    scorer = load_scorer(cfg, export_dir)
    prep = ServingPreprocessor(cfg)
    rng = np.random.default_rng(0)

    id_values, raw = build_raw_request(rng, B)
    # production path: ship [1, L] u-side rows, tile on device in the jit
    batch = prep.assemble(B, id_values=id_values, raw_features=raw,
                          tile_uside=False)  # warm
    t0 = time.perf_counter()
    for _ in range(20):
        batch = prep.assemble(B, id_values=id_values, raw_features=raw,
                              tile_uside=False)
    t_assemble = (time.perf_counter() - t0) / 20 * 1e3

    t0 = time.perf_counter()
    out = scorer(batch)
    t_compile = (time.perf_counter() - t0) * 1e3
    assert np.isfinite(out["Scores"]).all()

    # e2e latency from host numpy (includes host->device transfer; on
    # this dev container the tunneled relay charges ~tens of ms PER
    # LEAF ARRAY, so this wildly overstates what a PCIe host pays)
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        scorer(batch)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p50_e2e = float(np.percentile(lat, 50))

    # scoring latency proper: device-resident request (what the chip
    # charges per request once inputs arrive; jnp.asarray on an already
    # -device array is a no-op, so score_async runs the jit directly)
    dev_batch = jax.device_put(batch)
    jax.block_until_ready(list(dev_batch.values()))
    jax.block_until_ready(scorer.score_async(dev_batch)["Scores"])
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(scorer.score_async(dev_batch)["Scores"])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))

    # ground truth on the tunneled relay: wall-clock per call is relay
    # RPC noise (p99 3x p50 observed), so measure the DEVICE time of the
    # scorer executable with a profiler trace — the same methodology the
    # training decomposition uses (scripts/trace_step.py)
    t_dev_op = None
    if jax.default_backend() != "cpu":
        import glob as _glob
        import gzip as _gzip
        ntr = 10
        tr_dir = "/tmp/dmt_serve_trace"
        with jax.profiler.trace(tr_dir):
            outs = [scorer.score_async(dev_batch) for _ in range(ntr)]
            jax.block_until_ready([o["Scores"] for o in outs])
        paths = _glob.glob(os.path.join(tr_dir, "**", "*.trace.json.gz"),
                           recursive=True)
        if paths:
            with _gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
                tr = json.load(f)
            ev = tr.get("traceEvents", [])
            pids = {e["pid"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
            tracks = {(e["pid"], e["tid"]) for e in ev
                      if e.get("ph") == "M"
                      and e.get("name") == "thread_name"
                      and e["pid"] in pids
                      and e.get("args", {}).get("name") == "XLA Ops"}
            t_dev_op = sum(e.get("dur", 0) for e in ev
                           if e.get("ph") == "X"
                           and (e.get("pid"), e.get("tid")) in tracks
                           ) / 1e3 / ntr

    # sustained throughput: distinct device-resident requests dispatched
    # back-to-back (Scorer.score_async keeps results on device; one block
    # at the end) — the chip-side pipelined ceiling
    reqs = []
    for i in range(12):
        idv, rw = build_raw_request(rng, B)
        reqs.append(jax.device_put(prep.assemble(
            B, id_values=idv, raw_features=rw, tile_uside=False)))
    jax.block_until_ready([list(r.values()) for r in reqs])
    outs = [scorer.score_async(reqs[0])]  # warm any new shapes
    jax.block_until_ready(outs[0]["Scores"])
    t0 = time.perf_counter()
    outs = [scorer.score_async(r) for r in reqs]
    jax.block_until_ready([o["Scores"] for o in outs])
    t_pipe = time.perf_counter() - t0
    qps = len(reqs) / t_pipe

    # eager baseline: same math, no jit (what serving costs without XLA).
    # Only meaningful where ops dispatch locally — on the tunneled axon
    # relay every eager op is a network RPC, so skip it there.
    if jax.default_backend() == "cpu":
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.serve.export import (broadcast_uside,
                                                   normalize_dense)
        from cikm2020_dmt_tpu.train.losses import scores_from_logits

        def eager(batch):
            feats = normalize_dense(jnp.asarray(batch["raw_features"]),
                                    scorer.scale, scorer.const_vec)
            b = {k: jnp.asarray(v) for k, v in batch.items()}
            b["features"] = feats
            b = broadcast_uside(b, scorer.uside, b["valid"].shape[0])
            with jax.disable_jit():
                o, _ = scorer.model.apply(scorer.params, scorer.model_state,
                                          b, train=False, is_predict=True)
                p_ctr, p_cvr = scores_from_logits(cfg, o, rel_only=True)
            return np.asarray(p_ctr)

        eager(batch)  # warm numpy/dispatch paths
        t0 = time.perf_counter()
        for _ in range(3):
            eager(batch)
        t_eager = (time.perf_counter() - t0) / 3 * 1e3
        vs = round(t_eager / p50, 2)
        eager_note = f"eager {t_eager:.1f} ms"
    else:
        vs = round(p50_e2e / p50, 2)  # relay-transfer multiple on axon
        eager_note = "eager skipped (remote relay)"

    # ---- concurrency curve (VERDICT r4 #3) -------------------------------
    # Closed-loop client threads, two serving modes:
    #   direct - each stream dispatches its own score_async per request
    #            (one launch per request; r4's single-stream 239 req/s)
    #   queue  - all streams share a ScorerQueue (adaptive micro-batching:
    #            whatever is waiting merges into one grouped launch)
    # Reported per cell: sustained req/s + per-request p50/p99 wall.
    curve = []
    if os.environ.get("DMT_SERVE_CURVE", "1") == "1":
        import threading

        from cikm2020_dmt_tpu.serve.queue import ScorerQueue

        n_reqs = 16
        host_reqs = []
        for _ in range(n_reqs):
            idv, rw = build_raw_request(rng, B)
            host_reqs.append(prep.assemble(B, id_values=idv,
                                           raw_features=rw,
                                           tile_uside=False))
        # device-staged copies: what a PCIe host (or a serving tier that
        # overlaps transfer) sees — the chip-side ceiling, with the
        # tunneled relay's per-leaf host->device cost taken out
        dev_reqs = [jax.device_put(r) for r in host_reqs]
        jax.block_until_ready([list(r.values()) for r in dev_reqs])

        def run_cell(mode: str, streams: int, per_stream: int):
            reqs = dev_reqs if mode.startswith("dev_") else host_reqs
            kind = mode.split("_", 1)[1] if "_" in mode else mode
            lats: list[list[float]] = [[] for _ in range(streams)]
            if kind == "queue":
                q = ScorerQueue(scorer, max_group=8, groups=(1, 2, 4, 8))
                q.warmup(reqs[0])

                def worker(s):
                    for i in range(per_stream):
                        t0 = time.perf_counter()
                        fut = q.submit(reqs[(s + i) % n_reqs])
                        np.asarray(fut.result()["Scores"])
                        lats[s].append((time.perf_counter() - t0) * 1e3)
            else:
                jax.block_until_ready(
                    scorer.score_async(reqs[0])["Scores"])

                def worker(s):
                    for i in range(per_stream):
                        t0 = time.perf_counter()
                        out = scorer.score_async(reqs[(s + i) % n_reqs])
                        np.asarray(out["Scores"])
                        lats[s].append((time.perf_counter() - t0) * 1e3)

            threads = [threading.Thread(target=worker, args=(s,))
                       for s in range(streams)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if kind == "queue":
                q.close()
            flat = np.asarray([x for ls in lats for x in ls])
            row = {"mode": mode, "streams": streams,
                   "requests": streams * per_stream,
                   "req_s": round(streams * per_stream / wall, 1),
                   "p50_ms": round(float(np.percentile(flat, 50)), 2),
                   "p99_ms": round(float(np.percentile(flat, 99)), 2)}
            print(f"# curve {row}", flush=True)
            return row

        on_cpu = jax.default_backend() == "cpu"
        for streams in ((1, 4) if on_cpu else (1, 4, 16, 64)):
            # CPU cells are a plumbing smoke (the CPU scorer is ~50 ms/req)
            per_stream = (max(3, 8 // streams) if on_cpu
                          else max(8, 256 // streams))
            # host_* pays a per-request host->device transfer (on this
            # container: the tunneled relay, ~70+ ms — it IS the curve);
            # dev_* starts from device-staged requests = the chip-side
            # serving ceiling a PCIe host approaches
            for mode in (("host_direct", "host_queue") if on_cpu else
                         ("host_direct", "host_queue",
                          "dev_direct", "dev_queue")):
                curve.append(run_cell(mode, streams, per_stream))
        # the committed artifact is the TPU measurement PARITY.md cites;
        # CPU runs are a plumbing smoke and must not overwrite it
        suffix = "" if jax.default_backend() != "cpu" else "_cpu_smoke"
        out_path = os.path.join(os.path.dirname(__file__), "results",
                                f"bench_serve_r5{suffix}.json")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({
                "what": (f"serving concurrency curve, {B}-candidate "
                         "requests, closed-loop streams; device bound = "
                         "profiler op-sum per request"),
                "backend": jax.default_backend(),
                "device_ms_per_request": (round(t_dev_op, 2)
                                          if t_dev_op is not None else None),
                "device_bound_req_s": (round(1000.0 / t_dev_op, 1)
                                       if t_dev_op else None),
                "single_stream_pipelined_req_s": round(qps, 1),
                "curve": curve,
            }, f, indent=1)

    print(f"# export={export_dir} backend={jax.default_backend()}",
          flush=True)
    dev_note = (f"device-op time {t_dev_op:.2f} ms/request | "
                if t_dev_op is not None else "")
    print(f"# assemble {t_assemble:.1f} ms | first call (compile) "
          f"{t_compile:.0f} ms | {dev_note}wall device-resident p50 "
          f"{p50:.2f} ms p99 {p99:.2f} ms | e2e-host p50 {p50_e2e:.2f} ms "
          f"| {eager_note} | pipelined {qps:.1f} req/s = "
          f"{qps * B:,.0f} candidates/s", flush=True)
    if t_dev_op is not None:
        # the chip's actual per-request compute; wall numbers on this
        # container are tunneled-relay RPC noise (p99 ~3x p50)
        print(json.dumps({
            "metric": f"serving device compute per {B}-candidate request "
                      "(flagship export, profiler device-op sum)",
            "value": round(t_dev_op, 2),
            "unit": "ms",
            "vs_baseline": round(B / t_dev_op, 1),  # candidates/ms/chip
        }))
    else:
        print(json.dumps({
            "metric": f"serving p50 scoring latency, {B} candidates "
                      "(flagship export, jitted scorer, device-resident "
                      "request)",
            "value": round(p50, 2),
            "unit": "ms",
            "vs_baseline": vs,
        }))


if __name__ == "__main__":
    main()
