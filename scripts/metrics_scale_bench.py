"""Scale benchmark for the vectorized offline metrics (VERDICT r1 Weak #5).

The reference computes its offline metrics over a 105.4M-row test split
with a fork-per-0.7*ncpu pandas process pool
(reference metrics/metrics.py:134-199); a per-group Python-loop AUC at
that size takes hours.  This script times the repo's segment-vectorized
implementation on a synthetic 10M-row / ~1M-group split (the VERDICT
round-1 "done" criterion) and cross-checks a sampled subset of groups
against a straightforward per-group oracle.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/metrics_scale_bench.py [n_rows] [n_groups]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from cikm2020_dmt_tpu.metrics.offline import (  # noqa: E402
    AT_LIST, CLICK, ORDER, grouped_auc, overall_auc, precision_mrr_at_n)


def synth(n_rows: int, n_groups: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    gid = rng.integers(0, n_groups, n_rows)
    labels = rng.choice([0, 1, 2, 3, 4, 5], n_rows,
                        p=[.55, .2, .12, .06, .04, .03])
    scores = (labels * 0.12 + rng.normal(0, 0.8, n_rows)).astype(np.float64)
    # quantize so score ties actually occur (exercises tie-averaged ranks)
    scores = np.round(scores, 2)
    # header lines: label \t sid \t uuid  (sid == uuid == group id)
    g = np.char.mod("g%08d", gid)
    lab = np.char.mod("%d", labels)
    headers = np.char.add(np.char.add(np.char.add(lab, "\t"),
                                      np.char.add(g, "\t")), g)
    return [h.encode() for h in headers], scores, labels, gid


def peak_rss_gb() -> float:
    import resource
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def stream_bench(n_rows: int, n_groups: int, chunk: int = 1_000_000):
    """Reference-split-scale run (VERDICT r2 next-round #4): headers are
    produced and consumed in chunks through metrics/offline.HeaderCollector
    — the run_eval accumulation path — so the raw lines never exist as one
    list.  Reports wall time + peak RSS; the reference holds the whole
    split in a DataFrame + fork-pool copies (metrics.py:134-199), which at
    105.4M rows is ~50+ GB before metrics start."""
    from cikm2020_dmt_tpu.metrics.offline import HeaderCollector
    schema = ["label", "sid", "uuid"]
    col = HeaderCollector(schema)
    scores_chunks = []
    t0 = time.time()
    for start in range(0, n_rows, chunk):
        m = min(chunk, n_rows - start)
        headers, scores, _, _ = synth(m, n_groups, seed=start // chunk)
        col.extend(headers)
        scores_chunks.append(scores)
        del headers
    scores = np.concatenate(scores_chunks)
    del scores_chunks
    t_feed = time.time() - t0
    spilled = col._fact is not None
    print(f"stream-feed {n_rows} rows: {t_feed:.1f}s "
          f"(spilled={spilled}, peak RSS {peak_rss_gb():.1f} GB)")

    ph = col.result()
    t0 = time.time()
    pm = precision_mrr_at_n(schema, ph, scores)
    t_pm = time.time() - t0
    print(f"precision_mrr_at_n: {t_pm:.1f}s  "
          f"P@4[click]={pm[CLICK][0][1]:.4f}")
    t0 = time.time()
    ga = grouped_auc(schema, ph, scores)
    t_ga = time.time() - t0
    print(f"grouped_auc:        {t_ga:.1f}s  click={ga[CLICK]:.4f}")
    t0 = time.time()
    oa = overall_auc(schema, ph, scores)
    t_oa = time.time() - t0
    print(f"overall_auc:        {t_oa:.1f}s  click={oa[CLICK]:.4f}")
    print(f"TOTAL metrics {t_pm + t_ga + t_oa:.1f}s on {n_rows} rows, "
          f"peak RSS {peak_rss_gb():.1f} GB")


def main():
    if "--stream" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--stream"]
        n_rows = int(args[0]) if args else 105_400_000
        n_groups = int(args[1]) if len(args) > 1 else n_rows // 10
        stream_bench(n_rows, n_groups)
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    schema = ["label", "sid", "uuid"]

    t0 = time.time()
    headers, scores, labels, gid = synth(n_rows, n_groups)
    print(f"synth {n_rows} rows / {n_groups} nominal groups: "
          f"{time.time()-t0:.1f}s")

    t0 = time.time()
    pm = precision_mrr_at_n(schema, headers, scores)
    t_pm = time.time() - t0
    print(f"precision_mrr_at_n: {t_pm:.1f}s  "
          f"P@4[click]={pm[CLICK][0][1]:.4f} MRR@4[click]={pm[CLICK][1][1]:.4f}")

    t0 = time.time()
    ga = grouped_auc(schema, headers, scores)
    t_ga = time.time() - t0
    print(f"grouped_auc:        {t_ga:.1f}s  "
          f"click={ga[CLICK]:.4f} order={ga[ORDER]:.4f}")

    t0 = time.time()
    oa = overall_auc(schema, headers, scores)
    t_oa = time.time() - t0
    print(f"overall_auc:        {t_oa:.1f}s  "
          f"click={oa[CLICK]:.4f} order={oa[ORDER]:.4f}")

    # shared-parse mode: what the test driver actually does (evaluate.py
    # parses once and hands the same ParsedHeaders to every metric)
    from cikm2020_dmt_tpu.metrics.offline import parse_headers
    t0 = time.time()
    ph = parse_headers(schema, headers)
    t_parse = time.time() - t0
    t0 = time.time()
    pm2 = precision_mrr_at_n(schema, ph, scores)
    ga2 = grouped_auc(schema, ph, scores)
    oa2 = overall_auc(schema, ph, scores)
    t_shared = time.time() - t0
    print(f"shared-parse: parse {t_parse:.1f}s + all three metrics "
          f"{t_shared:.1f}s")
    assert np.allclose(pm2[CLICK][0], pm[CLICK][0])
    assert abs(ga2[CLICK] - ga[CLICK]) < 1e-12
    assert abs(oa2[ORDER] - oa[ORDER]) < 1e-12

    # oracle cross-check on 50 sampled groups (per-group sklearn-style AUC)
    rng = np.random.default_rng(1)
    sample = rng.choice(np.unique(gid), 50, replace=False)
    oracle = {}
    for g in sample:
        m = gid == g
        if m.sum() < 2:
            continue
        y = (labels[m] >= CLICK).astype(int)
        s = scores[m]
        if y.min() == y.max():
            oracle[int(g)] = 1.0
            continue
        order = np.argsort(s, kind="mergesort")
        ss, yy = s[order], y[order]
        r = np.arange(1.0, len(ss) + 1)
        # tie-average
        _, inv, cnt = np.unique(ss, return_inverse=True, return_counts=True)
        csum = np.zeros(len(cnt))
        np.add.at(csum, inv, r)
        r_avg = (csum / cnt)[inv]
        npos = yy.sum()
        oracle[int(g)] = ((r_avg[yy > 0].sum() - npos * (npos + 1) / 2)
                          / (npos * (len(yy) - npos)))
    # recompute the vectorized per-group aucs for the same groups
    from cikm2020_dmt_tpu.metrics.offline import (_grouped_prep,
                                                  _segment_grouped_auc)
    codes = np.unique(gid, return_inverse=True)[1]
    prep = _grouped_prep(codes, scores)
    auc_all, glen, gstarts, order = _segment_grouped_auc(
        codes, (labels >= CLICK).astype(np.int8), scores, prep)
    sorted_gid = gid[order]
    seg_ids = sorted_gid[gstarts]
    vec = {int(g): a for g, a, L in zip(seg_ids, auc_all, glen) if L >= 2}
    worst = 0.0
    checked = 0
    for g, a in oracle.items():
        if g in vec:
            worst = max(worst, abs(vec[g] - a))
            checked += 1
    print(f"oracle cross-check ({checked} groups): max |diff| = {worst:.2e}")
    assert worst < 1e-9, "vectorized AUC diverges from per-group oracle"
    print("OK")


if __name__ == "__main__":
    main()
