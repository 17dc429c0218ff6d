"""Offline ranking metrics: session P@N / MRR@N and grouped AUC.

Semantics match the reference exactly (reference metrics/metrics.py):

- groups: sid (session) for P@N/MRR@N, uuid (user) for AUC
- per group sort by (score desc, label asc)  [metrics.py:97]
- P@N  = mean over top-N of (label >= action); N in {2,4,6,8,10,12,14}
- MRR@N = 1/rank of first top-N hit, else 0
- thresholds: CLICK -> label>=2, ORDER -> label>=5  [metrics.py:49-50]
- averages divide by the number of groups  [metrics.py:171-194]
- AUC: size-1 groups skipped; single-class groups count as 1.0
  (the reference's ``except -> return 1``, metrics.py:69-74); mean over
  the remaining groups

Implementation is vectorized NumPy over group segments instead of the
reference's pandas + fork-per-0.7*ncpu multiprocessing — same numbers,
no process pool.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

CLICK = 2
ORDER = 5
AT_LIST = (2, 4, 6, 8, 10, 12, 14)


def _parse_headers(header_schema: Sequence[str], headers: Sequence[bytes]):
    idx = {name: i for i, name in enumerate(header_schema)}
    label_i, sid_i, uuid_i = idx["label"], idx["sid"], idx.get("uuid", idx["sid"])
    labels = np.empty(len(headers), np.int64)
    sids = np.empty(len(headers), object)
    uuids = np.empty(len(headers), object)
    for j, h in enumerate(headers):
        f = (h.decode() if isinstance(h, bytes) else h).strip().split("\t")
        labels[j] = int(f[label_i])
        sids[j] = f[sid_i]
        uuids[j] = f[uuid_i]
    return labels, sids, uuids


def _group_segments(keys: np.ndarray, order: np.ndarray):
    """Given a sort order grouping identical keys contiguously, return
    (starts, ends) segment boundaries."""
    sorted_keys = keys[order]
    change = np.empty(len(order), bool)
    change[0] = True
    change[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(order))
    return starts, ends


def _sort_groups(keys, scores, labels):
    """Lexsort: groups contiguous, within group score desc then label asc."""
    # np.lexsort: last key is primary
    codes = np.unique(keys, return_inverse=True)[1]
    order = np.lexsort((labels, -scores, codes))
    return order


def precision_mrr_at_n(header_schema, headers, scores,
                       at_list=AT_LIST) -> dict:
    """Reference get_offline_metrics (metrics.py:122-199):
    {CLICK: (pre@N array, mrr@N array), ORDER: (...)} averaged over sid
    groups."""
    labels, sids, _ = _parse_headers(header_schema, headers)
    scores = np.asarray(scores, np.float64)
    order = _sort_groups(sids, scores, labels)
    starts, ends = _group_segments(sids, order)
    sorted_labels = labels[order]
    n_groups = len(starts)

    out = {}
    for action in (CLICK, ORDER):
        hits = (sorted_labels >= action).astype(np.float64)
        chits = np.concatenate([[0.0], np.cumsum(hits)])
        pre = np.zeros(len(at_list))
        mrr = np.zeros(len(at_list))
        # rank (1-based, within group) of the first hit, inf if none
        for gi in range(n_groups):
            s, e = starts[gi], ends[gi]
            g_hits = hits[s:e]
            nz = np.flatnonzero(g_hits)
            first = nz[0] + 1 if len(nz) else np.inf
            glen = e - s
            for ai, N in enumerate(at_list):
                k = min(N, glen)
                pre[ai] += (chits[s + k] - chits[s]) / k
                if first <= k:
                    mrr[ai] += 1.0 / first
        pre /= max(n_groups, 1)
        mrr /= max(n_groups, 1)
        out[action] = (pre, mrr)
    return out


def _auc_rank(labels01: np.ndarray, scores: np.ndarray) -> float:
    """Mann-Whitney AUC with tie-averaged ranks (== sklearn roc_auc_score)."""
    n_pos = int(labels01.sum())
    n_neg = len(labels01) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 1.0  # reference except->1 (metrics.py:69-74)
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks over score ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    rank_sum = ranks[labels01 > 0].sum()
    return (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def grouped_auc(header_schema, headers, scores,
                group_method: str = "uuid") -> dict:
    """Reference get_offline_metrics_auc (metrics.py:204-276):
    {CLICK: auc, ORDER: auc} — per-group AUC averaged over groups with
    >=2 rows; single-class groups count 1.0."""
    labels, sids, uuids = _parse_headers(header_schema, headers)
    keys = uuids if group_method == "uuid" else sids
    scores = np.asarray(scores, np.float64)
    codes = np.unique(keys, return_inverse=True)[1]
    order = np.argsort(codes, kind="mergesort")
    starts, ends = _group_segments(keys, order)

    out = {}
    for action in (CLICK, ORDER):
        y = (labels >= action).astype(np.int8)
        total, n_valid = 0.0, 0
        for gi in range(len(starts)):
            seg = order[starts[gi]:ends[gi]]
            if len(seg) == 1:
                continue  # reference skips size-1 groups (metrics.py:235-237)
            total += _auc_rank(y[seg], scores[seg])
            n_valid += 1
        out[action] = total / max(n_valid, 1)
    return out


def overall_auc(header_schema, headers, scores) -> dict:
    """Ungrouped test AUC per task — the paper's Table-1 metric."""
    labels, _, _ = _parse_headers(header_schema, headers)
    scores = np.asarray(scores, np.float64)
    return {
        CLICK: _auc_rank((labels >= CLICK).astype(np.int8), scores),
        ORDER: _auc_rank((labels >= ORDER).astype(np.int8), scores),
    }
