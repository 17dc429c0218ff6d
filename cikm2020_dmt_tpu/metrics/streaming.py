"""On-device streaming metrics: precision / recall / AUC / mean loss.

Device-resident counter pytrees updated inside jit, replacing the
reference's in-graph ``tf.metrics.{precision,recall,auc,mean}`` locals
(reference run_dnn.py:217-253,489-528).  AUC uses the same bucketed
estimator as TF1: 200 thresholds spanning [-eps, 1+eps], trapezoidal
interpolation over the ROC curve.

All updates take a per-example ``weights`` vector so padded eval rows
(Batch.valid == 0) never contaminate the counts.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_THRESHOLDS = 200
EPS = 1e-7


def _thresholds(n: int = NUM_THRESHOLDS) -> jnp.ndarray:
    mid = [(i + 1) / (n - 1) for i in range(n - 2)]
    return jnp.asarray([-EPS] + mid + [1.0 + EPS], jnp.float32)


def auc_init(n: int = NUM_THRESHOLDS) -> dict:
    # distinct buffers per counter: the state is donated into jitted
    # updates, and aliased leaves would be donated twice
    return {k: jnp.zeros((n,), jnp.float32) for k in ("tp", "fp", "tn", "fn")}


def auc_update(state: dict, labels: jnp.ndarray, preds: jnp.ndarray,
               weights: jnp.ndarray) -> dict:
    """Bucketed update via histogram + suffix-sum.

    Equivalent to the textbook [T, B] threshold-comparison formulation
    (4 weighted [T, B] f32 masks + reductions, measured 11 ms/step at
    batch 4096 on v5e — 13% of the train step): #{t : t < p} drops each
    example into one bucket and tp[t] = sum of buckets > t.  The bucket
    index is ONE [B, T] boolean compare-sum — NOT ``jnp.searchsorted``,
    which lowers to a vmapped binary-search while-loop costing ~1 ms/step
    on TPU (same law as the lazy-Adam dedup: build everything from
    vectorized compares/sorts/cumsums, never searchsorted)."""
    n = state["tp"].shape[0]
    th = _thresholds(n)
    pos = (labels > 0).astype(jnp.float32) * weights          # [B]
    neg = (labels <= 0).astype(jnp.float32) * weights
    c = jnp.sum((th[None, :] < preds[:, None]).astype(jnp.int32),
                axis=1)                                       # [B] in 0..n
    # searchsorted-parity for NaN preds (diverged runs): NaN sorts last,
    # i.e. above every threshold, whereas (th < NaN) is everywhere False
    c = jnp.where(jnp.isnan(preds), n, c)
    hist = jnp.zeros((n + 1, 2), jnp.float32).at[c].add(
        jnp.stack([pos, neg], axis=-1))                       # one scatter
    tail = jnp.cumsum(hist[::-1], axis=0)[::-1]               # [n+1, 2]
    tp_inc, fp_inc = tail[1:, 0], tail[1:, 1]                 # c >= t+1
    tot_pos, tot_neg = jnp.sum(pos), jnp.sum(neg)
    return {
        "tp": state["tp"] + tp_inc,
        "fp": state["fp"] + fp_inc,
        "fn": state["fn"] + (tot_pos - tp_inc),
        "tn": state["tn"] + (tot_neg - fp_inc),
    }


def auc_value(state: dict) -> jnp.ndarray:
    tp, fp, tn, fn = state["tp"], state["fp"], state["tn"], state["fn"]
    tpr = (tp + EPS) / (tp + fn + EPS)
    fpr = fp / (fp + tn + EPS)
    # thresholds ascend => rates descend; trapezoid over ROC
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)


def prf_init() -> dict:
    return {k: jnp.zeros((), jnp.float32) for k in ("tp", "fp", "fn")}


def prf_update(state: dict, labels: jnp.ndarray, pred_binary: jnp.ndarray,
               weights: jnp.ndarray) -> dict:
    pos = (labels > 0).astype(jnp.float32) * weights
    neg = (labels <= 0).astype(jnp.float32) * weights
    p = (pred_binary > 0).astype(jnp.float32)
    return {
        "tp": state["tp"] + jnp.sum(p * pos),
        "fp": state["fp"] + jnp.sum(p * neg),
        "fn": state["fn"] + jnp.sum((1 - p) * pos),
    }


def precision_value(state: dict) -> jnp.ndarray:
    denom = state["tp"] + state["fp"]
    return jnp.where(denom > 0, state["tp"] / jnp.maximum(denom, 1.0), 0.0)


def recall_value(state: dict) -> jnp.ndarray:
    denom = state["tp"] + state["fn"]
    return jnp.where(denom > 0, state["tp"] / jnp.maximum(denom, 1.0), 0.0)


def mean_init() -> dict:
    return {"total": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.float32)}


def mean_update(state: dict, value: jnp.ndarray, weight: float = 1.0) -> dict:
    return {"total": state["total"] + value * weight,
            "count": state["count"] + weight}


def mean_value(state: dict) -> jnp.ndarray:
    return jnp.where(state["count"] > 0,
                     state["total"] / jnp.maximum(state["count"], 1.0), 0.0)


# ---------------------------------------------------------------------------
# Bundle: the per-task metric block the reference prints each step
# ---------------------------------------------------------------------------


def task_metrics_init() -> dict:
    return {
        "click": {"prf": prf_init(), "auc": auc_init()},
        "order": {"prf": prf_init(), "auc": auc_init()},
        "loss": mean_init(),
    }


def task_metrics_update(state: dict, *, mask: jnp.ndarray,
                        p_ctr: jnp.ndarray, p_cvr: jnp.ndarray,
                        loss: jnp.ndarray, weights: jnp.ndarray) -> dict:
    """Accumulate both tasks' streaming metrics; labels derive from the mask
    exactly as run_dnn.py:217-241 does."""
    labels_clk = jnp.sum(mask[:, 1:5], axis=-1)
    labels_ord = mask[:, 3] + mask[:, 4]
    clk_bin = (p_ctr > 0.5).astype(jnp.float32)
    ord_bin = (p_cvr > 0.5).astype(jnp.float32)
    return {
        "click": {
            "prf": prf_update(state["click"]["prf"], labels_clk, clk_bin, weights),
            "auc": auc_update(state["click"]["auc"], labels_clk, p_ctr, weights),
        },
        "order": {
            "prf": prf_update(state["order"]["prf"], labels_ord, ord_bin, weights),
            "auc": auc_update(state["order"]["auc"], labels_ord, p_cvr, weights),
        },
        "loss": mean_update(state["loss"], loss),
    }


def task_metrics_values(state: dict) -> dict:
    return {
        "loss": float(mean_value(state["loss"])),
        "click_precision": float(precision_value(state["click"]["prf"])),
        "click_recall": float(recall_value(state["click"]["prf"])),
        "click_auc": float(auc_value(state["click"]["auc"])),
        "order_precision": float(precision_value(state["order"]["prf"])),
        "order_recall": float(recall_value(state["order"]["prf"])),
        "order_auc": float(auc_value(state["order"]["auc"])),
    }
