"""Evaluator + predict: checkpoint-polling eval loop and batch scoring.

Mirrors the reference's separate evaluator process
(reference run_dnn.py:432-632) and test/predict path (run_dnn.py:635-897):
- polls the checkpoint dir for new DONE-marked steps (filesystem protocol)
- streams precision/recall/AUC/mean-loss over the eval split
- collects sigmoid scores + headers, then offline session metrics
  (P@N / MRR@N on sigma_clk + sigma_ord) and grouped AUC
- predict supports the 'rel' vs biased score switch (run_dnn.py:677-687)
"""

from __future__ import annotations

import os
import re
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.config import DMTConfig
from ..core.logging import SummaryWriter, log_line, log_to_file
from ..data.pipeline import Batch, prefetch
from ..metrics import offline
from ..metrics.streaming import (task_metrics_init, task_metrics_update,
                                 task_metrics_values)
from ..models.zoo import BaseModel, build_model
from .losses import (multi_task_loss, multi_task_unbias_loss,
                     scores_from_logits, single_task_loss,
                     single_task_unbias_loss)


def make_eval_step(cfg: DMTConfig, model: BaseModel, rel_only: bool = False,
                   collect_gates: bool = False):
    """Jitted eval step: scores + loss + metric update on one batch.

    With ``collect_gates`` (mmoe-family models) the step also returns the
    valid-weighted per-task gate-softmax sum [T, E] — the gate tensors the
    reference's predict() fetches by name every batch
    (reference run_dnn.py:721-725,777-814).  The recomputed trunk CSEs with
    the apply() trunk inside the same jit, so this costs no extra matmuls.
    """

    def eval_fn(params, mstate, metrics, batch):
        out, _ = model.apply(params, mstate, batch, train=False)
        uncertainty = params.get("uncertainty") if isinstance(params, dict) else None
        if cfg.is_unbias_model and model.num_tasks == 2:
            loss = multi_task_unbias_loss(cfg, out, batch["mask"], uncertainty)
        elif cfg.is_unbias_model:
            loss = single_task_unbias_loss(cfg, out, batch["mask"],
                                           batch["label"], train=False)
        elif model.num_tasks == 2:
            loss = multi_task_loss(cfg, out, batch["mask"], uncertainty)
        else:
            loss = single_task_loss(cfg, out, batch["mask"], batch["label"],
                                    train=False)
        p_ctr, p_cvr = scores_from_logits(cfg, out, rel_only=rel_only)
        metrics = task_metrics_update(
            metrics, mask=batch["mask"], p_ctr=p_ctr, p_cvr=p_cvr,
            loss=loss, weights=batch["valid"])
        if collect_gates:
            gates = model.gate_values(params, batch)          # [T, B, E]
            gate_sum = jnp.einsum("tbe,b->te", gates, batch["valid"])
            return metrics, p_ctr, p_cvr, gate_sum
        return metrics, p_ctr, p_cvr, None

    return jax.jit(eval_fn, donate_argnums=(2,))


def run_eval(cfg: DMTConfig, model: BaseModel, params, mstate,
             data_path: str, batch_size: int, *, rel_only: bool = False,
             data_iter: Optional[Iterator[Batch]] = None, mesh=None,
             collect_gates: bool = False, detail_file: Optional[str] = None):
    """Drain an eval split; returns (metric values, headers, p_clk, p_ord).

    ``headers`` is a list of raw lines for small splits, or a
    ``ParsedHeaders`` (labels + group codes, no raw lines) once the split
    crosses the streaming-collector threshold — every offline metric
    accepts either (metrics/offline.HeaderCollector; the reference's
    run_dnn.py:554-576 holds all headers in RAM and cannot survive its
    own 105.4M-row split).

    With ``detail_file``, per-row "header\\tp_clk\\tp_ord" lines stream to
    disk batch-by-batch (the reference predict()'s detail dump,
    run_dnn.py:833-849) regardless of collector spill.

    With ``mesh``, batches shard over the data axis and the sharded
    embedding engine serves row-split tables (multi-chip eval).

    With ``collect_gates`` (mmoe-family models only) a 5th element is
    returned: the valid-weighted mean gate softmax per task, shape
    [num_tasks, num_experts] (reference run_dnn.py:777-814)."""
    if mesh is not None:
        from ..core.mesh import batch_sharding
        from ..parallel.embedding_shard import make_engine
        model.engine = make_engine(cfg, mesh)
        bsh = batch_sharding(mesh)
    step_fn = make_eval_step(cfg, model, rel_only, collect_gates)
    metrics = task_metrics_init()
    collector = offline.HeaderCollector(cfg.header_schema)
    clk_scores: list[np.ndarray] = []
    ord_scores: list[np.ndarray] = []
    gate_total: Optional[np.ndarray] = None
    n_total = 0
    if data_iter is None:
        from .loop import make_input_stream
        data_iter = prefetch(make_input_stream(
            cfg, data_path, batch_size, epochs=1, shuffle=False,
            drop_remainder=False, pad_remainder=True))
    detail = open(detail_file, "a") if detail_file else None
    try:
        for batch in data_iter:
            if mesh is not None:
                jb = {k: jax.device_put(v, bsh)
                      for k, v in batch.arrays.items()}
            else:
                jb = {k: jax.numpy.asarray(v) for k, v in batch.arrays.items()}
            metrics, p_ctr, p_cvr, gate_sum = step_fn(
                params, mstate, metrics, jb)
            n_valid = int(batch["valid"].sum())
            pc = np.asarray(p_ctr)[:n_valid]
            po = np.asarray(p_cvr)[:n_valid]
            clk_scores.append(pc)
            ord_scores.append(po)
            lines = batch.headers[:n_valid]
            collector.extend(lines)
            if detail is not None:
                detail.writelines(
                    h.decode() + f"\t{sc}\t{so}\n"
                    for h, sc, so in zip(lines, pc, po))
            if gate_sum is not None:
                gs = np.asarray(gate_sum, np.float64)
                gate_total = gs if gate_total is None else gate_total + gs
                n_total += n_valid
    finally:
        if detail is not None:
            detail.close()
    headers = collector.result()
    p_clk = np.concatenate(clk_scores) if clk_scores else np.zeros(0)
    p_ord = np.concatenate(ord_scores) if ord_scores else np.zeros(0)
    vals = task_metrics_values(metrics)
    if collect_gates:
        gate_mean = (gate_total / max(n_total, 1)
                     if gate_total is not None else None)
        return vals, headers, p_clk, p_ord, gate_mean
    return vals, headers, p_clk, p_ord


_ITER_RE = re.compile(r">> iter_steps:(\d+)")


def newest_result_step(result_path: str) -> int:
    """Reference get_validation_newest_step (run_dnn.py:391-406)."""
    if not os.path.exists(result_path):
        return 0
    step = 0
    with open(result_path) as f:
        for line in f:
            m = _ITER_RE.search(line)
            if m:
                step = max(step, int(m.group(1)))
    return step


def _write_offline_metrics(cfg: DMTConfig, headers, total_score,
                           out_path: str) -> dict:
    metric_sets = offline.precision_mrr_at_n(
        cfg.header_schema, headers, total_score)
    for action, (pre, mrr) in metric_sets.items():
        lines = []
        for n, p, m in zip(offline.AT_LIST, pre, mrr):
            lines.append(f"action_{action}_pre_at_{n}: {p}")
            lines.append(f"action_{action}_mrr_at_{n}: {m}")
        log_to_file("\n".join(lines), out_path)
    return metric_sets


def validation(cfg: DMTConfig, once: bool = False,
               poll_interval: float = 5.0,
               max_steps: Optional[int] = None) -> Optional[dict]:
    """Evaluator role: poll for new checkpoints, evaluate each
    (reference validation(), run_dnn.py:432-632)."""
    model = build_model(cfg)
    ckpt = CheckpointManager(cfg.model_path)
    result_path = cfg.validation_result_path
    step = newest_result_step(result_path)
    limit = max_steps if max_steps is not None else cfg.max_iter_step
    summary = (SummaryWriter(cfg.summary_path, "validation")
               if cfg.summary_path else None)
    last_vals = None
    while step < limit:
        new_step = ckpt.newest_step_after(step)
        if new_step is None:
            if once:
                break
            time.sleep(poll_interval)
            continue
        step = new_step
        restored = _restore_for_eval(ckpt, step, model)
        vals, headers, p_clk, p_ord = run_eval(
            cfg, model, restored["params"], restored["model_state"],
            cfg.validation_data_path, cfg.validation_batch_size)
        log_line(f"validation @ step {step}: " + " | ".join(
            f"{k} {v:.6f}" for k, v in vals.items()))
        lines = [f">> iter_steps:{step}"] + [
            f"validation_{k}:{v}" for k, v in vals.items()]
        log_to_file("\n".join(lines), result_path)
        if summary is not None:
            summary.scalars(step, vals)
        # offline session metrics on sigma_clk + sigma_ord (run_dnn.py:617-629)
        _write_offline_metrics(cfg, headers, p_clk + p_ord, result_path)
        last_vals = vals
        if once:
            break
    return last_vals


def _template(model: BaseModel):
    params, mstate = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0)))
    zeros = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), (params, mstate))
    from .optim import make_optimizer
    p0, m0 = zeros
    opt = make_optimizer(model.cfg).init(p0)
    return {"params": p0, "model_state": m0, "opt_state": opt,
        "step": np.zeros((), np.int32)}


def _restore_for_eval(ckpt: CheckpointManager, step: int, model: BaseModel):
    """Restore params/model_state regardless of how the trainer structured
    its optimizer state (dense optax vs lazy-Adam split, train/lazy.py):
    try the dense-trainer template first, fall back to a structure-agnostic
    raw restore — eval only reads params + model_state, which are plain
    dicts of arrays under either layout."""
    try:
        return ckpt.restore(step, _template(model))
    except (ValueError, KeyError, TypeError) as e:
        # Structure mismatch (lazy-Adam trainers store opt_state as
        # {dense, lazy} instead of a single optax tree).  Anything else —
        # missing files, corrupt arrays, OSErrors — must propagate: a
        # silently degraded eval is worse than a crash.
        log_line(f"eval restore: template mismatch ({type(e).__name__}), "
                 "falling back to raw restore")
        return ckpt.restore(step)


def predict(cfg: DMTConfig, ckpt_step: int, test_tag: str = "",
            test_score_method: str = "rel",
            grid_search: bool = False) -> dict:
    """Test role (reference predict(), run_dnn.py:635-897): score every test
    path, write result + detail files, compute offline metrics."""
    model = build_model(cfg)
    ckpt = CheckpointManager(cfg.model_path)
    restored = _restore_for_eval(ckpt, ckpt_step, model)
    params, mstate = restored["params"], restored["model_state"]

    paths = (cfg.test_data_path_ord if test_tag == "ord"
             else cfg.test_data_path).split(",")
    rel_only = (test_score_method == "rel")

    out_file = os.path.join(
        cfg.output_path or ".",
        f"{cfg.tag}.ckpt-{ckpt_step}.test_result_{test_tag}_{test_score_method}")
    detail_file = out_file + ".detail"
    for p in (out_file, detail_file):
        if os.path.exists(p):
            os.remove(p)

    # mmoe-family models surface their expert-gate distributions in the
    # test result file (reference predict() fetches the gate softmax
    # tensors by name each batch, run_dnn.py:721-725,777-814)
    collect_gates = hasattr(model, "gate_values")

    results = {}
    for test_path in paths:
        test_path = test_path.strip()
        if not test_path:
            continue
        gate_mean = None
        if collect_gates:
            vals, headers, p_clk, p_ord, gate_mean = run_eval(
                cfg, model, params, mstate, test_path, cfg.test_batch_size,
                rel_only=rel_only, collect_gates=True,
                detail_file=detail_file)
        else:
            vals, headers, p_clk, p_ord = run_eval(
                cfg, model, params, mstate, test_path, cfg.test_batch_size,
                rel_only=rel_only, detail_file=detail_file)
        log_line(f"test[{test_path}]: " + " | ".join(
            f"{k} {v:.6f}" for k, v in vals.items()))
        log_to_file("\n".join([f">> ckpt:{ckpt_step} path:{test_path}"] +
                              [f"test_{k}:{v}" for k, v in vals.items()]),
                    out_file)
        if gate_mean is not None:
            gate_lines = []
            for t, task in enumerate(("click", "order")[:gate_mean.shape[0]]):
                for e in range(gate_mean.shape[1]):
                    gate_lines.append(
                        f"gate_{task}_expert_{e}: {gate_mean[t, e]}")
            log_to_file("\n".join(gate_lines), out_file)
            log_line("mean gate softmax per task: " + "; ".join(
                f"{task} {np.array2string(gate_mean[t], precision=4)}"
                for t, task in enumerate(("click", "order")[:gate_mean.shape[0]])))
        total = p_clk + p_ord  # reference total score (run_dnn.py:833-849)
        # parse the header lines once; every metric call below (and the
        # optional grid search) shares the ParsedHeaders + group codes
        parsed = offline.parse_headers(cfg.header_schema, headers)
        pm = _write_offline_metrics(cfg, parsed, total, out_file)
        gauc = offline.grouped_auc(cfg.header_schema, parsed, total)
        oauc_clk = offline.overall_auc(cfg.header_schema, parsed, p_clk)
        oauc_ord = offline.overall_auc(cfg.header_schema, parsed, p_ord)
        log_to_file(
            f"grouped_auc_click: {gauc[offline.CLICK]}\n"
            f"grouped_auc_order: {gauc[offline.ORDER]}\n"
            f"overall_auc_click: {oauc_clk[offline.CLICK]}\n"
            f"overall_auc_order: {oauc_ord[offline.ORDER]}", out_file)
        results[test_path] = {
            "streaming": vals, "precision_mrr": pm, "grouped_auc": gauc,
            "overall_auc": {"click": oauc_clk[offline.CLICK],
                            "order": oauc_ord[offline.ORDER]},
        }
        if gate_mean is not None:
            results[test_path]["gate_mean"] = gate_mean
        if grid_search:
            # metrics2-style blend-weight sweep + per-head/weighted AUCs
            from ..metrics.offline_ext import grid_search as run_grid
            results[test_path]["grid"] = run_grid(
                cfg.header_schema, parsed, p_clk, p_ord, out_file=out_file)
    return results
