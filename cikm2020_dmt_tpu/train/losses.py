"""Loss functions: multi-task weighted CE, unbiased two-head losses, L2.

Faithful to the reference's exact reduction order
(reference model/inference_mlp.py:146-258):

    entropy_mat = (mask * class_weight)^T * xent        # [C, B]
    loss        = sum_c mean_b entropy_mat              # mean over batch,
                                                        # sum over classes

ESMM-style label derivation from the one-hot mask over classes
[0, 1, 2, 4, 5] (reference inference_mlp.py:192-193,235-236):

    label_clk   = sum(mask[:, 1:5])    # any of {1,2,4,5}
    label_order = mask[:,3] + mask[:,4]  # {4,5}
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import DMTConfig

KERAS_EPS = 1e-7  # keras backend prob clipping in sparse_categorical_crossentropy


def sigmoid_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.sigmoid_cross_entropy_with_logits: max(l,0) - l*z + log1p(e^-|l|)."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def binary_xent_from_prob(p: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """The reference's cal_cross_entropy (inference_mlp.py:162-168): keras
    sparse-categorical CE over [1-p, p] with prob clipping."""
    p_label = jnp.where(labels > 0.5, p, 1.0 - p)
    p_label = jnp.clip(p_label, KERAS_EPS, 1.0 - KERAS_EPS)
    return -jnp.log(p_label)


def weighted_class_reduce(xent: jnp.ndarray, mask: jnp.ndarray,
                          class_weights: jnp.ndarray) -> jnp.ndarray:
    """sum_c mean_b (mask[b,c] * w[c] * xent[b]) — reference reduction."""
    mw = mask * class_weights[None, :]
    return jnp.sum(jnp.mean(mw * xent[:, None], axis=0))


def derive_task_labels(mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    labels_clk = jnp.sum(mask[:, 1:5], axis=-1)
    labels_order = mask[:, 3] + mask[:, 4]
    return labels_clk, labels_order


def _task_weight(cfg: DMTConfig, loss_clk, loss_order, uncertainty: Optional[dict]):
    """Fixed or Kendall-uncertainty task weighting (inference_mlp.py:216-223)."""
    if cfg.loss_weight_method == "uncertainty" and uncertainty is not None:
        wc = uncertainty["click_weight"][0]
        wo = uncertainty["order_weight"][0]
        return (jnp.exp(-wc) * loss_clk + 0.5 * wc
                + jnp.exp(-wo) * loss_order + 0.5 * wo)
    return cfg.loss_weight[0] * loss_clk + cfg.loss_weight[1] * loss_order


def multi_task_loss(cfg: DMTConfig, logits, mask: jnp.ndarray,
                    uncertainty: Optional[dict] = None,
                    sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Two-head sigmoid-CE loss (reference logit_loss, inference_mlp.py:228-258).

    ``sample_weight`` optionally applies the IPS propensity weight per
    example (the reference passes propensity_weight_mul but its non-unbias
    loss signature never accepts it, SURVEY.md §2.4.3 — here it works).
    """
    click_logit, order_logit = logits
    labels_clk, labels_order = derive_task_labels(mask)
    w_ctr = jnp.asarray(cfg.weight_vector(cfg.weight_ctr), mask.dtype)
    w_ecvr = jnp.asarray(cfg.weight_vector(cfg.weight_ecvr), mask.dtype)

    xent_clk = sigmoid_xent(click_logit.reshape(-1), labels_clk)
    xent_ord = sigmoid_xent(order_logit.reshape(-1), labels_order)
    if sample_weight is not None:
        xent_clk = xent_clk * sample_weight
        xent_ord = xent_ord * sample_weight
    loss_clk = weighted_class_reduce(xent_clk, mask, w_ctr)
    loss_order = weighted_class_reduce(xent_ord, mask, w_ecvr)
    return _task_weight(cfg, loss_clk, loss_order, uncertainty)


def multi_task_unbias_loss(cfg: DMTConfig, logits, mask: jnp.ndarray,
                           uncertainty: Optional[dict] = None) -> jnp.ndarray:
    """Unbiased two-head loss (reference logit_loss_unbias,
    inference_mlp.py:173-223): CE on the biased prob sigma(rel [+|*] bias),
    plus (ctr_rel mode) CE on the relevance-only prob."""
    (click_logit, order_logit), y_bias = logits
    click_logit = click_logit.reshape(-1)
    order_logit = order_logit.reshape(-1)
    y_bias = y_bias.reshape(-1)

    if cfg.loss_unbias_method == "two_head_multiply":
        p_ctr = jax.nn.sigmoid(click_logit) * jax.nn.sigmoid(y_bias)
        p_cvr = jax.nn.sigmoid(order_logit) * jax.nn.sigmoid(y_bias)
    else:  # two_head_add
        p_ctr = jax.nn.sigmoid(click_logit + y_bias)
        p_cvr = jax.nn.sigmoid(order_logit + y_bias)
    p_rel_ctr = jax.nn.sigmoid(click_logit)
    p_rel_cvr = jax.nn.sigmoid(order_logit)

    labels_clk, labels_order = derive_task_labels(mask)
    xent_clk = binary_xent_from_prob(p_ctr, labels_clk)
    xent_ord = binary_xent_from_prob(p_cvr, labels_order)
    if cfg.loss_ctr_rel_method == "ctr_rel":
        xent_clk = xent_clk + binary_xent_from_prob(p_rel_ctr, labels_clk)
        xent_ord = xent_ord + binary_xent_from_prob(p_rel_cvr, labels_order)

    w_ctr = jnp.asarray(cfg.weight_vector(cfg.weight_ctr), mask.dtype)
    w_ecvr = jnp.asarray(cfg.weight_vector(cfg.weight_ecvr), mask.dtype)
    loss_clk = weighted_class_reduce(xent_clk, mask, w_ctr)
    loss_order = weighted_class_reduce(xent_ord, mask, w_ecvr)
    return _task_weight(cfg, loss_clk, loss_order, uncertainty)


def single_task_loss(cfg: DMTConfig, logits: jnp.ndarray, mask: jnp.ndarray,
                     labels: Optional[jnp.ndarray] = None,
                     train: bool = True) -> jnp.ndarray:
    """Single-logit CTR loss for mlp/embed_mlp/transformer models.

    The reference's single-task ``loss`` (inference_mlp.py:146-160) feeds the
    *raw multi-valued label* (0..5) into sigmoid CE; by default we use the
    derived binary click label instead (documented deviation — the raw-label
    CE is not a proper binary objective).  ``cfg.single_task_raw_label``
    opts into exact reference fidelity when ``labels`` (the raw label
    column) is provided.
    """
    if cfg.single_task_raw_label and labels is not None:
        target = labels.reshape(-1).astype(mask.dtype)
    else:
        target, _ = derive_task_labels(mask)
    weights = cfg.train_weight if train else cfg.valid_weight
    w = jnp.asarray(cfg.weight_vector(weights), mask.dtype)
    xent = sigmoid_xent(logits.reshape(-1), target)
    return weighted_class_reduce(xent, mask, w)


def single_task_unbias_loss(cfg: DMTConfig, logits, mask: jnp.ndarray,
                            labels: Optional[jnp.ndarray] = None,
                            train: bool = True) -> jnp.ndarray:
    """Single-head unbiased loss for ``embed_mlp_unbias``.

    The reference dispatches this model type (inference_mlp.py:33-35) but
    its source was never committed (bytecode-only, SURVEY.md §2.4.1); this
    is the single-task analog of ``logit_loss_unbias``
    (inference_mlp.py:173-223): CE on the biased prob sigma(rel [+|*] bias)
    plus (ctr_rel mode) CE on the relevance-only prob, click-task class
    weights.
    """
    y_rel, y_bias = logits
    y_rel = y_rel.reshape(-1)
    y_bias = y_bias.reshape(-1)
    if cfg.loss_unbias_method == "two_head_multiply":
        p = jax.nn.sigmoid(y_rel) * jax.nn.sigmoid(y_bias)
    else:  # two_head_add
        p = jax.nn.sigmoid(y_rel + y_bias)
    if cfg.single_task_raw_label and labels is not None:
        target = labels.reshape(-1).astype(mask.dtype)
    else:
        target, _ = derive_task_labels(mask)
    xent = binary_xent_from_prob(p, target)
    if cfg.loss_ctr_rel_method == "ctr_rel":
        xent = xent + binary_xent_from_prob(jax.nn.sigmoid(y_rel), target)
    weights = cfg.train_weight if train else cfg.valid_weight
    w = jnp.asarray(cfg.weight_vector(weights), mask.dtype)
    return weighted_class_reduce(xent, mask, w)


def scores_from_logits(cfg: DMTConfig, logits, *, rel_only: bool = False):
    """(p_ctr, p_cvr) from model outputs — the reference's cal_ctr_cvr /
    cal_ctr_cvr_unibas (run_dnn.py:90-108) plus the test-time 'rel' switch
    (run_dnn.py:677-687)."""
    if isinstance(logits, tuple) and isinstance(logits[0], tuple):
        (click_logit, order_logit), y_bias = logits
        click_logit = click_logit.reshape(-1)
        order_logit = order_logit.reshape(-1)
        y_bias = y_bias.reshape(-1)
        if rel_only:
            return jax.nn.sigmoid(click_logit), jax.nn.sigmoid(order_logit)
        if cfg.loss_unbias_method == "two_head_multiply":
            return (jax.nn.sigmoid(click_logit) * jax.nn.sigmoid(y_bias),
                    jax.nn.sigmoid(order_logit) * jax.nn.sigmoid(y_bias))
        return (jax.nn.sigmoid(click_logit + y_bias),
                jax.nn.sigmoid(order_logit + y_bias))
    if isinstance(logits, tuple) and cfg.is_unbias_model and not cfg.is_multi_task:
        # single-head unbias (embed_mlp_unbias): (rel_logit, bias_logit)
        y_rel, y_bias = logits
        y_rel = y_rel.reshape(-1)
        y_bias = y_bias.reshape(-1)
        if rel_only:
            p = jax.nn.sigmoid(y_rel)
        elif cfg.loss_unbias_method == "two_head_multiply":
            p = jax.nn.sigmoid(y_rel) * jax.nn.sigmoid(y_bias)
        else:
            p = jax.nn.sigmoid(y_rel + y_bias)
        return p, p
    if isinstance(logits, tuple):
        click_logit, order_logit = logits
        return (jax.nn.sigmoid(click_logit.reshape(-1)),
                jax.nn.sigmoid(order_logit.reshape(-1)))
    p = jax.nn.sigmoid(logits.reshape(-1))
    return p, p


def l2_regularization(cfg: DMTConfig, params, batch) -> jnp.ndarray:
    """Weight decay on dense kernels + batch-unique embedding-row L2
    (reference embed_mlp.py:53-72 / mmoe_transformer_unbias.py:42-61).

    Row uniqueness is realized with a presence scatter instead of
    ``tf.unique`` (dynamic shapes don't jit); each touched row contributes
    its L2 exactly once, matching the reference.
    """
    from ..data.pipeline import IDS  # local import to avoid cycle

    reg = jnp.float32(0.0)
    if cfg.wnd_wd > 0.0:
        # tf.contrib.layers.l2_regularizer: wd * sum(w^2) / 2, dense kernels only
        def add_dense(tree):
            total = jnp.float32(0.0)
            if isinstance(tree, dict):
                for k, v in tree.items():
                    if k == "w":
                        total += jnp.sum(v.astype(jnp.float32) ** 2)
                    elif isinstance(v, (dict, list)):
                        total += add_dense(v)
            elif isinstance(tree, list):
                for v in tree:
                    total += add_dense(v)
            return total

        reg = reg + 0.5 * cfg.wnd_wd * add_dense(params)

    emb = params.get("emb") if isinstance(params, dict) else None
    if emb and cfg.l2_emb_lambda > 0.0:
        from ..nn.embedding import unpack_table
        total = jnp.float32(0.0)
        dims = {s2.table: (s2.id_size, s2.dim) for s2 in cfg.embeddings}
        touched: dict[str, jnp.ndarray] = {}
        for spec in cfg.embeddings:
            key = spec.feature + IDS
            if key not in batch:
                continue
            ids = batch[key].reshape(-1)
            presence = touched.get(spec.table)
            if presence is None:
                presence = jnp.zeros((spec.id_size,), jnp.float32)
            touched[spec.table] = presence.at[ids].max(1.0, mode="drop")
        for table_name, presence in touched.items():
            rows, dim = dims[table_name]
            logical = (unpack_table(emb[table_name], rows, dim)
                       if cfg.packed_tables else emb[table_name])
            row_sq = jnp.sum(logical.astype(jnp.float32) ** 2, axis=-1)
            total += 0.5 * jnp.sum(presence * row_sq)
        reg = reg + total * cfg.l2_emb_lambda / cfg.batch_size
    return reg
