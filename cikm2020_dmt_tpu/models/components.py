"""Shared model components: feature combiner, sequence machinery, MMoE,
task towers, bias net.

These are the building blocks the reference duplicates across its model
files (base.embedding_combiner, generate_data/trans_core in
transformer.py / multi_task_transformer.py / mmoe_transformer*.py,
expert_gate/build_tower in mmoe*.py) — implemented once here and composed
by the zoo in models/zoo.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import DMTConfig
from ..data.pipeline import IDS, LEN, WTS


def feature_wts(batch: dict, feature: str, ids) -> "jnp.ndarray":
    """Per-id weights; reconstructed as a presence mask when the batch
    omits them (cfg.unit_weights transfer optimization)."""
    wts = batch.get(feature + WTS)
    if wts is not None:
        return wts
    lens = batch[feature + LEN]
    pos = jax.lax.broadcasted_iota(jnp.int32, ids.shape, ids.ndim - 1)
    return (pos < lens[..., None]).astype(jnp.float32)
from ..nn.embedding import (collection_init, presence_mask, ts_bucketize)
from ..parallel.embedding_shard import DENSE_ENGINE, EmbeddingEngine
from ..nn.layers import (Params, State, dense_apply, dense_init,
                         dropout_rate, glorot_uniform, mlp_apply, mlp_init)
from ..nn.transformer import encode_decode, transformer_init


def _split(rng, n):
    return list(jax.random.split(rng, n))


# ---------------------------------------------------------------------------
# Pooled feature combiner (reference base.py:93-134)
# ---------------------------------------------------------------------------


def combiner_dim(cfg: DMTConfig, skip_seq: bool = False) -> int:
    dim = cfg.feature_dimension if cfg.is_use_feature else 0
    skip = _attention_user_features(cfg) if skip_seq else frozenset()
    for spec in cfg.embeddings:
        if spec.feature in skip:
            continue
        dim += spec.dim
    for a, b in cfg.sim_embed:
        spec = next(s for s in cfg.embeddings if s.feature == a)
        dim += 2 + 2 * spec.dim  # inner + cosine + |diff| + diff^2
    return dim


def _attention_user_features(cfg: DMTConfig) -> frozenset[str]:
    return frozenset(
        user for group in cfg.attention_pairs for user, _ in group)


def embedding_combiner(emb: Params, batch: dict, cfg: DMTConfig, *,
                       skip_seq: bool = False,
                       engine: EmbeddingEngine = DENSE_ENGINE,
                       seq_cache: Optional[dict] = None,
                       combiner: str = "mean",
                       wts_override: Optional[dict] = None) -> jnp.ndarray:
    """[dense features ∥ pooled embedding per spec ∥ sim crosses].

    ``skip_seq`` reproduces the single-sequence transformer model's
    override that excludes attention-pair user features from pooling
    (reference transformer.py:171-220).

    ``combiner``/``wts_override`` reproduce the reference combiner's
    ``combiner_type`` and per-feature ``Wts`` injection
    (base.py:93-116): DIN pools with combiner_type="sum" and replaces the
    attention-pair user features' weights with its raw attention scores
    (din.pyc ``embedding_din_weight_calc``, bytecode-only module).
    Override weights are [B, L] per-element values; padded slots are
    dropped by the pooling presence mask.
    """
    parts = []
    if cfg.is_use_feature:
        parts.append(batch["features"])
    skip = _attention_user_features(cfg) if skip_seq else frozenset()
    ts_feats = frozenset(cfg.attention_ts)
    sim_pool: dict[str, jnp.ndarray] = {}
    sim_wanted = frozenset(x for pair in cfg.sim_embed for x in pair)
    for spec in cfg.embeddings:
        if spec.feature in skip:
            continue
        ids = batch[spec.feature + IDS]
        if spec.feature in ts_feats:
            # bucket bound = LOGICAL rows (spec.id_size); the physical
            # table may be lane-packed (nn/embedding.pack_table)
            ids = ts_bucketize(ids, spec.id_size)
        wts = (wts_override[spec.feature]
               if wts_override and spec.feature in wts_override
               else feature_wts(batch, spec.feature, ids))
        if seq_cache is not None and spec.feature in seq_cache:
            from ..nn.embedding import pooled_from_grid
            pooled = pooled_from_grid(
                seq_cache[spec.feature], wts,
                batch[spec.feature + LEN], combiner)
        else:
            pooled = engine.pooled(
                spec.table, emb[spec.table], ids, wts,
                batch[spec.feature + LEN], combiner)
        if spec.feature in sim_wanted:
            sim_pool[spec.feature] = pooled
        parts.append(pooled)
    out = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    # similarity crosses (reference base.py:126-132)
    for a, b in cfg.sim_embed:
        ea, eb = sim_pool[a], sim_pool[b]
        inner = jnp.sum(ea * eb, axis=1, keepdims=True)
        norms = jnp.linalg.norm(ea, axis=1) * jnp.linalg.norm(eb, axis=1)
        cosine = inner / jnp.maximum(norms[:, None], 1e-12)
        diff = jnp.abs(ea - eb)
        out = jnp.concatenate([out, inner, cosine, diff, diff * diff], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Behavior sequences -> interest states (reference generate_data + trans_core)
# ---------------------------------------------------------------------------


def seq_input_dim(cfg: DMTConfig, group_idx: int) -> int:
    spec_of = {s.feature: s for s in cfg.embeddings}
    return sum(spec_of[u].dim for u, _ in cfg.attention_pairs[group_idx])


def ts_dim_of(cfg: DMTConfig, group_idx: int) -> int:
    if not cfg.is_use_seq_ts or group_idx >= len(cfg.attention_ts):
        return 0
    spec_of = {s.feature: s for s in cfg.embeddings}
    spec = spec_of.get(cfg.attention_ts[group_idx])
    return spec.dim if spec else 0


def interest_dim(cfg: DMTConfig) -> int:
    tc = cfg.transformer
    per = tc.d_model
    if tc.is_trans_out_concat_item and not tc.is_trans_out_by_mlp:
        per = tc.d_model + (tc.d_model if tc.is_trans_input_by_mlp
                            else seq_input_dim(cfg, 0))
    return per * len(cfg.attention_pairs)


def sequences_init(rng, cfg: DMTConfig, dtype=jnp.float32) -> Params:
    tc = cfg.transformer
    keys = _split(rng, max(1, len(cfg.attention_pairs)))
    return {
        f"seq{i}": transformer_init(
            keys[i], tc, ts_dim=ts_dim_of(cfg, i),
            in_dim=seq_input_dim(cfg, i), dtype=dtype)
        for i in range(len(cfg.attention_pairs))
    }


def zero_pad_rows(ids, emb):
    """Zero the rows whose id is 0 (padding / 'unknow') — the sequence-path
    zero_pad semantics (nn/embedding.seq_lookup)."""
    return jnp.where((ids > 0)[..., None], emb, 0.0)


def sequence_interest(params: Params, emb: Params, batch: dict,
                      cfg: DMTConfig, *, train: bool,
                      rng: Optional[jax.Array] = None,
                      engine: EmbeddingEngine = DENSE_ENGINE,
                      dtype=None, return_cache: bool = False):
    """Concat of per-sequence user interest states [B, n_seq * d].

    Mirrors generate_data (mask/lens from the sequence feature, concat of
    per-id-space embeddings with zero_pad, ts embedding) + trans_core
    (reference mmoe_transformer_unbias.py:130-223).

    With ``return_cache`` also returns {feature: raw [B, L, D] grid} of the
    un-zero-padded gathers, so the pooled combiner can reuse them (each
    big-table row then costs ONE gather + ONE backward scatter per step
    instead of two; the scatter is the dominant TPU cost at 0.13us/row).
    """
    spec_of = {s.feature: s for s in cfg.embeddings}
    tc = cfg.transformer
    states = []
    cache: dict[str, jnp.ndarray] = {}
    keys = _split(rng, len(cfg.attention_pairs)) if rng is not None \
        else [None] * len(cfg.attention_pairs)
    for gi, group in enumerate(cfg.attention_pairs):
        first_user = group[0][0]
        lens = batch[first_user + LEN]
        wts = feature_wts(batch, first_user, batch[first_user + IDS])
        mask = presence_mask(wts, lens)

        seq_parts, tar_parts = [], []
        for user_feat, item_feat in group:
            uspec = spec_of[user_feat]
            ispec = spec_of[item_feat]
            uids = batch[user_feat + IDS]
            raw_u = engine.seq(uspec.table, emb[uspec.table], uids, False)
            cache[user_feat] = raw_u
            seq_parts.append(zero_pad_rows(uids, raw_u)
                             if cfg.zero_pad else raw_u)
            iids = batch[item_feat + IDS]
            raw_i = engine.seq(ispec.table, emb[ispec.table], iids, False)
            cache[item_feat] = raw_i
            tar = zero_pad_rows(iids, raw_i) if cfg.zero_pad else raw_i
            tar_parts.append(tar[:, 0, :])  # single-id item feature
        seq_emb = jnp.concatenate(seq_parts, axis=-1)      # [B, L, 80]
        tar_emb = jnp.concatenate(tar_parts, axis=-1)      # [B, 80]
        if dtype is not None:
            seq_emb = seq_emb.astype(dtype)
            tar_emb = tar_emb.astype(dtype)

        ts_emb = None
        if cfg.is_use_seq_ts and gi < len(cfg.attention_ts):
            ts_feat = cfg.attention_ts[gi]
            tspec = spec_of.get(ts_feat)
            if tspec is not None:
                buckets = ts_bucketize(batch[ts_feat + IDS], tspec.id_size)
                raw_ts = engine.seq(tspec.table, emb[tspec.table], buckets,
                                    False)
                cache[ts_feat] = raw_ts
                ts_emb = (zero_pad_rows(buckets, raw_ts)
                          if cfg.zero_pad else raw_ts)
                if dtype is not None:
                    ts_emb = ts_emb.astype(dtype)

        p = params[f"seq{gi}"]
        if tc.is_trans_input_by_mlp:
            seq_emb = dense_apply(p["in_seq"], seq_emb)
            tar_in = dense_apply(p["in_tar"], tar_emb)
        else:
            tar_in = tar_emb
        state = encode_decode(
            p, tc, seq_emb=seq_emb, seq_mask=mask, tar_emb=tar_in,
            ts_emb=ts_emb, train=train, rng=keys[gi],
            mesh=getattr(engine, "mesh", None))
        # trans_core output composition (reference *_transformer*.py)
        if tc.is_trans_out_concat_item:
            state = jnp.concatenate([state, tar_in], axis=-1)
            if tc.is_trans_out_by_mlp:
                state = dense_apply(p["out_proj"], state)
        states.append(state)
    interest = jnp.concatenate(states, axis=-1)
    if return_cache:
        return interest, cache
    return interest


# ---------------------------------------------------------------------------
# MMoE (reference mmoe.py:53-118 / mmoe_transformer_unbias.py:63-126)
# ---------------------------------------------------------------------------


def mmoe_init(rng, in_dim: int, cfg: DMTConfig, num_tasks: int = 2,
              dtype=jnp.float32) -> tuple[Params, State]:
    keys = _split(rng, cfg.num_experts + num_tasks)
    params: Params = {"experts": [], "gates": []}
    state: State = {"experts": []}
    for e in range(cfg.num_experts):
        p, st = mlp_init(keys[e], in_dim, cfg.hidden_units_bottom, None,
                         is_bn=cfg.is_bn, dtype=dtype)
        params["experts"].append(p)
        state["experts"].append(st)
    for t in range(num_tasks):
        params["gates"].append(dense_init(
            keys[cfg.num_experts + t], in_dim, cfg.num_experts,
            bias_init=0.1, dtype=dtype))
    if not cfg.is_bn:
        state = {}
    return params, state


def _mmoe_experts_stacked(params: Params, x: jnp.ndarray, cfg: DMTConfig,
                          *, train: bool, rng) -> jnp.ndarray:
    """All experts in batched matmuls -> [B, H, E].

    Math-identical to the per-expert loop (each output column/batch slice
    is an independent dot product), but the backward's input cotangent is
    ONE [B, in] matmul instead of num_experts accumulated ones: device
    traces showed the per-expert dx chain writing E+T separate
    [4096, 1199] bf16 buffers + an add_any reduction chain (~5.5 ms/step
    at batch 4096).  Layer 0 concatenates the experts' kernels along the
    output dim; deeper layers run one batched einsum over the expert
    axis, whose dx slices are disjoint (no reduction chain)."""
    from ..nn.layers import dropout_keep
    E = len(params["experts"])
    nlayers = len(cfg.hidden_units_bottom)
    keys = _split(rng, nlayers) if rng is not None else [None] * nlayers
    w0 = jnp.concatenate(
        [p["layer0"]["dense"]["w"] for p in params["experts"]], axis=1)
    b0 = jnp.concatenate(
        [p["layer0"]["dense"]["b"] for p in params["experts"]])
    y = jax.nn.relu(jnp.dot(x, w0.astype(x.dtype)) + b0.astype(x.dtype))
    y = y.reshape(x.shape[0], E, -1)                       # [B, E, H0]

    def maybe_dropout(y, i):
        kp = (cfg.dropout_bottom[i]
              if i < len(cfg.dropout_bottom) else 1.0)
        if cfg.is_dropout and train and kp < 1.0 and keys[i] is not None:
            return dropout_keep(keys[i], y, kp, deterministic=False)
        return y

    y = maybe_dropout(y, 0)
    for i in range(1, nlayers):
        wi = jnp.stack(
            [p[f"layer{i}"]["dense"]["w"] for p in params["experts"]])
        bi = jnp.stack(
            [p[f"layer{i}"]["dense"]["b"] for p in params["experts"]])
        y = jax.nn.relu(jnp.einsum("beh,ehk->bek", y, wi.astype(y.dtype))
                        + bi[None].astype(y.dtype))
        y = maybe_dropout(y, i)
    return y.transpose(0, 2, 1)                            # [B, H, E]


def mmoe_apply(params: Params, state: State, x: jnp.ndarray, cfg: DMTConfig,
               *, train: bool, rng: Optional[jax.Array] = None
               ) -> tuple[list[jnp.ndarray], State]:
    """Per-task mixture outputs [B, hidden_bottom[-1]] x num_tasks."""
    n_exp = len(params["experts"])
    if not cfg.is_bn:
        # stacked fast path (batch-norm state forces the per-expert loop)
        experts = _mmoe_experts_stacked(params, x, cfg, train=train, rng=rng)
        # both task gates in one matmul: the per-gate rank-E dx otherwise
        # writes another full [B, in] cotangent buffer each
        wg = jnp.concatenate([g["w"] for g in params["gates"]], axis=1)
        bg = jnp.concatenate([g["b"] for g in params["gates"]])
        gz = (jnp.dot(x, wg.astype(x.dtype)) + bg.astype(x.dtype)
              ).reshape(x.shape[0], len(params["gates"]), n_exp)
        gates = jax.nn.softmax(gz, axis=-1)                # [B, T, E]
        outs = [jnp.einsum("bhe,be->bh", experts, gates[:, t])
                for t in range(len(params["gates"]))]
        return outs, {}
    keys = _split(rng, n_exp) if rng is not None else [None] * n_exp
    expert_outs, new_state = [], {"experts": []}
    est = state.get("experts", [{}] * n_exp)
    for e, p in enumerate(params["experts"]):
        y, st = mlp_apply(p, est[e], x, keep_probs=cfg.dropout_bottom,
                          train=train, is_bn=cfg.is_bn,
                          is_dropout=cfg.is_dropout, bn_decay=cfg.bn_decay,
                          rng=keys[e])
        expert_outs.append(y)
        new_state["experts"].append(st)
    experts = jnp.stack(expert_outs, axis=-1)             # [B, H, E]
    outs = []
    for gate in params["gates"]:
        g = jax.nn.softmax(dense_apply(gate, x), axis=-1)  # [B, E]
        outs.append(jnp.einsum("bhe,be->bh", experts, g))
    return outs, new_state


def tower_init(rng, in_dim: int, cfg: DMTConfig, dtype=jnp.float32
               ) -> tuple[Params, State]:
    """Task tower: hidden_units_task relu + 1-unit output, bias 0.1
    (reference build_tower, mmoe_transformer_unbias.py:107-126)."""
    return mlp_init(rng, in_dim, cfg.hidden_units_task, cfg.output_units,
                    is_bn=cfg.is_bn, out_bias_init=0.1, dtype=dtype)


def tower_apply(params: Params, state: State, x: jnp.ndarray, cfg: DMTConfig,
                *, train: bool, rng=None) -> tuple[jnp.ndarray, State]:
    return mlp_apply(params, state, x, keep_probs=cfg.dropout_task,
                     train=train, is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                     bn_decay=cfg.bn_decay, rng=rng)


# ---------------------------------------------------------------------------
# Bias Deep Neural Network (reference mmoe_transformer_unbias.py:235-289)
# ---------------------------------------------------------------------------


def bias_combiner_dim(cfg: DMTConfig) -> int:
    return sum(s.dim for s in cfg.embeddings_bias)


def bias_net_init(rng, cfg: DMTConfig, dtype=jnp.float32) -> Params:
    ek, mk = jax.random.split(rng)
    g = glorot_uniform()
    mlp, _ = mlp_init(mk, bias_combiner_dim(cfg), cfg.hidden_units_bias,
                      cfg.output_units, out_bias_init=0.0,
                      hidden_bias_init=0.0, w_init=g, dtype=dtype)
    # bias-net tables deliberately ignore table_bf16_threshold: they are
    # dense-optax managed (never in the lazy plan), exactly the case where
    # bf16 `param += tiny update` flushes small steps — and they are
    # 5-dim/small, so there are no gather bytes worth saving
    return {"emb": collection_init(ek, cfg.embeddings_bias, dtype,
                                   packed=cfg.packed_tables,
                                   pack_rows_threshold=cfg.pack_rows_threshold),
            "mlp": mlp}


def bias_net_apply(params: Params, batch: dict, cfg: DMTConfig, *,
                   train: bool, rng: Optional[jax.Array] = None,
                   engine: EmbeddingEngine = DENSE_ENGINE) -> jnp.ndarray:
    """Bias logit from position/neighbor-exposure embeddings.

    The bias MLP uses tf.layers-style dropout (always active in training,
    rate semantics) unlike the towers' keep-prob dropout — reference
    mmoe_transformer_unbias.py:259-289.
    """
    emb = params["emb"]
    parts = []
    for spec in cfg.embeddings_bias:
        ids = batch[spec.feature + IDS]
        parts.append(engine.pooled(
            "bias:" + spec.table, emb[spec.table], ids,
            feature_wts(batch, spec.feature, ids),
            batch[spec.feature + LEN]))
    y = jnp.concatenate(parts, axis=-1)
    p = params["mlp"]
    n = len(cfg.hidden_units_bias)
    keys = _split(rng, n) if rng is not None else [None] * n
    for i in range(n):
        y = jax.nn.relu(dense_apply(p[f"layer{i}"]["dense"], y))
        if train and keys[i] is not None and i < len(cfg.dropout_rate_bias):
            y = dropout_rate(keys[i], y, cfg.dropout_rate_bias[i],
                             deterministic=False)
    return dense_apply(p["out"]["dense"], y)
