"""Baseline models: LR, Wide&Deep, DCN, DIN, DIEN.

The reference dispatch table names these model_types
(reference model/inference_mlp.py:27-54).  lr/wnd/dcn ship no reference
source or bytecode at all and are implemented from the published papers;
din/dien exist as orphaned bytecode (model/net/__pycache__/
{din,dien,dien_utils,dien_rnn}.cpython-36.pyc) and are reconstructed
BYTECODE-EXACT from a 3.6 wordcode disassembly (SURVEY.md §2.4.1):

- lr    logistic regression over [dense ∥ pooled embeddings]
- wnd   Wide & Deep (Cheng et al. 2016): linear wide path on dense
        features + deep MLP on the combiner
- dcn   Deep & Cross (Wang et al. 2017): explicit cross layers
        x_{l+1} = x0 * (x_l . w_l) + b_l + x_l, parallel deep MLP
- din   per-group scoring MLP 40/20/1 (sigmoid/sigmoid/identity, dense_
        layer bias 0.1) over [u, t, u-t, u*t], scores scaled 1/sqrt(D)
        and injected RAW (no softmax) as sum-combiner weights for the
        attention-pair user features (din.pyc embedding_din_weight_calc)
- dien  GRU(16) interest extraction -> masked-softmax MLP attention
        (prelu query proj, 80/40/1) -> VecAttGRU(16) evolution
        (dien.pyc dien_core, dien_utils.pyc attention/VecAttGRUCell)

All are single-logit CTR models (the reference's baseline contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.pipeline import IDS, LEN
from ..nn.embedding import presence_mask
from ..nn.layers import (Params, dense_apply, dense_init,
                         glorot_uniform, mlp_apply, mlp_init)
from .components import (combiner_dim, embedding_combiner, feature_wts,
                         seq_input_dim)
from .zoo import BaseModel

NEG_INF = -(2.0 ** 32) + 1


class LR(BaseModel):
    """Logistic regression (reference model_type 'lr')."""

    name = "lr"

    def init(self, rng):
        from ..nn.embedding import collection_init
        ek, dk = jax.random.split(rng)
        params = {"emb": self._emb_init(ek, self.cfg.embeddings),
                  "linear": dense_init(dk, combiner_dim(self.cfg), 1,
                                       bias_init=0.0, dtype=self.dtype)}
        return params, {}

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        x = self._cast(embedding_combiner(params["emb"], batch, self.cfg,
                                          engine=self.engine))
        return self._f32(dense_apply(params["linear"], x)), {}


class WideAndDeep(BaseModel):
    """Wide & Deep (reference model_type 'wnd')."""

    name = "wnd"

    def init(self, rng):
        from ..nn.embedding import collection_init
        ek, wk, dk = jax.random.split(rng, 3)
        deep, st = mlp_init(dk, combiner_dim(self.cfg), self.cfg.hidden_units,
                            self.cfg.output_units, is_bn=self.cfg.is_bn,
                            out_bias_init=0.0, dtype=self.dtype)
        params = {
            "emb": self._emb_init(ek, self.cfg.embeddings),
            "wide": dense_init(wk, self.cfg.feature_dimension, 1,
                               bias_init=0.0, dtype=self.dtype),
            "deep": deep,
        }
        return params, ({"deep": st} if st else {})

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        x = self._cast(embedding_combiner(params["emb"], batch, cfg,
                                          engine=self.engine))
        deep, st = mlp_apply(params["deep"], state.get("deep", {}), x,
                             keep_probs=cfg.dropout, train=train,
                             is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                             bn_decay=cfg.bn_decay, rng=rng)
        wide = dense_apply(params["wide"], self._cast(batch["features"]))
        return self._f32(deep + wide), ({"deep": st} if st else {})


class DCN(BaseModel):
    """Deep & Cross Network (reference model_type 'dcn')."""

    name = "dcn"
    num_cross_layers = 3

    def init(self, rng):
        from ..nn.embedding import collection_init
        dim = combiner_dim(self.cfg)
        keys = jax.random.split(rng, 3 + self.num_cross_layers)
        deep, st = mlp_init(keys[1], dim, self.cfg.hidden_units, None,
                            is_bn=self.cfg.is_bn, dtype=self.dtype)
        g = glorot_uniform()
        params = {
            "emb": self._emb_init(keys[0], self.cfg.embeddings),
            "deep": deep,
            "cross": [
                {"w": g(keys[2 + l], (dim, 1), self.dtype),
                 "b": jnp.zeros((dim,), self.dtype)}
                for l in range(self.num_cross_layers)
            ],
            "out": dense_init(keys[-1], dim + self.cfg.hidden_units[-1], 1,
                              bias_init=0.0, dtype=self.dtype),
        }
        return params, ({"deep": st} if st else {})

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        x0 = self._cast(embedding_combiner(params["emb"], batch, cfg,
                                           engine=self.engine))
        x = x0
        for layer in params["cross"]:
            xw = jnp.dot(x, layer["w"].astype(x.dtype))       # [B, 1]
            x = x0 * xw + layer["b"].astype(x.dtype) + x
        deep, st = mlp_apply(params["deep"], state.get("deep", {}), x0,
                             keep_probs=cfg.dropout, train=train,
                             is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                             bn_decay=cfg.bn_decay, rng=rng)
        y = dense_apply(params["out"], jnp.concatenate([x, deep], axis=-1))
        return self._f32(y), ({"deep": st} if st else {})


# ---------------------------------------------------------------------------
# DIN / DIEN sequence machinery
# ---------------------------------------------------------------------------


def _group_embeddings(emb, batch, cfg, gi, engine, cache=None):
    """(seq_emb [B,L,D], tar_emb [B,D], mask [B,L]) for behavior group gi,
    same lookup rules as the transformer path (components.sequence_interest).

    ``cache`` (optional dict) collects the RAW un-zero-padded [B, L, D]
    grids per feature so the pooled combiner can reuse them via its
    seq_cache path — one gather + one backward per big-table row per step
    instead of two (same mechanism as sequence_interest's return_cache)."""
    from .components import zero_pad_rows
    spec_of = {s.feature: s for s in cfg.embeddings}
    group = cfg.attention_pairs[gi]
    first_user = group[0][0]
    mask = presence_mask(
        feature_wts(batch, first_user, batch[first_user + IDS]),
        batch[first_user + LEN])
    seq_parts, tar_parts = [], []
    for user_feat, item_feat in group:
        uspec, ispec = spec_of[user_feat], spec_of[item_feat]
        uids = batch[user_feat + IDS]
        raw_u = engine.seq(uspec.table, emb[uspec.table], uids, False)
        if cache is not None:
            cache[user_feat] = raw_u
        seq_parts.append(zero_pad_rows(uids, raw_u)
                         if cfg.zero_pad else raw_u)
        iids = batch[item_feat + IDS]
        raw_i = engine.seq(ispec.table, emb[ispec.table], iids, False)
        if cache is not None:
            cache[item_feat] = raw_i
        tar = zero_pad_rows(iids, raw_i) if cfg.zero_pad else raw_i
        tar_parts.append(tar[:, 0, :])
    return (jnp.concatenate(seq_parts, -1), jnp.concatenate(tar_parts, -1),
            mask)


DIN_ATTENTION_UNITS = (40, 20)  # din.pyc: '{0}/attention/layer0' 40, layer1 20


def din_attention_init(rng, dim: int, *, is_bn: bool = False,
                       dtype=jnp.float32):
    """DIN local activation unit: dense_layer stack 4*dim -> 40 -> 20 -> 1
    (din.pyc ``embedding_din_weight_calc``, bytecode-only reference module;
    all three layers use the dense_layer default bias_init=0.1)."""
    from ..nn.layers import dense_layer_init
    keys = jax.random.split(rng, 3)
    sizes = (4 * dim,) + DIN_ATTENTION_UNITS + (1,)
    params: Params = {}
    state = {}
    for i in range(3):
        params[f"layer{i}"], st = dense_layer_init(
            keys[i], sizes[i], sizes[i + 1], bias_init=0.1, is_bn=is_bn,
            dtype=dtype)
        if st:
            state[f"layer{i}"] = st
    return params, state


def din_attention_scores(params: Params, state, seq, tar, *, train,
                         is_bn=False, bn_decay=0.999):
    """Raw (NOT softmaxed) per-element attention scores [B, L].

    Bytecode-exact vs din.pyc ``embedding_din_weight_calc``: features are
    [u, t, u-t, u*t]; layer activations sigmoid/sigmoid/identity; the final
    score is scaled by 1/sqrt(D).  The reference computes scores over the
    sparse present elements only; here the dense [B*L] layout includes
    padded rows (they are dropped later by the pooling presence mask —
    with is_bn=true their contribution to batch-norm statistics is a
    documented deviation).
    """
    from ..nn.layers import dense_layer_apply
    B, L, D = seq.shape
    t = jnp.broadcast_to(tar[:, None, :], (B, L, D))
    feats = jnp.concatenate([seq, t, seq - t, seq * t], axis=-1)
    y = feats.reshape(B * L, 4 * D)
    acts = (jax.nn.sigmoid, jax.nn.sigmoid, lambda v: v)
    new_state = {}
    for i in range(3):
        y, st = dense_layer_apply(
            params[f"layer{i}"], state.get(f"layer{i}", {}), y,
            activation=acts[i], train=train, is_bn=is_bn, is_dropout=False,
            bn_decay=bn_decay)
        if st:
            new_state[f"layer{i}"] = st
    return y.reshape(B, L) / jnp.sqrt(jnp.asarray(D, y.dtype)), new_state


class DIN(BaseModel):
    """Deep Interest Network (reference model_type 'din').

    Reconstructed from bytecode evidence (the reference ships
    model/net/din.py only as __pycache__/din.cpython-36.pyc): raw scaled
    attention scores become the Wts of the attention-pair user features,
    and ALL features pool through the standard combiner with
    combiner_type="sum" (din.pyc ``embedding_din``); there is no separate
    interest/target concat.  The bytecode also defines a ``dice``
    activation that nothing calls (dead code, not reproduced).
    """

    name = "din"

    def _input_dim(self):
        return combiner_dim(self.cfg)

    def init(self, rng):
        from ..nn.embedding import collection_init
        n = len(self.cfg.attention_pairs)
        keys = jax.random.split(rng, n + 2)
        params = {"emb": self._emb_init(keys[0], self.cfg.embeddings)}
        state = {}
        for gi in range(n):
            params[f"attn{gi}"], st = din_attention_init(
                keys[1 + gi], seq_input_dim(self.cfg, gi),
                is_bn=self.cfg.is_bn, dtype=self.dtype)
            if st:
                state[f"attn{gi}"] = st
        mlp, st = mlp_init(keys[-1], self._input_dim(), self.cfg.hidden_units,
                           self.cfg.output_units, is_bn=self.cfg.is_bn,
                           out_bias_init=0.0, dtype=self.dtype)
        params["mlp"] = mlp
        if st:
            state["mlp"] = st
        return params, state

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        new_state = {}
        wts_override = {}
        cache: dict = {}
        for gi in range(len(cfg.attention_pairs)):
            seq, tar, mask = _group_embeddings(params["emb"], batch, cfg, gi,
                                               self.engine, cache=cache)
            seq, tar = self._cast(seq), self._cast(tar)
            y, st = din_attention_scores(
                params[f"attn{gi}"], state.get(f"attn{gi}", {}), seq, tar,
                train=train, is_bn=cfg.is_bn, bn_decay=cfg.bn_decay)
            if st:
                new_state[f"attn{gi}"] = st
            for user_feat, _ in cfg.attention_pairs[gi]:
                wts_override[user_feat] = y.astype(jnp.float32)
        x = self._cast(embedding_combiner(params["emb"], batch, cfg,
                                          engine=self.engine,
                                          combiner="sum",
                                          wts_override=wts_override,
                                          seq_cache=cache))
        y, st = mlp_apply(params["mlp"], state.get("mlp", {}), x,
                          keep_probs=cfg.dropout, train=train,
                          is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                          bn_decay=cfg.bn_decay, rng=rng)
        if st:
            new_state["mlp"] = st
        return self._f32(y), new_state


# ---------------------------------------------------------------------------
# DIEN: GRU + AUGRU via lax.scan
# ---------------------------------------------------------------------------


def gru_init(rng, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    """TF GRUCell layout (one [x∥h] kernel per block): ``gates`` maps to
    2*hidden (r, u) with bias init 1.0, ``cand`` to hidden with bias 0 —
    matching tensorflow.python.ops.rnn_cell.GRUCell and the reference's
    VecAttGRUCell (dien_utils.pyc ``call``: _Linear bias_ones)."""
    g = glorot_uniform()
    k0, k1 = jax.random.split(rng)
    return {
        "gates": {"w": g(k0, (in_dim + hidden, 2 * hidden), dtype),
                  "b": jnp.ones((2 * hidden,), dtype)},
        "cand": {"w": g(k1, (in_dim + hidden, hidden), dtype),
                 "b": jnp.zeros((hidden,), dtype)},
    }


def _gru_cell(params, h, x, att_score=None):
    """TF GRU step: new_h = u*h + (1-u)*c.  With ``att_score`` (AUGRU,
    dien_utils.pyc VecAttGRUCell.call): u <- (1 - att)*u first."""
    xh = jnp.concatenate([x, h], axis=-1)
    ru = jax.nn.sigmoid(jnp.dot(xh, params["gates"]["w"].astype(x.dtype))
                        + params["gates"]["b"].astype(x.dtype))
    r, u = jnp.split(ru, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    c = jnp.tanh(jnp.dot(xrh, params["cand"]["w"].astype(x.dtype))
                 + params["cand"]["b"].astype(x.dtype))
    if att_score is not None:
        u = (1.0 - att_score[:, None]) * u
    return u * h + (1.0 - u) * c


def gru_scan(params, seq, mask, update_scales=None):
    """Run (AU)GRU over [B, L, D]; returns final hidden [B, H] and all
    states [B, L, H]; padded steps hold the previous state."""
    B, L, D = seq.shape
    H = params["cand"]["w"].shape[1]
    h0 = jnp.zeros((B, H), seq.dtype)

    def step(h, inputs):
        if update_scales is None:
            x, m = inputs
            h_new = _gru_cell(params, h, x)
        else:
            x, m, a = inputs
            h_new = _gru_cell(params, h, x, att_score=a)
        h = jnp.where(m[:, None] > 0, h_new, h)
        return h, h

    xs = (seq.transpose(1, 0, 2), mask.T)
    if update_scales is not None:
        xs = xs + (update_scales.T,)
    h_final, states = jax.lax.scan(step, h0, xs)
    return h_final, states.transpose(1, 0, 2)


def prelu_init(dim: int, dtype=jnp.float32) -> Params:
    """dien_utils.pyc ``prelu``: per-channel alpha, init 0.1."""
    return {"alpha": jnp.full((dim,), 0.1, dtype)}


def prelu_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    a = params["alpha"].astype(x.dtype)
    return jnp.maximum(0.0, x) + a * jnp.minimum(0.0, x)


DIEN_ATTENTION_UNITS = (80, 40)  # dien_utils.pyc attention: f1_att/f2_att


def dien_attention_init(rng, q_dim: int, h: int, dtype=jnp.float32):
    """dien_utils.pyc ``attention``: query proj ('f1', tf.layers.dense ->
    glorot kernel, zero bias) + prelu, then the [q, f, q-f, q*f] MLP
    80 sigmoid -> 40 sigmoid -> 1 identity (same dense defaults)."""
    g = glorot_uniform()
    keys = jax.random.split(rng, 4)
    sizes = (4 * h,) + DIEN_ATTENTION_UNITS + (1,)
    params: Params = {
        "f1": dense_init(keys[0], q_dim, h, w_init=g, bias_init=0.0,
                         dtype=dtype),
        "prelu": prelu_init(h, dtype),
    }
    for i in range(3):
        params[f"att{i}"] = dense_init(keys[1 + i], sizes[i], sizes[i + 1],
                                       w_init=g, bias_init=0.0, dtype=dtype)
    return params


def dien_attention_apply(params: Params, query, facts, mask) -> jnp.ndarray:
    """Masked-softmax attention scores [B, L] over GRU states
    (dien_utils.pyc ``attention`` with softmax_stag=1; paddings are
    -(2^32 - 1), and the softmax output is NOT re-masked)."""
    B, L, H = facts.shape
    q = prelu_apply(params["prelu"], dense_apply(params["f1"], query))
    qs = jnp.broadcast_to(q[:, None, :], (B, L, H))
    din_all = jnp.concatenate([qs, facts, qs - facts, qs * facts], axis=-1)
    y = din_all.reshape(B * L, 4 * H)
    y = jax.nn.sigmoid(dense_apply(params["att0"], y))
    y = jax.nn.sigmoid(dense_apply(params["att1"], y))
    y = dense_apply(params["att2"], y).reshape(B, L)
    scores = jnp.where(mask > 0, y, jnp.asarray(NEG_INF, y.dtype))
    return jax.nn.softmax(scores, axis=-1)


class DIEN(BaseModel):
    """Deep Interest Evolution Network (reference model_type 'dien').

    Reconstructed from bytecode evidence (dien.pyc / dien_utils.pyc /
    dien_rnn.pyc): per attention group, GRU(16) interest extraction ->
    MLP attention (query = target embedding, facts = GRU states, softmax)
    -> VecAttGRU(16) evolution whose final state joins the trunk; pooled
    features use the mean combiner and SKIP the attention-pair user
    features (dien.pyc ``embedding_combiner``); the auxiliary loss
    defined in dien_utils.pyc is dead code in the reference (dien_core
    never calls it) and is not reproduced.
    """

    name = "dien"
    hidden_size = 16          # dien.pyc __init__ consts

    def _input_dim(self):
        return (combiner_dim(self.cfg, skip_seq=True)
                + self.hidden_size * len(self.cfg.attention_pairs))

    def init(self, rng):
        from ..nn.embedding import collection_init
        n = len(self.cfg.attention_pairs)
        h = self.hidden_size
        keys = jax.random.split(rng, 3 * n + 2)
        params = {"emb": self._emb_init(keys[0], self.cfg.embeddings)}
        for gi in range(n):
            d = seq_input_dim(self.cfg, gi)
            params[f"gru{gi}"] = gru_init(keys[1 + 3 * gi], d, h, self.dtype)
            params[f"augru{gi}"] = gru_init(keys[2 + 3 * gi], h, h, self.dtype)
            params[f"attn{gi}"] = dien_attention_init(
                keys[3 + 3 * gi], d, h, self.dtype)
        mlp, st = mlp_init(keys[-1], self._input_dim(), self.cfg.hidden_units,
                           self.cfg.output_units, is_bn=self.cfg.is_bn,
                           out_bias_init=0.0, dtype=self.dtype)
        params["mlp"] = mlp
        return params, ({"mlp": st} if st else {})

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        cache: dict = {}
        group_data = []
        for gi in range(len(cfg.attention_pairs)):
            group_data.append(_group_embeddings(params["emb"], batch, cfg,
                                                gi, self.engine, cache=cache))
        # item-feature grids are reused by the pooled combiner (skip_seq
        # drops only the user features)
        parts = [self._cast(embedding_combiner(params["emb"], batch, cfg,
                                               skip_seq=True,
                                               engine=self.engine,
                                               seq_cache=cache))]
        for gi in range(len(cfg.attention_pairs)):
            seq, tar, mask = group_data[gi]
            seq, tar = self._cast(seq), self._cast(tar)
            # interest extraction (rnn_1, GRUCell(16))
            _, states = gru_scan(params[f"gru{gi}"], seq, mask)
            alphas = dien_attention_apply(params[f"attn{gi}"], tar, states,
                                          mask)
            # interest evolution (rnn_2, VecAttGRUCell(16))
            h_final, _ = gru_scan(params[f"augru{gi}"], states, mask,
                                  update_scales=alphas)
            parts.append(h_final)
        x = jnp.concatenate(parts, axis=-1)
        y, st = mlp_apply(params["mlp"], state.get("mlp", {}), x,
                          keep_probs=cfg.dropout, train=train,
                          is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                          bn_decay=cfg.bn_decay, rng=rng)
        return self._f32(y), ({"mlp": st} if st else {})
