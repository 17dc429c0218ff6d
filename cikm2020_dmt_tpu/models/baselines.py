"""Paper-baseline models: LR, Wide&Deep, DCN, DIN, DIEN.

The reference dispatch table names these model_types
(reference model/inference_mlp.py:27-54) but ships no sources for them —
``din.py``/``dien.py`` exist only as orphaned bytecode (SURVEY.md §2.4.1).
They are the comparison baselines of the DMT paper (Table 1), implemented
here from the published papers with this framework's components:

- lr    logistic regression over [dense ∥ pooled embeddings]
- wnd   Wide & Deep (Cheng et al. 2016): linear wide path on dense
        features + deep MLP on the combiner
- dcn   Deep & Cross (Wang et al. 2017): explicit cross layers
        x_{l+1} = x0 * (x_l . w_l) + b_l + x_l, parallel deep MLP
- din   Deep Interest Network (Zhou et al. 2018): per-behavior target
        attention with the [e, t, e*t, e-t] scoring MLP, masked softmax,
        weighted-sum interest
- dien  Deep Interest Evolution Network (Zhou et al. 2019): GRU interest
        extraction + AUGRU (attention-update-gate GRU) evolution, final
        hidden state as the interest vector

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


def _group_embeddings(emb, batch, cfg, gi, engine):
    """(seq_emb [B,L,D], tar_emb [B,D], mask [B,L]) for behavior group gi,
    same lookup rules as the transformer path (components.sequence_interest)."""
    spec_of = {s.feature: s for s in cfg.embeddings}
    group = cfg.attention_pairs[gi]
    first_user = group[0][0]
    mask = presence_mask(
        feature_wts(batch, first_user, batch[first_user + IDS]),
        batch[first_user + LEN])
    seq_parts, tar_parts = [], []
    for user_feat, item_feat in group:
        uspec, ispec = spec_of[user_feat], spec_of[item_feat]
        seq_parts.append(engine.seq(uspec.table, emb[uspec.table],
                                    batch[user_feat + IDS], cfg.zero_pad))
        tar = engine.seq(ispec.table, emb[ispec.table],
                         batch[item_feat + IDS], cfg.zero_pad)
        tar_parts.append(tar[:, 0, :])
    return (jnp.concatenate(seq_parts, -1), jnp.concatenate(tar_parts, -1),
            mask)


def din_attention_init(rng, dim: int, hidden=(64, 32), dtype=jnp.float32) -> Params:
    """Scoring MLP over [e, t, e*t, e-t] -> 1 (DIN local activation unit)."""
    params, _ = mlp_init(rng, 4 * dim, hidden, 1, out_bias_init=0.0,
                         w_init=glorot_uniform(), dtype=dtype)
    return params


def din_attention_apply(params: Params, seq, tar, mask) -> jnp.ndarray:
    """Masked-softmax target attention -> weighted sum [B, D]."""
    B, L, D = seq.shape
    t = jnp.broadcast_to(tar[:, None, :], (B, L, D))
    feats = jnp.concatenate([seq, t, seq * t, seq - t], axis=-1)
    scores, _ = mlp_apply(params, {}, feats.reshape(B * L, 4 * D), train=False)
    scores = scores.reshape(B, L)
    scores = jnp.where(mask > 0, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1) * mask.astype(scores.dtype)
    return jnp.einsum("bl,bld->bd", w, seq)


class DIN(BaseModel):
    """Deep Interest Network (reference model_type 'din')."""

    name = "din"

    def _input_dim(self):
        d = combiner_dim(self.cfg, skip_seq=True)
        for gi in range(len(self.cfg.attention_pairs)):
            d += 2 * seq_input_dim(self.cfg, gi)  # interest + target emb
        return d

    def init(self, rng):
        from ..nn.embedding import collection_init
        n = len(self.cfg.attention_pairs)
        keys = jax.random.split(rng, n + 2)
        params = {"emb": self._emb_init(keys[0], self.cfg.embeddings)}
        for gi in range(n):
            params[f"attn{gi}"] = din_attention_init(
                keys[1 + gi], seq_input_dim(self.cfg, gi), dtype=self.dtype)
        mlp, st = mlp_init(keys[-1], self._input_dim(), self.cfg.hidden_units,
                           self.cfg.output_units, is_bn=self.cfg.is_bn,
                           out_bias_init=0.0, dtype=self.dtype)
        params["mlp"] = mlp
        return params, ({"mlp": st} if st else {})

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        parts = [self._cast(embedding_combiner(params["emb"], batch, cfg,
                                               skip_seq=True,
                                               engine=self.engine))]
        for gi in range(len(cfg.attention_pairs)):
            seq, tar, mask = _group_embeddings(params["emb"], batch, cfg, gi,
                                               self.engine)
            seq, tar = self._cast(seq), self._cast(tar)
            parts.append(din_attention_apply(params[f"attn{gi}"], seq, tar,
                                             mask))
            parts.append(tar)
        x = jnp.concatenate(parts, axis=-1)
        y, st = mlp_apply(params["mlp"], state.get("mlp", {}), x,
                          keep_probs=cfg.dropout, train=train,
                          is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                          bn_decay=cfg.bn_decay, rng=rng)
        return self._f32(y), ({"mlp": st} if st else {})


# ---------------------------------------------------------------------------
# DIEN: GRU + AUGRU via lax.scan
# ---------------------------------------------------------------------------


def gru_init(rng, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    g = glorot_uniform()
    keys = jax.random.split(rng, 3)
    def gate(k):
        return {"wx": g(k, (in_dim, hidden), dtype),
                "wh": g(jax.random.fold_in(k, 1), (hidden, hidden), dtype),
                "b": jnp.zeros((hidden,), dtype)}
    return {"r": gate(keys[0]), "z": gate(keys[1]), "h": gate(keys[2])}


def _gru_cell(params, h, x, update_scale=None):
    def gate(p, act, hh):
        return act(jnp.dot(x, p["wx"].astype(x.dtype))
                   + jnp.dot(hh, p["wh"].astype(x.dtype))
                   + p["b"].astype(x.dtype))
    r = gate(params["r"], jax.nn.sigmoid, h)
    z = gate(params["z"], jax.nn.sigmoid, h)
    hbar = gate(params["h"], jnp.tanh, r * h)
    if update_scale is not None:  # AUGRU: attention scales the update gate
        z = z * update_scale[:, None]
    return (1.0 - z) * h + z * hbar


def gru_scan(params, seq, mask, update_scales=None):
    """Run (AU)GRU over [B, L, D]; returns final hidden [B, H] and all
    states [B, L, H]; padded steps hold the previous state."""
    B, L, D = seq.shape
    H = params["h"]["wh"].shape[0]
    h0 = jnp.zeros((B, H), seq.dtype)

    def step(h, inputs):
        if update_scales is None:
            x, m = inputs
            h_new = _gru_cell(params, h, x)
        else:
            x, m, a = inputs
            h_new = _gru_cell(params, h, x, update_scale=a)
        h = jnp.where(m[:, None] > 0, h_new, h)
        return h, h

    xs = (seq.transpose(1, 0, 2), mask.T)
    if update_scales is not None:
        xs = xs + (update_scales.T,)
    h_final, states = jax.lax.scan(step, h0, xs)
    return h_final, states.transpose(1, 0, 2)


class DIEN(BaseModel):
    """Deep Interest Evolution Network (reference model_type 'dien')."""

    name = "dien"

    def _input_dim(self):
        d = combiner_dim(self.cfg, skip_seq=True)
        for gi in range(len(self.cfg.attention_pairs)):
            d += seq_input_dim(self.cfg, gi) * 2  # final AUGRU state + target
        return d

    def init(self, rng):
        from ..nn.embedding import collection_init
        n = len(self.cfg.attention_pairs)
        keys = jax.random.split(rng, 3 * n + 2)
        params = {"emb": self._emb_init(keys[0], self.cfg.embeddings)}
        for gi in range(n):
            d = seq_input_dim(self.cfg, gi)
            params[f"gru{gi}"] = gru_init(keys[1 + 3 * gi], d, d, self.dtype)
            params[f"augru{gi}"] = gru_init(keys[2 + 3 * gi], d, d, self.dtype)
            params[f"attn{gi}"] = {
                "w": glorot_uniform()(keys[3 + 3 * gi], (d, d), self.dtype)}
        mlp, st = mlp_init(keys[-1], self._input_dim(), self.cfg.hidden_units,
                           self.cfg.output_units, is_bn=self.cfg.is_bn,
                           out_bias_init=0.0, dtype=self.dtype)
        params["mlp"] = mlp
        return params, ({"mlp": st} if st else {})

    def apply(self, params, state, batch, *, train, rng=None, is_predict=False):
        cfg = self.cfg
        parts = [self._cast(embedding_combiner(params["emb"], batch, cfg,
                                               skip_seq=True,
                                               engine=self.engine))]
        for gi in range(len(cfg.attention_pairs)):
            seq, tar, mask = _group_embeddings(params["emb"], batch, cfg, gi,
                                               self.engine)
            seq, tar = self._cast(seq), self._cast(tar)
            # interest extraction
            _, states = gru_scan(params[f"gru{gi}"], seq, mask)
            # attention scores: softmax(h W t)
            w = params[f"attn{gi}"]["w"].astype(seq.dtype)
            scores = jnp.einsum("blh,hd,bd->bl", states, w, tar)
            scores = jnp.where(mask > 0, scores, NEG_INF)
            alphas = jax.nn.softmax(scores, axis=-1) * mask.astype(seq.dtype)
            # interest evolution
            h_final, _ = gru_scan(params[f"augru{gi}"], states, mask,
                                  update_scales=alphas)
            parts.append(h_final)
            parts.append(tar)
        x = jnp.concatenate(parts, axis=-1)
        y, st = mlp_apply(params["mlp"], state.get("mlp", {}), x,
                          keep_probs=cfg.dropout, train=train,
                          is_bn=cfg.is_bn, is_dropout=cfg.is_dropout,
                          bn_decay=cfg.bn_decay, rng=rng)
        return self._f32(y), ({"mlp": st} if st else {})
