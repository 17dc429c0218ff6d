"""Deep Interest Transformer: masked MHA encoder + target cross-attention.

Re-implements the reference transformer stack
(reference model/net/TransformerModel.py + TransformerModel_util.py) as pure
functions over param pytrees, with batched-head attention shaped for the
MXU ([B, H, T, dh] einsums instead of the reference's concat-split head
trick — numerically identical because ``tf.concat(tf.split(Q, h, 2), 0)``
block i equals the D-slice ``[i*dh:(i+1)*dh]``).

Masking semantics vs the reference (TransformerModel_util.py:11-56):
- key mask: scores at absent key positions -> -2^32+1 before softmax (same);
- query mask: the reference writes -2^32+1 into the *post-softmax* rows of
  absent queries, producing garbage rows that are later key-masked away by
  the decoder's cross-attention; we zero those rows instead — identical
  final logits, finite intermediates (documented deviation).

The fused Pallas attention kernel (ops/attention.py) implements the same
contract and is swapped in on TPU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TransformerConfig
from .layers import (Params, dense_apply, dense_init, dropout_rate,
                     glorot_uniform, layer_norm_apply, layer_norm_init)

NEG_INF = -(2.0 ** 32) + 1  # reference padding_num (TransformerModel_util.py:81)


def sincos_table(maxlen: int, dim: int) -> np.ndarray:
    """Sinusoidal table, reference formula (TransformerModel_util.py:259-265):
    angle(pos, i) = pos / 10000^((i - i%2)/E), sin on even, cos on odd."""
    pos = np.arange(maxlen)[:, None].astype(np.float64)
    i = np.arange(dim)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, (i - i % 2) / dim)
    table = np.zeros((maxlen, dim), np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------


def mha_init(rng, d_model: int, dtype=jnp.float32) -> Params:
    qk, kk, vk, lk = jax.random.split(rng, 4)
    g = glorot_uniform()
    return {
        "q": dense_init(qk, d_model, d_model, w_init=g, bias_init=0.0, dtype=dtype),
        "k": dense_init(kk, d_model, d_model, w_init=g, bias_init=0.0, dtype=dtype),
        "v": dense_init(vk, d_model, d_model, w_init=g, bias_init=0.0, dtype=dtype),
        "ln": layer_norm_init(lk, d_model, dtype),
    }


def attention_core(q, k, v, q_mask, k_mask, num_heads: int, *,
                   dropout: float = 0.0, train: bool = False,
                   rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Scaled-dot-product attention over pre-projected q/k/v.

    q: [B, Tq, D]; k, v: [B, Tk, D]; masks: [B, T] (1=present).
    Returns [B, Tq, D].  Pure-jnp reference path; the Pallas kernel in
    ops/attention.py matches this function bit-for-bit on valid rows.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // num_heads
    qh = q.reshape(B, Tq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, num_heads, dh).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
    scores = jnp.where(k_mask[:, None, None, :] > 0, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * q_mask[:, None, :, None].astype(probs.dtype)
    if train and dropout > 0.0 and rng is not None:
        probs = dropout_rate(rng, probs, dropout, deterministic=False)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def _use_fused_kernel(train: bool, dropout: float, rng) -> bool:
    """Pallas attention is opt-in (DMT_ENABLE_PALLAS=1): measured on TPU
    v5e, the per-example-grid kernel wins standalone (1.7 vs 2.0 ms at
    B=1024) but loses inside the full train graph (201 vs 142 ms/step at
    B=4096) because it blocks XLA fusion around it; the jnp path is the
    production default until the kernel is re-blocked over larger batch
    tiles.  Dropout-active training always uses the jnp path (randomness
    byte-compatibility)."""
    import os
    if not os.environ.get("DMT_ENABLE_PALLAS"):
        return False
    if train and dropout > 0.0 and rng is not None:
        return False
    return jax.default_backend() == "tpu"


def mha_apply(params: Params, queries, keys, values, q_mask, k_mask, *,
              num_heads: int, dropout: float, train: bool,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Projection -> attention -> residual -> LN
    (reference multihead_attention, TransformerModel_util.py:160-209)."""
    q = dense_apply(params["q"], queries)
    k = dense_apply(params["k"], keys)
    v = dense_apply(params["v"], values)
    if _use_fused_kernel(train, dropout, rng):
        from ..ops.attention import fused_attention
        out = fused_attention(q, k, v, q_mask, k_mask, num_heads)
    else:
        out = attention_core(q, k, v, q_mask, k_mask, num_heads,
                             dropout=dropout, train=train, rng=rng)
    out = out + queries
    return layer_norm_apply(params["ln"], out)


def ff_init(rng, d_model: int, d_ff: int, dtype=jnp.float32) -> Params:
    k1, k2, lk = jax.random.split(rng, 3)
    g = glorot_uniform()
    return {
        "fc1": dense_init(k1, d_model, d_ff, w_init=g, bias_init=0.0, dtype=dtype),
        "fc2": dense_init(k2, d_ff, d_model, w_init=g, bias_init=0.0, dtype=dtype),
        "ln": layer_norm_init(lk, d_model, dtype),
    }


def ff_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Position-wise FFN + residual + LN (TransformerModel_util.py:212-235)."""
    y = jax.nn.relu(dense_apply(params["fc1"], x))
    y = dense_apply(params["fc2"], y)
    return layer_norm_apply(params["ln"], y + x)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


def transformer_init(rng, tc: TransformerConfig, *, ts_dim: int = 0,
                     in_dim: int = 0, dtype=jnp.float32) -> Params:
    """Params for one behavior-sequence transformer."""
    n_keys = 4 + tc.num_blocks_encode * 2 + tc.num_blocks_decode * 2
    keys = list(jax.random.split(rng, n_keys))
    params: Params = {}
    g = glorot_uniform()
    if tc.position_encoding_method == "position_learn":
        params["pos_learn"] = g(keys.pop(), (tc.maxlen_k, tc.d_model), dtype)
    if tc.position_encoding_method in ("time_add", "time_concat") and ts_dim:
        src = ts_dim if tc.position_encoding_method == "time_add" else tc.d_model + ts_dim
        params["ts_proj"] = dense_init(keys.pop(), src, tc.d_model,
                                       w_init=g, bias_init=0.0, dtype=dtype)
    if tc.is_trans_input_by_mlp and in_dim:
        params["in_seq"] = dense_init(keys.pop(), in_dim, tc.d_model,
                                      w_init=g, bias_init=0.0, dtype=dtype)
        params["in_tar"] = dense_init(keys.pop(), in_dim, tc.d_model,
                                      w_init=g, bias_init=0.0, dtype=dtype)
    if tc.is_trans_out_concat_item and tc.is_trans_out_by_mlp:
        out_in = tc.d_model + (tc.d_model if tc.is_trans_input_by_mlp or not in_dim else in_dim)
        params["out_proj"] = dense_init(keys.pop(), out_in, tc.d_model,
                                        w_init=g, bias_init=0.0, dtype=dtype)
    params["enc"] = [
        {"mha": mha_init(keys.pop(), tc.d_model, dtype),
         "ff": ff_init(keys.pop(), tc.d_model, tc.d_ff, dtype)}
        for _ in range(tc.num_blocks_encode)
    ]
    params["dec"] = [
        {"mha": mha_init(keys.pop(), tc.d_model, dtype),
         "ff": ff_init(keys.pop(), tc.d_model, tc.d_ff, dtype)}
        for _ in range(tc.num_blocks_decode)
    ]
    return params


def _position_encode(params: Params, tc: TransformerConfig, seq: jnp.ndarray,
                     ts_emb: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reference TransformerModel.position_encode (TransformerModel.py:61-82)."""
    T = seq.shape[1]
    method = tc.position_encoding_method
    if method == "position_sin_cos":
        table = jnp.asarray(sincos_table(tc.maxlen_k, tc.d_model), seq.dtype)
        seq = seq + table[:T][None, :, :]
    elif method == "position_learn":
        seq = seq + params["pos_learn"][:T][None, :, :].astype(seq.dtype)
    elif method == "time_add" and ts_emb is not None and "ts_proj" in params:
        seq = seq + dense_apply(params["ts_proj"], ts_emb)
    elif method == "time_concat" and ts_emb is not None and "ts_proj" in params:
        seq = dense_apply(params["ts_proj"],
                          jnp.concatenate([seq, ts_emb], axis=-1))
    return seq


def _use_fused_block(params: Params, tc: TransformerConfig, mesh) -> bool:
    """The whole-block Pallas kernel (ops/block.py) replaces the per-op jnp
    path for the production 1-enc/1-dec shape.  Auto-on on TPU; force with
    DMT_FUSED_BLOCK=1 (interpret off-TPU) or off with DMT_FUSED_BLOCK=0.
    In-kernel hardware-PRNG dropout replaces the host threefry streams — a
    documented randomness-stream deviation (same tf-dropout semantics)."""
    import os
    flag = os.environ.get("DMT_FUSED_BLOCK", "")
    if flag == "0":
        return False
    if len(params["enc"]) != 1 or len(params["dec"]) != 1:
        return False
    if flag == "1":
        return True
    # multi-device needs the mesh: GSPMD has no partitioning rule for the
    # Mosaic custom call, so the op runs under shard_map (batch over the
    # data axis) — see ops/block.fused_encode_decode
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or mesh is not None


def encode_decode(params: Params, tc: TransformerConfig, *,
                  seq_emb: jnp.ndarray,      # [B, Tk, d_model]
                  seq_mask: jnp.ndarray,     # [B, Tk] 1=present
                  tar_emb: jnp.ndarray,      # [B, d_model]
                  ts_emb: Optional[jnp.ndarray] = None,  # [B, Tk, ts_dim]
                  train: bool = False,
                  rng: Optional[jax.Array] = None,
                  mesh=None) -> jnp.ndarray:
    """Full encode->decode for one behavior sequence; returns the user
    interest state [B, d_model] (reference TransformerModel.py:51-59)."""
    scale = math.sqrt(tc.d_model)
    if _use_fused_block(params, tc, mesh):
        from ..ops.block import fused_encode_decode
        enc0 = _position_encode(params, tc, seq_emb * scale, ts_emb)
        dec0 = tar_emb * scale
        if tc.is_decoder_add_pos_emb:
            table = jnp.asarray(sincos_table(tc.maxlen_q, tc.d_model),
                                dec0.dtype)
            dec0 = dec0 + table[0][None, :]
        interpret = jax.default_backend() != "tpu"
        if interpret and train and tc.dropout_rate > 0 and rng is not None:
            # plain HLO interpret can't lower the TPU PRNG primitives;
            # the Mosaic interpreter can (its prng_random_bits is all
            # zeros off-TPU, i.e. dropout keeps everything — fine for
            # compile/CI validation, exact on real TPUs)
            from jax.experimental.pallas import tpu as pltpu
            interpret = pltpu.InterpretParams()
        return fused_encode_decode(
            params["enc"][0], params["dec"][0], enc_in=enc0, dec_in=dec0,
            seq_mask=seq_mask, num_heads=tc.num_heads,
            dropout=tc.dropout_rate, train=train, rng=rng,
            interpret=interpret,
            mesh=mesh if jax.device_count() > 1 else None)
    n_rng = 2 + len(params["enc"]) + len(params["dec"])
    keys = list(jax.random.split(rng, n_rng)) if rng is not None else [None] * n_rng

    # ---- encoder (TransformerModel.py:84-123) ----
    enc = seq_emb * scale
    enc = _position_encode(params, tc, enc, ts_emb)
    if train and tc.dropout_rate > 0 and keys[0] is not None:
        enc = dropout_rate(keys[0], enc, tc.dropout_rate, deterministic=False)
    for i, block in enumerate(params["enc"]):
        enc = mha_apply(block["mha"], enc, enc, enc, seq_mask, seq_mask,
                        num_heads=tc.num_heads, dropout=tc.dropout_rate,
                        train=train, rng=keys[2 + i])
        enc = ff_apply(block["ff"], enc)

    # ---- decoder: length-1 target query (TransformerModel.py:125-171) ----
    dec = tar_emb[:, None, :] * scale
    if tc.is_decoder_add_pos_emb:
        table = jnp.asarray(sincos_table(tc.maxlen_q, tc.d_model), dec.dtype)
        dec = dec + table[:1][None, :, :]
    if train and tc.dropout_rate > 0 and keys[1] is not None:
        dec = dropout_rate(keys[1], dec, tc.dropout_rate, deterministic=False)
    q_mask = jnp.ones((dec.shape[0], 1), dec.dtype)
    for i, block in enumerate(params["dec"]):
        dec = mha_apply(block["mha"], dec, enc, enc, q_mask, seq_mask,
                        num_heads=tc.num_heads, dropout=tc.dropout_rate,
                        train=train, rng=keys[2 + len(params["enc"]) + i])
        dec = ff_apply(block["ff"], dec)
    return dec[:, 0, :]
