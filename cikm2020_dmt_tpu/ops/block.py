"""Fused Deep-Interest-Transformer block — one Pallas kernel for the whole
encoder+decoder stack of one behavior sequence.

Covers, per example, everything between the embedded sequence and the
user-interest state (reference TransformerModel.py:84-171 +
TransformerModel_util.py:160-235):

    input-dropout -> [enc: QKV proj -> masked MHA -> +res -> LN ->
                      FF(relu) -> +res -> LN]
                  -> [dec(1-query): QKV proj -> cross MHA -> +res -> LN ->
                      FF(relu) -> +res -> LN] -> out [B, D]

Why one kernel: round-1 measurement showed an attention-only kernel wins
standalone but LOSES in the full graph (pad copies at the kernel boundary +
broken XLA fusion).  Fusing the whole block keeps the [B, T, D] encoder
state and every intermediate in VMEM — nothing but enc_in/dec_in/out and
the weights cross HBM — and the kernel takes UNPADDED logical shapes
(Mosaic masks the lane padding internally), so there are no boundary pad
copies at all.

Dropout runs in-kernel on the TPU hardware PRNG (pltpu.prng_*), re-seeded
per (site, example) so the recompute backward regenerates bit-identical
masks.  This replaces the host threefry path (~18 ms/step at batch 4096 in
round-1 traces) — a documented randomness-stream deviation; the reference
semantics (tf dropout: keep w.p. 1-rate, scale by 1/(1-rate)) are
preserved.

Backward is full-recompute (flash-style): the custom VJP saves only the
kernel inputs; the backward kernel replays the forward per example and
chains the gradients, accumulating weight gradients in VMEM scratch across
the (forced-sequential) grid and writing them once on the last program.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -(2.0 ** 32) + 1  # reference padding_num (TransformerModel_util.py:81)
LN_EPS = 1e-8

# dropout site ids (seed salt): keep fwd/bwd mask generation aligned
SITE_ENC_IN = 0
SITE_ENC_PROBS = 1
SITE_DEC_IN = 2
SITE_DEC_PROBS = 3


def _uniform01(shape):
    """[0,1) floats from the TPU hardware PRNG (24-bit mantissa path).

    prng_random_bits returns SIGNED int32, making >>8 an arithmetic shift
    whose negative half collapses below any keep_prob (measured on v5e:
    all-keep dropout); Mosaic also can't cast uint32->f32.  Masking the
    shifted value to its low 24 bits equals the logical shift and stays in
    int32."""
    from jax.experimental.pallas import tpu as pltpu
    bits = pltpu.prng_random_bits(shape)
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))


def _drop_mask(shape, rate: float, seed_ref, salt, site: int):
    """The scaled tf-semantics keep-mask for one (example, site).

    Mosaic's prng_set_seed takes at most 2 words, so (salt=example, site)
    fold into one int32: site ids stay < 64 (max is SITE_DEC_PROBS*16 +
    head 7 = 55) and salt*64 fits comfortably in 31 bits at any batch."""
    from jax.experimental.pallas import tpu as pltpu
    keep_prob = 1.0 - rate
    pltpu.prng_seed(seed_ref[0], salt * 64 + site)
    keep = _uniform01(shape) < keep_prob
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


def _ln(x, gamma, beta):
    """Reference ln (TransformerModel_util.py:58-78), f32 statistics."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return gamma * xhat + beta, xhat, jax.lax.rsqrt(var + LN_EPS)


def _ln_bwd(g, xhat, inv, gamma):
    """dL/dx for y = gamma*xhat + beta; also returns (dgamma, dbeta)."""
    d = xhat.shape[-1]
    gg = g * gamma
    dx = (gg - jnp.mean(gg, axis=-1, keepdims=True)
          - xhat * jnp.mean(gg * xhat, axis=-1, keepdims=True)) * inv
    return dx, jnp.sum(g * xhat, axis=0), jnp.sum(g, axis=0)


def _head_mask(num_heads: int, d: int, dtype=jnp.float32):
    """[H, D] lane one-hots selecting each head's slice (built in-kernel)."""
    dh = d // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 0)
    return ((lane // dh) == head).astype(dtype)


def _mha(x_q, x_kv, km, qm, wqkv, bqkv, hm, *, num_heads, scale, rate,
         seed_ref, salt, site, train):
    """Projection + masked MHA with optional probs dropout.

    x_q [Tq, D], x_kv [Tk, D], km [1, Tk], qm [Tq, 1] or None.
    Returns (ctx [Tq, D]).  All f32.
    """
    D = x_q.shape[-1]
    q = jnp.dot(x_q, wqkv[:, 0 * D:1 * D],
                preferred_element_type=jnp.float32) + bqkv[0:1, :]
    k = jnp.dot(x_kv, wqkv[:, 1 * D:2 * D],
                preferred_element_type=jnp.float32) + bqkv[1:2, :]
    v = jnp.dot(x_kv, wqkv[:, 2 * D:3 * D],
                preferred_element_type=jnp.float32) + bqkv[2:3, :]
    ctx = jnp.zeros_like(q)
    H = hm.shape[0]
    for h in range(H):
        mh = hm[h][None, :]
        s = jax.lax.dot_general(q * mh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(km > 0, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if qm is not None:
            p = p * qm
        if train and rate > 0.0:
            p = p * _drop_mask(p.shape, rate, seed_ref, salt,
                               site * 16 + h)
        ctx = ctx + jnp.dot(p, v * mh, preferred_element_type=jnp.float32)
    return ctx


def _block_fwd(x_q, x_kv, km, qm, W, pre, hm, *, num_heads, scale, rate,
               seed_ref, salt, site, train):
    """One transformer block: MHA -> +res -> LN -> FF -> +res -> LN."""
    ctx = _mha(x_q, x_kv, km, qm, W[pre + "wqkv"], W[pre + "bqkv"], hm,
               num_heads=num_heads, scale=scale, rate=rate,
               seed_ref=seed_ref, salt=salt, site=site, train=train)
    a1 = ctx + x_q
    h1, _, _ = _ln(a1, W[pre + "ln1g"], W[pre + "ln1b"])
    f = jnp.maximum(jnp.dot(h1, W[pre + "w1"],
                            preferred_element_type=jnp.float32)
                    + W[pre + "b1"], 0.0)
    f2 = jnp.dot(f, W[pre + "w2"],
                 preferred_element_type=jnp.float32) + W[pre + "b2"]
    h2, _, _ = _ln(f2 + h1, W[pre + "ln2g"], W[pre + "ln2b"])
    return h2


def _weights_dict(vecs, wqkv, w1, b1, w2, pre):
    """vecs rows: bq,bk,bv | ln1g,ln1b | ln2g,ln2b | b2 -> named dict."""
    return {
        pre + "wqkv": wqkv,
        pre + "bqkv": vecs[0:3],
        pre + "ln1g": vecs[3:4],
        pre + "ln1b": vecs[4:5],
        pre + "ln2g": vecs[5:6],
        pre + "ln2b": vecs[6:7],
        pre + "b2": vecs[7:8],
        pre + "w1": w1,
        pre + "b1": b1,
        pre + "w2": w2,
    }


def _make_fwd_kernel(num_heads, scale, rate, train, block, Tk, D):
    from jax.experimental import pallas as pl

    def kernel(seed_ref, enc_ref, dec_ref, km_ref,
               e_wqkv, e_vecs, e_w1, e_b1, e_w2,
               d_wqkv, d_vecs, d_w1, d_b1, d_w2, out_ref):
        hm = _head_mask(num_heads, D)
        W = {}
        W.update(_weights_dict(e_vecs[:].astype(jnp.float32),
                               e_wqkv[:].astype(jnp.float32),
                               e_w1[:].astype(jnp.float32),
                               e_b1[:].astype(jnp.float32),
                               e_w2[:].astype(jnp.float32), "e_"))
        W.update(_weights_dict(d_vecs[:].astype(jnp.float32),
                               d_wqkv[:].astype(jnp.float32),
                               d_w1[:].astype(jnp.float32),
                               d_b1[:].astype(jnp.float32),
                               d_w2[:].astype(jnp.float32), "d_"))
        base = pl.program_id(0) * block

        def one(i, _):
            salt = base + i
            e0 = enc_ref[i].astype(jnp.float32)          # [Tk, D]
            d0 = dec_ref[i].astype(jnp.float32)          # [1, D]
            km = km_ref[i]                               # [1, Tk]
            if train and rate > 0.0:
                e0 = e0 * _drop_mask(e0.shape, rate, seed_ref, salt,
                                     SITE_ENC_IN)
                d0 = d0 * _drop_mask(d0.shape, rate, seed_ref, salt,
                                     SITE_DEC_IN)
            qm_enc = km.reshape(-1, 1)                   # [Tk, 1]
            enc = _block_fwd(e0, e0, km, qm_enc, W, "e_", hm,
                             num_heads=num_heads, scale=scale, rate=rate,
                             seed_ref=seed_ref, salt=salt,
                             site=SITE_ENC_PROBS, train=train)
            dec = _block_fwd(d0, enc, km, None, W, "d_", hm,
                             num_heads=num_heads, scale=scale, rate=rate,
                             seed_ref=seed_ref, salt=salt,
                             site=SITE_DEC_PROBS, train=train)
            out_ref[i] = dec.astype(out_ref.dtype)       # [1, D]
            return 0

        jax.lax.fori_loop(0, block, one, 0)

    return kernel


# ---------------------------------------------------------------------------
# Backward: full recompute + manual chain rule.
# ---------------------------------------------------------------------------


def _mha_fwd_res(x_q, x_kv, km, qm, wqkv, bqkv, hm, *, num_heads, scale,
                 rate, seed_ref, salt, site, train):
    """Forward replay that also returns residuals needed by the backward:
    q, k, v and per-head (p_postdrop, p_presm-mask info recomputed later)."""
    D = x_q.shape[-1]
    q = jnp.dot(x_q, wqkv[:, 0 * D:1 * D],
                preferred_element_type=jnp.float32) + bqkv[0:1, :]
    k = jnp.dot(x_kv, wqkv[:, 1 * D:2 * D],
                preferred_element_type=jnp.float32) + bqkv[1:2, :]
    v = jnp.dot(x_kv, wqkv[:, 2 * D:3 * D],
                preferred_element_type=jnp.float32) + bqkv[2:3, :]
    ctx = jnp.zeros_like(q)
    probs = []
    dmasks = []
    H = hm.shape[0]
    for h in range(H):
        mh = hm[h][None, :]
        s = jax.lax.dot_general(q * mh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(km > 0, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p0 = e / jnp.sum(e, axis=-1, keepdims=True)      # pre query-mask
        p = p0 * qm if qm is not None else p0
        if train and rate > 0.0:
            dm = _drop_mask(p.shape, rate, seed_ref, salt, site * 16 + h)
        else:
            dm = None
        pd = p * dm if dm is not None else p
        ctx = ctx + jnp.dot(pd, v * mh, preferred_element_type=jnp.float32)
        probs.append(p0)
        dmasks.append(dm)
    return ctx, (q, k, v, probs, dmasks)


def _mha_bwd(g_ctx, res, x_q, x_kv, km, qm, wqkv, bqkv, hm, *, num_heads,
             scale):
    """Returns (dx_q, dx_kv, dwqkv, dbqkv)."""
    D = x_q.shape[-1]
    q, k, v, probs, dmasks = res
    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    H = hm.shape[0]
    for h in range(H):
        mh = hm[h][None, :]
        p0 = probs[h]
        dm = dmasks[h]
        pq = p0 * qm if qm is not None else p0
        pd = pq * dm if dm is not None else pq
        # dv: pd^T @ g_ctx, head lanes only
        dv = dv + jax.lax.dot_general(
            pd, g_ctx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * mh
        dpd = jax.lax.dot_general(g_ctx, v * mh, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpq = dpd * dm if dm is not None else dpd
        dp0 = dpq * qm if qm is not None else dpq
        ds = p0 * (dp0 - jnp.sum(dp0 * p0, axis=-1, keepdims=True))
        dq = dq + jnp.dot(ds, k, preferred_element_type=jnp.float32) \
            * scale * mh
        dk = dk + jax.lax.dot_general(
            ds, q * mh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    # back through the projections
    dwq = jax.lax.dot_general(x_q, dq, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwk = jax.lax.dot_general(x_kv, dk, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwv = jax.lax.dot_general(x_kv, dv, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwqkv = jnp.concatenate([dwq, dwk, dwv], axis=1)     # [D, 3D]
    dbqkv = jnp.stack([jnp.sum(dq, axis=0), jnp.sum(dk, axis=0),
                       jnp.sum(dv, axis=0)], axis=0)      # [3, D]
    dx_q = jnp.dot(dq, wqkv[:, 0 * D:1 * D].T,
                   preferred_element_type=jnp.float32)
    dx_kv = (jnp.dot(dk, wqkv[:, 1 * D:2 * D].T,
                     preferred_element_type=jnp.float32)
             + jnp.dot(dv, wqkv[:, 2 * D:3 * D].T,
                       preferred_element_type=jnp.float32))
    return dx_q, dx_kv, dwqkv, dbqkv


def _block_fwd_res(x_q, x_kv, km, qm, W, pre, hm, *, num_heads, scale,
                   rate, seed_ref, salt, site, train):
    ctx, mres = _mha_fwd_res(x_q, x_kv, km, qm, W[pre + "wqkv"],
                             W[pre + "bqkv"], hm, num_heads=num_heads,
                             scale=scale, rate=rate, seed_ref=seed_ref,
                             salt=salt, site=site, train=train)
    a1 = ctx + x_q
    h1, xhat1, inv1 = _ln(a1, W[pre + "ln1g"], W[pre + "ln1b"])
    fpre = jnp.dot(h1, W[pre + "w1"],
                   preferred_element_type=jnp.float32) + W[pre + "b1"]
    f = jnp.maximum(fpre, 0.0)
    f2 = jnp.dot(f, W[pre + "w2"],
                 preferred_element_type=jnp.float32) + W[pre + "b2"]
    h2, xhat2, inv2 = _ln(f2 + h1, W[pre + "ln2g"], W[pre + "ln2b"])
    return h2, (mres, h1, xhat1, inv1, f, fpre, xhat2, inv2)


def _block_bwd(g, res, x_q, x_kv, km, qm, W, pre, hm, acc, *, num_heads,
               scale):
    """Backward through one block.  Returns (dx_q, dx_kv); accumulates
    weight grads into the dict of accumulators ``acc``."""
    mres, h1, xhat1, inv1, f, fpre, xhat2, inv2 = res
    # LN2
    dln2_in, dg2, db2v = _ln_bwd(g, xhat2, inv2, W[pre + "ln2g"])
    acc[pre + "ln2g"] += dg2
    acc[pre + "ln2b"] += db2v
    # f2 = f@w2 + b2 ; ln2 input = f2 + h1
    df = jnp.dot(dln2_in, W[pre + "w2"].T,
                 preferred_element_type=jnp.float32)
    acc[pre + "w2"] += jax.lax.dot_general(
        f, dln2_in, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[pre + "b2"] += jnp.sum(dln2_in, axis=0)
    dfpre = df * (fpre > 0.0)
    dh1 = dln2_in + jnp.dot(dfpre, W[pre + "w1"].T,
                            preferred_element_type=jnp.float32)
    acc[pre + "w1"] += jax.lax.dot_general(
        h1, dfpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[pre + "b1"] += jnp.sum(dfpre, axis=0)
    # LN1
    da1, dg1, db1v = _ln_bwd(dh1, xhat1, inv1, W[pre + "ln1g"])
    acc[pre + "ln1g"] += dg1
    acc[pre + "ln1b"] += db1v
    # a1 = ctx + x_q
    dxq_mha, dxkv, dwqkv, dbqkv = _mha_bwd(
        da1, mres, x_q, x_kv, km, qm, W[pre + "wqkv"], W[pre + "bqkv"], hm,
        num_heads=num_heads, scale=scale)
    acc[pre + "wqkv"] += dwqkv
    acc[pre + "bqkv"] += dbqkv
    return dxq_mha + da1, dxkv


_W_KEYS = ("wqkv", "bqkv", "ln1g", "ln1b", "ln2g", "ln2b", "b2", "w1",
           "b1", "w2")


def _make_bwd_kernel(num_heads, scale, rate, train, block, Tk, D, F,
                     n_programs):
    from jax.experimental import pallas as pl

    def kernel(seed_ref, enc_ref, dec_ref, km_ref,
               e_wqkv, e_vecs, e_w1, e_b1, e_w2,
               d_wqkv, d_vecs, d_w1, d_b1, d_w2, g_ref,
               denc_ref, ddec_ref,
               ge_wqkv, ge_vecs, ge_w1, ge_b1, ge_w2,
               gd_wqkv, gd_vecs, gd_w1, gd_b1, gd_w2,
               a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
               a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2):
        hm = _head_mask(num_heads, D)
        W = {}
        W.update(_weights_dict(e_vecs[:].astype(jnp.float32),
                               e_wqkv[:].astype(jnp.float32),
                               e_w1[:].astype(jnp.float32),
                               e_b1[:].astype(jnp.float32),
                               e_w2[:].astype(jnp.float32), "e_"))
        W.update(_weights_dict(d_vecs[:].astype(jnp.float32),
                               d_wqkv[:].astype(jnp.float32),
                               d_w1[:].astype(jnp.float32),
                               d_b1[:].astype(jnp.float32),
                               d_w2[:].astype(jnp.float32), "d_"))
        pid = pl.program_id(0)
        base = pid * block

        # zero the VMEM weight-grad accumulators on the first program
        @pl.when(pid == 0)
        def _():
            for ref in (a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
                        a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2):
                ref[:] = jnp.zeros_like(ref)

        def one(i, carry):
            (ae_wqkv, ae_vecs, ae_w1, ae_b1, ae_w2,
             ad_wqkv, ad_vecs, ad_w1, ad_b1, ad_w2) = carry
            salt = base + i
            e_in = enc_ref[i].astype(jnp.float32)
            d_in = dec_ref[i].astype(jnp.float32)
            km = km_ref[i]
            g = g_ref[i].astype(jnp.float32)             # [1, D]
            if train and rate > 0.0:
                dm_e = _drop_mask(e_in.shape, rate, seed_ref, salt,
                                  SITE_ENC_IN)
                dm_d = _drop_mask(d_in.shape, rate, seed_ref, salt,
                                  SITE_DEC_IN)
                e0 = e_in * dm_e
                d0 = d_in * dm_d
            else:
                dm_e = dm_d = None
                e0, d0 = e_in, d_in
            qm_enc = km.reshape(-1, 1)
            # replay forward with residuals
            enc, eres = _block_fwd_res(
                e0, e0, km, qm_enc, W, "e_", hm, num_heads=num_heads,
                scale=scale, rate=rate, seed_ref=seed_ref, salt=salt,
                site=SITE_ENC_PROBS, train=train)
            dec, dres = _block_fwd_res(
                d0, enc, km, None, W, "d_", hm, num_heads=num_heads,
                scale=scale, rate=rate, seed_ref=seed_ref, salt=salt,
                site=SITE_DEC_PROBS, train=train)

            acc = {}
            for pre in ("e_", "d_"):
                for kk in _W_KEYS:
                    acc[pre + kk] = 0.0
            dd0, denc = _block_bwd(g, dres, d0, enc, km, None, W, "d_",
                                   hm, acc, num_heads=num_heads,
                                   scale=scale)
            de_q, de_kv = _block_bwd(denc, eres, e0, e0, km, qm_enc, W,
                                     "e_", hm, acc, num_heads=num_heads,
                                     scale=scale)
            de0 = de_q + de_kv
            if dm_e is not None:
                de0 = de0 * dm_e
                dd0 = dd0 * dm_d
            denc_ref[i] = de0.astype(denc_ref.dtype)
            ddec_ref[i] = dd0.astype(ddec_ref.dtype)

            def vecs_of(pre):
                return jnp.concatenate([
                    acc[pre + "bqkv"],
                    acc[pre + "ln1g"][None, :], acc[pre + "ln1b"][None, :],
                    acc[pre + "ln2g"][None, :], acc[pre + "ln2b"][None, :],
                    acc[pre + "b2"][None, :]], axis=0)     # [8, D]

            return (ae_wqkv + acc["e_wqkv"], ae_vecs + vecs_of("e_"),
                    ae_w1 + acc["e_w1"], ae_b1 + acc["e_b1"][None, :],
                    ae_w2 + acc["e_w2"],
                    ad_wqkv + acc["d_wqkv"], ad_vecs + vecs_of("d_"),
                    ad_w1 + acc["d_w1"], ad_b1 + acc["d_b1"][None, :],
                    ad_w2 + acc["d_w2"])

        zero = (jnp.zeros((D, 3 * D), jnp.float32),
                jnp.zeros((8, D), jnp.float32),
                jnp.zeros((D, F), jnp.float32),
                jnp.zeros((1, F), jnp.float32),
                jnp.zeros((F, D), jnp.float32))
        out = jax.lax.fori_loop(0, block, one, zero + zero)
        accs = (a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
                a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2)
        for ref, val in zip(accs, out):
            ref[:] = ref[:] + val

        # emit the accumulated weight grads once, on the last program
        @pl.when(pid == n_programs - 1)
        def _():
            outs = (ge_wqkv, ge_vecs, ge_w1, ge_b1, ge_w2,
                    gd_wqkv, gd_vecs, gd_w1, gd_b1, gd_w2)
            for oref, aref in zip(outs, accs):
                oref[:] = aref[:].astype(oref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


def _block_size(B: int) -> int:
    for nb in (16, 8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


def _pack_weights(p):
    """nn.transformer block params -> (wqkv [D,3D], vecs [8,D], w1, b1 [1,F],
    w2) in the kernel's layout."""
    mha, ff = p["mha"], p["ff"]
    wqkv = jnp.concatenate([mha["q"]["w"], mha["k"]["w"], mha["v"]["w"]],
                           axis=1)
    vecs = jnp.stack([
        mha["q"]["b"], mha["k"]["b"], mha["v"]["b"],
        mha["ln"]["gamma"], mha["ln"]["beta"],
        ff["ln"]["gamma"], ff["ln"]["beta"],
        ff["fc2"]["b"]], axis=0)
    return (wqkv, vecs, ff["fc1"]["w"], ff["fc1"]["b"][None, :],
            ff["fc2"]["w"])


def _unpack_weight_grads(gw, like):
    """Inverse of _pack_weights for the cotangents."""
    wqkv, vecs, w1, b1, w2 = gw
    D = like["mha"]["q"]["w"].shape[0]

    def cast(x, ref):
        return x.astype(ref.dtype)

    return {
        "mha": {
            "q": {"w": cast(wqkv[:, 0 * D:1 * D], like["mha"]["q"]["w"]),
                  "b": cast(vecs[0], like["mha"]["q"]["b"])},
            "k": {"w": cast(wqkv[:, 1 * D:2 * D], like["mha"]["k"]["w"]),
                  "b": cast(vecs[1], like["mha"]["k"]["b"])},
            "v": {"w": cast(wqkv[:, 2 * D:3 * D], like["mha"]["v"]["w"]),
                  "b": cast(vecs[2], like["mha"]["v"]["b"])},
            "ln": {"gamma": cast(vecs[3], like["mha"]["ln"]["gamma"]),
                   "beta": cast(vecs[4], like["mha"]["ln"]["beta"])},
        },
        "ff": {
            "fc1": {"w": cast(w1, like["ff"]["fc1"]["w"]),
                    "b": cast(b1[0], like["ff"]["fc1"]["b"])},
            "fc2": {"w": cast(w2, like["ff"]["fc2"]["w"]),
                    "b": cast(vecs[7], like["ff"]["fc2"]["b"])},
            "ln": {"gamma": cast(vecs[5], like["ff"]["ln"]["gamma"]),
                   "beta": cast(vecs[6], like["ff"]["ln"]["beta"])},
        },
    }


def _fwd_call(seed, enc_in, dec_in, km, ew, dw, *, num_heads, scale, rate,
              train, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tk, D = enc_in.shape
    nb = _block_size(B)
    F = ew[2].shape[1]
    kernel = _make_fwd_kernel(num_heads, scale, rate, train, nb, Tk, D)
    wspecs = [
        pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((8, D), lambda b: (0, 0)),
        pl.BlockSpec((D, F), lambda b: (0, 0)),
        pl.BlockSpec((1, F), lambda b: (0, 0)),
        pl.BlockSpec((F, D), lambda b: (0, 0)),
    ]
    grid = (B // nb,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed [1]
            pl.BlockSpec((nb, Tk, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tk), lambda b: (b, 0, 0)),
        ] + wspecs + wspecs,
        out_specs=pl.BlockSpec((nb, 1, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), enc_in.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, enc_in, dec_in, km, *ew, *dw)


def _bwd_call(seed, enc_in, dec_in, km, ew, dw, g, *, num_heads, scale,
              rate, train, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tk, D = enc_in.shape
    nb = _block_size(B)
    F = ew[2].shape[1]
    n_programs = B // nb
    kernel = _make_bwd_kernel(num_heads, scale, rate, train, nb, Tk, D, F,
                              n_programs)
    wspecs = [
        pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((8, D), lambda b: (0, 0)),
        pl.BlockSpec((D, F), lambda b: (0, 0)),
        pl.BlockSpec((1, F), lambda b: (0, 0)),
        pl.BlockSpec((F, D), lambda b: (0, 0)),
    ]
    wshapes = [
        jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
        jax.ShapeDtypeStruct((8, D), jnp.float32),
        jax.ShapeDtypeStruct((D, F), jnp.float32),
        jax.ShapeDtypeStruct((1, F), jnp.float32),
        jax.ShapeDtypeStruct((F, D), jnp.float32),
    ]
    wscratch = [
        pltpu.VMEM((D, 3 * D), jnp.float32),
        pltpu.VMEM((8, D), jnp.float32),
        pltpu.VMEM((D, F), jnp.float32),
        pltpu.VMEM((1, F), jnp.float32),
        pltpu.VMEM((F, D), jnp.float32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, Tk, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tk), lambda b: (b, 0, 0)),
        ] + wspecs + wspecs + [
            pl.BlockSpec((nb, 1, D), lambda b: (b, 0, 0)),   # g
        ],
        out_specs=[
            pl.BlockSpec((nb, Tk, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, D), lambda b: (b, 0, 0)),
        ] + [pl.BlockSpec(s.shape, lambda b: tuple(0 for _ in s.shape))
             for s in wshapes] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((B, Tk, D), enc_in.dtype),
            jax.ShapeDtypeStruct((B, 1, D), dec_in.dtype),
        ] + wshapes + wshapes,
        scratch_shapes=wscratch + wscratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, enc_in, dec_in, km, *ew, *dw, g)
    denc, ddec = outs[0], outs[1]
    gew = tuple(outs[2:7])
    gdw = tuple(outs[7:12])
    return denc, ddec, gew, gdw


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_block_op(num_heads, scale, rate, train, interpret,
                    seed, enc_in, dec_in, km, ew, dw):
    return _fwd_call(seed, enc_in, dec_in, km, ew, dw, num_heads=num_heads,
                     scale=scale, rate=rate, train=train,
                     interpret=interpret)


def _fused_block_fwd(num_heads, scale, rate, train, interpret,
                     seed, enc_in, dec_in, km, ew, dw):
    out = _fused_block_op(num_heads, scale, rate, train, interpret,
                          seed, enc_in, dec_in, km, ew, dw)
    return out, (seed, enc_in, dec_in, km, ew, dw)


def _fused_block_bwd(num_heads, scale, rate, train, interpret, res, g):
    seed, enc_in, dec_in, km, ew, dw = res
    denc, ddec, gew, gdw = _bwd_call(
        seed, enc_in, dec_in, km, ew, dw, g, num_heads=num_heads,
        scale=scale, rate=rate, train=train, interpret=interpret)
    gew = tuple(gg.astype(w.dtype) for gg, w in zip(gew, ew))
    gdw = tuple(gg.astype(w.dtype) for gg, w in zip(gdw, dw))
    return None, denc, ddec, None, gew, gdw


_fused_block_op.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_encode_decode(enc_params, dec_params, *, enc_in, dec_in, seq_mask,
                        num_heads: int, dropout: float, train: bool,
                        rng: Optional[jax.Array] = None,
                        interpret: bool = False):
    """Fused single-block encoder+decoder (reference
    TransformerModel.py:84-171).

    enc_in [B, Tk, D]: the scaled + position-encoded sequence (PRE input
    dropout — dropout runs in-kernel); dec_in [B, D] likewise for the
    target; seq_mask [B, Tk].  Returns [B, D].
    """
    B, Tk, D = enc_in.shape
    scale = 1.0 / math.sqrt(D // num_heads)
    ew = _pack_weights(enc_params)
    dw = _pack_weights(dec_params)
    if train and dropout > 0.0 and rng is not None:
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
        do_train = True
    else:
        seed = jnp.zeros((1,), jnp.int32)
        do_train = False
    km = seq_mask.astype(jnp.float32).reshape(B, 1, Tk)
    out = _fused_block_op(num_heads, scale, float(dropout), do_train,
                          interpret, seed, enc_in,
                          dec_in[:, None, :], km, ew, dw)
    return out[:, 0, :]
