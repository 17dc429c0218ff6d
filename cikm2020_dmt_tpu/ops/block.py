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
the weights cross HBM.

Kernel shape discipline (v2 — the v1 per-example design measured 73 ms/step
SLOWER than XLA at batch 4096 because every projection ran as a [50, 80]
f32 matmul):
- the sequence dim pads to a sublane multiple (50 -> 56) OUTSIDE the
  kernel so [nb, Tp, D] <-> [nb*Tp, D] reshapes are tile-aligned no-ops;
- Q/K/V projections and the FF run ONCE per grid program over all
  ``block`` examples ([nb*Tp, D] operands — MXU-shaped), not per example;
- only the O(T^2) attention core loops per example (and per head, with
  lane-masked head extraction); per-example rows come out of the [N, D]
  activations via sublane-aligned dynamic_slice, never relayout reshapes;
- every dot takes operands in the input compute dtype (bf16 in production)
  and accumulates f32 (preferred_element_type); LN / softmax / dropout
  arithmetic stays f32.

Dropout runs in-kernel on the TPU hardware PRNG (pltpu.prng_*), re-seeded
per (site, program/example) so the recompute backward regenerates
bit-identical masks.  This replaces the host threefry path (~18 ms/step at
batch 4096 in round-1 traces) — a documented randomness-stream deviation;
the reference semantics (tf dropout: keep w.p. 1-rate, scale by
1/(1-rate)) are preserved.

Backward is full-recompute (flash-style): the custom VJP saves only the
kernel inputs; the backward kernel replays the forward and chains the
gradients, accumulating weight grads in VMEM scratch across the
(forced-sequential) grid and writing them once on the last program.
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
    """The scaled tf-semantics keep-mask for one (salt, site).

    Mosaic's prng_set_seed takes at most 2 words, so (salt, site) fold
    into one int32: site ids stay < 64 (max is SITE_DEC_PROBS*16 + head
    7 = 55) and salt*64 fits comfortably in 31 bits at any batch."""
    from jax.experimental.pallas import tpu as pltpu
    keep_prob = 1.0 - rate
    pltpu.prng_seed(seed_ref[0], salt * 64 + site)
    keep = _uniform01(shape) < keep_prob
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


# Examples per dropout-mask PRNG draw.  Seeding each _CHUNK-example slice
# by its GLOBAL chunk index (pid * nb/_CHUNK + j) makes the mask stream
# invariant to the kernel block size for any nb that is a multiple of
# _CHUNK — which is what lets the backward kernel replay the forward's
# masks while running a DIFFERENT nb (DMT_BLOCK_NB_BWD: the two kernels
# have different VMEM envelopes, so their optimal block sizes differ).
_CHUNK = 16


def _drop_mask_ex(shape, rate: float, seed_ref, pid, nb: int, site: int,
                  rows_per_ex: int = 1):
    """Example-chunked dropout mask for a [nb * rows_per_ex, ...] block.

    ``shape``'s leading dim must be nb * rows_per_ex with rows laid out
    example-major (true for every call site: E0/D0 are (nb*Tp, D) /
    (nb, D) reshapes of example-major blocks, attention probs are
    (nb, Tq, Tk)).  Chunking only engages while DMT_BLOCK_NB_BWD is set
    (read at trace time, so fwd and bwd kernels of one program agree):
    the extra per-chunk reseeds measured +0.56 ms/step on the default
    path (r5 trace, fwd 3.69->4.00 + bwd 8.78->9.03), and the default
    path doesn't need nb-invariance.  nb not a multiple of _CHUNK also
    falls back to one per-program draw — and _block_size_bwd then forces
    the backward nb to match the forward's."""
    import os
    if "DMT_BLOCK_NB_BWD" not in os.environ or nb % _CHUNK:
        return _drop_mask(shape, rate, seed_ref, pid, site)
    n_chunks = nb // _CHUNK
    rows = _CHUNK * rows_per_ex
    chunk_shape = (rows,) + tuple(shape[1:])
    parts = [_drop_mask(chunk_shape, rate, seed_ref,
                        pid * n_chunks + j, site)
             for j in range(n_chunks)]
    return parts[0] if n_chunks == 1 else jnp.concatenate(parts, axis=0)


def _ln(x, gamma, beta):
    """Reference ln (TransformerModel_util.py:58-78), f32 statistics."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mean) * inv
    return gamma * xhat + beta, xhat, inv


def _ln_bwd(g, xhat, inv, gamma):
    """dL/dx for y = gamma*xhat + beta; also returns (dgamma, dbeta)."""
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


def _dot(a, b, cd):
    """a @ b with operands in compute dtype ``cd``, f32 accumulation."""
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=jnp.float32)


def _dot_t(a, b, cd):
    """a^T @ b (contract dim 0 of both), f32 accumulation."""
    return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b, cd):
    """a @ b^T (contract dim 1 of both), f32 accumulation."""
    return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


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


def _load_weights(e_wqkv, e_vecs, e_w1, e_b1, e_w2,
                  d_wqkv, d_vecs, d_w1, d_b1, d_w2):
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
    return W


# ---------------------------------------------------------------------------
# Attention core: per example, per head (tiny O(T^2) dots); everything
# around it is batched over the program block.
# ---------------------------------------------------------------------------


def _bdot(a, b, dims, cd):
    """Batched dot_general (batch dim 0) in compute dtype, f32 accum."""
    return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                               (dims, ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _attend3(Q, K, V, kmr, kmc, hm, *, scale, cd, rate, seed_ref, salt,
             site, train):
    """Batched masked MHA over the whole program block.

    Q/K/V [nb, Tp, D]; kmr [nb, 1, Tp] (key mask), kmc [nb, Tp, 1] (query
    mask) or None.  One batched [nb, Tq, Tk] matmul pair per head — no
    per-example loop.  Returns ctx [nb, Tp, D] (f32)."""
    ctx = jnp.zeros(Q.shape, jnp.float32)
    H = hm.shape[0]
    for h in range(H):
        mh = hm[h][None, None, :]
        s = _bdot(Q * mh, K, ((2,), (2,)), cd) * scale     # [nb, Tq, Tk]
        s = jnp.where(kmr > 0, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if kmc is not None:
            p = p * kmc
        if train and rate > 0.0:
            p = p * _drop_mask_ex(p.shape, rate, seed_ref, salt,
                                  p.shape[0], site * 16 + h)
        ctx = ctx + _bdot(p, V * mh, ((2,), (1,)), cd)
    return ctx


def _attend3_bwd(g_ctx, Q, K, V, kmr, kmc, hm, *, scale, cd, rate, seed_ref,
                 salt, site, train):
    """Backward of _attend3 wrt Q, K, V; all batched [nb, ., .] dots.

    Recomputes each head's softmax probs from Q/K/V (which stay live for
    the weight-grad dots anyway) and REGENERATES its dropout mask from the
    deterministic in-kernel PRNG — storing H x [nb, Tq, Tk] probs + masks
    from the replay measured 18.5M scoped VMEM at nb=16 (over the 16M
    limit); recompute keeps one head's temporaries live at a time."""
    dQ = jnp.zeros(Q.shape, jnp.float32)
    dK = jnp.zeros(K.shape, jnp.float32)
    dV = jnp.zeros(V.shape, jnp.float32)
    H = hm.shape[0]
    for h in range(H):
        mh = hm[h][None, None, :]
        s = _bdot(Q * mh, K, ((2,), (2,)), cd) * scale
        s = jnp.where(kmr > 0, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p0 = e / jnp.sum(e, axis=-1, keepdims=True)
        dm = (_drop_mask_ex(p0.shape, rate, seed_ref, salt, p0.shape[0],
                            site * 16 + h)
              if train and rate > 0.0 else None)
        pq = p0 * kmc if kmc is not None else p0
        pd = pq * dm if dm is not None else pq
        dV = dV + _bdot(pd, g_ctx, ((1,), (1,)), cd) * mh  # [nb, Tk, D]
        dpd = _bdot(g_ctx, V * mh, ((2,), (2,)), cd)       # [nb, Tq, Tk]
        dpq = dpd * dm if dm is not None else dpd
        dp0 = dpq * kmc if kmc is not None else dpq
        ds = p0 * (dp0 - jnp.sum(dp0 * p0, axis=-1, keepdims=True))
        dQ = dQ + _bdot(ds, K, ((2,), (1,)), cd) * scale * mh
        dK = dK + _bdot(ds, Q * mh, ((1,), (1,)), cd) * scale
    return dQ, dK, dV


# ---------------------------------------------------------------------------
# Batched sub-blocks (LN + FF over [N, D] for the whole program block)
# ---------------------------------------------------------------------------


def _ffln(x_res, ctx, W, pre, cd):
    """+res -> LN -> FF(relu) -> +res -> LN, batched over rows.
    Returns (h2, residuals-for-backward).  fpre is NOT kept: relu's mask
    recovers from f > 0 (relu'(0) = 0 either way)."""
    a1 = ctx + x_res
    h1, xhat1, inv1 = _ln(a1, W[pre + "ln1g"], W[pre + "ln1b"])
    f = jnp.maximum(_dot(h1, W[pre + "w1"], cd) + W[pre + "b1"], 0.0)
    f2 = _dot(f, W[pre + "w2"], cd) + W[pre + "b2"]
    h2, xhat2, inv2 = _ln(f2 + h1, W[pre + "ln2g"], W[pre + "ln2b"])
    return h2, (h1, xhat1, inv1, f, xhat2, inv2)


def _ffln_bwd(g, res, W, pre, acc, cd):
    """Backward of _ffln; returns d(a1) (caller feeds it to both the ctx
    and the residual-input paths); accumulates weight grads into ``acc``."""
    h1, xhat1, inv1, f, xhat2, inv2 = res
    dln2_in, dg2, db2v = _ln_bwd(g, xhat2, inv2, W[pre + "ln2g"])
    acc[pre + "ln2g"] += dg2
    acc[pre + "ln2b"] += db2v
    df = _dot_nt(dln2_in, W[pre + "w2"], cd)
    acc[pre + "w2"] += _dot_t(f, dln2_in, cd)
    acc[pre + "b2"] += jnp.sum(dln2_in, axis=0)
    dfpre = df * (f > 0.0)
    dh1 = dln2_in + _dot_nt(dfpre, W[pre + "w1"], cd)
    acc[pre + "w1"] += _dot_t(h1, dfpre, cd)
    acc[pre + "b1"] += jnp.sum(dfpre, axis=0)
    da1, dg1, db1v = _ln_bwd(dh1, xhat1, inv1, W[pre + "ln1g"])
    acc[pre + "ln1g"] += dg1
    acc[pre + "ln1b"] += db1v
    return da1


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _make_fwd_kernel(num_heads, scale, rate, train, block, Tp, D, cd,
                     save=False):
    from jax.experimental import pallas as pl

    def kernel(seed_ref, enc_ref, dec_ref, kmr_ref, kmc_ref,
               e_wqkv, e_vecs, e_w1, e_b1, e_w2,
               d_wqkv, d_vecs, d_w1, d_b1, d_w2, out_ref, *save_refs):
        hm = _head_mask(num_heads, D)
        W = _load_weights(e_wqkv, e_vecs, e_w1, e_b1, e_w2,
                          d_wqkv, d_vecs, d_w1, d_b1, d_w2)
        pid = pl.program_id(0)
        N = block * Tp

        E0 = enc_ref[...].astype(jnp.float32).reshape(N, D)
        D0 = dec_ref[...].astype(jnp.float32)               # [block, D]
        kmr = kmr_ref[...]                                   # [nb, 1, Tp]
        kmc = kmc_ref[...]                                   # [nb, Tp, 1]
        if train and rate > 0.0:
            E0 = E0 * _drop_mask_ex((N, D), rate, seed_ref, pid, block,
                                    SITE_ENC_IN, rows_per_ex=Tp)
            D0 = D0 * _drop_mask_ex((block, D), rate, seed_ref, pid,
                                    block, SITE_DEC_IN)

        # ---- encoder: batched projections + batched masked MHA ----
        wq, wk, wv = (W["e_wqkv"][:, 0 * D:1 * D], W["e_wqkv"][:, 1 * D:2 * D],
                      W["e_wqkv"][:, 2 * D:3 * D])
        Q = (_dot(E0, wq, cd) + W["e_bqkv"][0:1]).reshape(block, Tp, D)
        K = (_dot(E0, wk, cd) + W["e_bqkv"][1:2]).reshape(block, Tp, D)
        V = (_dot(E0, wv, cd) + W["e_bqkv"][2:3]).reshape(block, Tp, D)
        ctx = _attend3(Q, K, V, kmr, kmc, hm, scale=scale, cd=cd, rate=rate,
                       seed_ref=seed_ref, salt=pid, site=SITE_ENC_PROBS,
                       train=train)
        if save:
            # DMT_BLOCK_SAVE residuals: Q/K/V in compute dtype (the dots
            # only ever see cd(Q) — bit-exact), ctx_e in f32 (feeds the
            # f32 ffln replay).  The backward then skips the encoder
            # projection + attention replay (VERDICT r3 #2b, measured).
            qs_ref, ks_ref, vs_ref, ce_ref = save_refs
            qs_ref[...] = Q.astype(qs_ref.dtype)
            ks_ref[...] = K.astype(ks_ref.dtype)
            vs_ref[...] = V.astype(vs_ref.dtype)
            ce_ref[...] = ctx.astype(ce_ref.dtype)
        H2, _ = _ffln(E0, ctx.reshape(N, D), W, "e_", cd)

        # ---- decoder: 1-query cross attention over the encoder state ----
        dwq, dwk, dwv = (W["d_wqkv"][:, 0 * D:1 * D],
                         W["d_wqkv"][:, 1 * D:2 * D],
                         W["d_wqkv"][:, 2 * D:3 * D])
        Qd = (_dot(D0, dwq, cd) + W["d_bqkv"][0:1]).reshape(block, 1, D)
        Kd = (_dot(H2, dwk, cd) + W["d_bqkv"][1:2]).reshape(block, Tp, D)
        Vd = (_dot(H2, dwv, cd) + W["d_bqkv"][2:3]).reshape(block, Tp, D)
        ctx_d = _attend3(Qd, Kd, Vd, kmr, None, hm, scale=scale, cd=cd,
                         rate=rate, seed_ref=seed_ref, salt=pid,
                         site=SITE_DEC_PROBS, train=train)
        out, _ = _ffln(D0, ctx_d.reshape(block, D), W, "d_", cd)
        out_ref[...] = out.astype(out_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel: full recompute + manual chain rule.
# ---------------------------------------------------------------------------

_W_KEYS = ("wqkv", "bqkv", "ln1g", "ln1b", "ln2g", "ln2b", "b2", "w1",
           "b1", "w2")


def _make_bwd_kernel(num_heads, scale, rate, train, block, Tp, D, F,
                     n_programs, cd, save=False):
    from jax.experimental import pallas as pl

    def kernel(seed_ref, enc_ref, dec_ref, kmr_ref, kmc_ref,
               e_wqkv, e_vecs, e_w1, e_b1, e_w2,
               d_wqkv, d_vecs, d_w1, d_b1, d_w2, *rest):
        if save:
            (qs_ref, ks_ref, vs_ref, ce_ref, g_ref,
             denc_ref, ddec_ref,
             ge_wqkv, ge_vecs, ge_w1, ge_b1, ge_w2,
             gd_wqkv, gd_vecs, gd_w1, gd_b1, gd_w2,
             a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
             a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2) = rest
        else:
            (g_ref,
             denc_ref, ddec_ref,
             ge_wqkv, ge_vecs, ge_w1, ge_b1, ge_w2,
             gd_wqkv, gd_vecs, gd_w1, gd_b1, gd_w2,
             a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
             a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2) = rest
        hm = _head_mask(num_heads, D)
        W = _load_weights(e_wqkv, e_vecs, e_w1, e_b1, e_w2,
                          d_wqkv, d_vecs, d_w1, d_b1, d_w2)
        pid = pl.program_id(0)
        N = block * Tp

        @pl.when(pid == 0)
        def _():
            for ref in (a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
                        a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2):
                ref[:] = jnp.zeros_like(ref)

        E_in = enc_ref[...].astype(jnp.float32).reshape(N, D)
        D_in = dec_ref[...].astype(jnp.float32)             # [block, D]
        kmr = kmr_ref[...]
        kmc = kmc_ref[...]
        if train and rate > 0.0:
            dm_e = _drop_mask_ex((N, D), rate, seed_ref, pid, block,
                                 SITE_ENC_IN, rows_per_ex=Tp)
            dm_d = _drop_mask_ex((block, D), rate, seed_ref, pid, block,
                                 SITE_DEC_IN)
            E0 = E_in * dm_e
            D0 = D_in * dm_d
        else:
            dm_e = dm_d = None
            E0, D0 = E_in, D_in
        G = g_ref[...].astype(jnp.float32)                  # [block, D]

        # ---- replay forward (batched) ----
        wq, wk, wv = (W["e_wqkv"][:, 0 * D:1 * D], W["e_wqkv"][:, 1 * D:2 * D],
                      W["e_wqkv"][:, 2 * D:3 * D])
        if save:
            # DMT_BLOCK_SAVE: Q/K/V arrive in compute dtype (every use
            # below casts to cd anyway — bit-exact vs the replay) and
            # ctx_e in f32; the projections and the encoder attention
            # forward are skipped.  The ffln replay stays: its residuals
            # (h1/xhat/inv/f) are needed by _ffln_bwd regardless.
            Q = qs_ref[...]
            K = ks_ref[...]
            V = vs_ref[...]
            ctx_e = ce_ref[...].astype(jnp.float32)
        else:
            Q = (_dot(E0, wq, cd) + W["e_bqkv"][0:1]).reshape(block, Tp, D)
            K = (_dot(E0, wk, cd) + W["e_bqkv"][1:2]).reshape(block, Tp, D)
            V = (_dot(E0, wv, cd) + W["e_bqkv"][2:3]).reshape(block, Tp, D)
            ctx_e = _attend3(Q, K, V, kmr, kmc, hm, scale=scale, cd=cd,
                             rate=rate, seed_ref=seed_ref, salt=pid,
                             site=SITE_ENC_PROBS, train=train)
        H2, eres = _ffln(E0, ctx_e.reshape(N, D), W, "e_", cd)

        dwq, dwk, dwv = (W["d_wqkv"][:, 0 * D:1 * D],
                         W["d_wqkv"][:, 1 * D:2 * D],
                         W["d_wqkv"][:, 2 * D:3 * D])
        Qd = (_dot(D0, dwq, cd) + W["d_bqkv"][0:1]).reshape(block, 1, D)
        Kd = (_dot(H2, dwk, cd) + W["d_bqkv"][1:2]).reshape(block, Tp, D)
        Vd = (_dot(H2, dwv, cd) + W["d_bqkv"][2:3]).reshape(block, Tp, D)
        ctx_d = _attend3(Qd, Kd, Vd, kmr, None, hm, scale=scale, cd=cd,
                         rate=rate, seed_ref=seed_ref, salt=pid,
                         site=SITE_DEC_PROBS, train=train)
        _, dres = _ffln(D0, ctx_d.reshape(block, D), W, "d_", cd)

        acc = {}
        for pre in ("e_", "d_"):
            for kk in _W_KEYS:
                acc[pre + kk] = 0.0

        # ---- decoder backward ----
        da1_d = _ffln_bwd(G, dres, W, "d_", acc, cd)        # d(ctx_d + D0)
        dD0 = da1_d
        dQd3, dKd3, dVd3 = _attend3_bwd(
            da1_d.reshape(block, 1, D), Qd, Kd, Vd, kmr, None, hm,
            scale=scale, cd=cd, rate=rate, seed_ref=seed_ref, salt=pid,
            site=SITE_DEC_PROBS, train=train)
        dQd = dQd3.reshape(block, D)
        dKd = dKd3.reshape(N, D)
        dVd = dVd3.reshape(N, D)
        acc["d_wqkv"] += jnp.concatenate(
            [_dot_t(D0, dQd, cd), _dot_t(H2, dKd, cd), _dot_t(H2, dVd, cd)],
            axis=1)
        acc["d_bqkv"] += jnp.stack(
            [jnp.sum(dQd, axis=0), jnp.sum(dKd, axis=0),
             jnp.sum(dVd, axis=0)], axis=0)
        dD0 = dD0 + _dot_nt(dQd, dwq, cd)
        dH2 = _dot_nt(dKd, dwk, cd) + _dot_nt(dVd, dwv, cd)

        # ---- encoder backward ----
        da1_e = _ffln_bwd(dH2, eres, W, "e_", acc, cd)      # d(ctx_e + E0)
        dQ3, dK3, dV3 = _attend3_bwd(
            da1_e.reshape(block, Tp, D), Q, K, V, kmr, kmc, hm,
            scale=scale, cd=cd, rate=rate, seed_ref=seed_ref, salt=pid,
            site=SITE_ENC_PROBS, train=train)
        dQ = dQ3.reshape(N, D)
        dK_ = dK3.reshape(N, D)
        dV_ = dV3.reshape(N, D)
        acc["e_wqkv"] += jnp.concatenate(
            [_dot_t(E0, dQ, cd), _dot_t(E0, dK_, cd), _dot_t(E0, dV_, cd)],
            axis=1)
        acc["e_bqkv"] += jnp.stack(
            [jnp.sum(dQ, axis=0), jnp.sum(dK_, axis=0),
             jnp.sum(dV_, axis=0)], axis=0)
        dE0 = (da1_e + _dot_nt(dQ, wq, cd) + _dot_nt(dK_, wk, cd)
               + _dot_nt(dV_, wv, cd))

        if dm_e is not None:
            dE0 = dE0 * dm_e
            dD0 = dD0 * dm_d
        denc_ref[...] = dE0.reshape(block, Tp, D).astype(denc_ref.dtype)
        ddec_ref[...] = dD0.astype(ddec_ref.dtype)

        def vecs_of(pre):
            return jnp.concatenate([
                acc[pre + "bqkv"],
                acc[pre + "ln1g"][None, :], acc[pre + "ln1b"][None, :],
                acc[pre + "ln2g"][None, :], acc[pre + "ln2b"][None, :],
                acc[pre + "b2"][None, :]], axis=0)           # [8, D]

        updates = (acc["e_wqkv"], vecs_of("e_"), acc["e_w1"],
                   acc["e_b1"][None, :], acc["e_w2"],
                   acc["d_wqkv"], vecs_of("d_"), acc["d_w1"],
                   acc["d_b1"][None, :], acc["d_w2"])
        accs = (a_e_wqkv, a_e_vecs, a_e_w1, a_e_b1, a_e_w2,
                a_d_wqkv, a_d_vecs, a_d_w1, a_d_b1, a_d_w2)
        for ref, val in zip(accs, updates):
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
    """Examples per grid program.  Default 64 since r4 (96.5k -> 99.6k
    ex/s on the flagship bench): bigger blocks amortize the per-program
    weight reloads and widen the projection/FF matmul M-dim.  The r2
    note that 64 exceeds the 16 MB scoped-VMEM limit in the recompute
    backward holds only under the DEFAULT compiler guard — nb > 32 now
    raises vmem_limit_bytes (see the pallas_call sites), and the v5e
    hardware runs it fine (measured r4).  History: 16 -> 32 was 50.3 ->
    45.5 ms/step (r2); 128 is a hard ceiling (140.71M scoped VMEM >
    v5e's 128M physical, compile fails — r4).  DMT_BLOCK_NB overrides
    for other shapes; batches not divisible by the preference fall back
    32/16/8/4/2/1."""
    import os
    pref = int(os.environ.get("DMT_BLOCK_NB", "64"))
    for nb in (pref, 32, 16, 8, 4, 2, 1):
        if nb >= 1 and B % nb == 0:
            return nb
    return 1


def _block_size_bwd(B: int) -> int:
    """Backward-kernel block size (VERDICT r4 #1: the bwd VMEM envelope
    differs from the fwd's — replay + grad accumulators — so its optimal
    nb may too).  DMT_BLOCK_NB_BWD overrides; default follows the
    forward.  The override only applies when both sizes are multiples of
    _CHUNK (the example-chunked PRNG seeding that makes dropout masks
    nb-invariant) and divide B; otherwise the backward must mirror the
    forward exactly."""
    import os
    fwd = _block_size(B)
    v = os.environ.get("DMT_BLOCK_NB_BWD", "")
    if not v:
        return fwd
    nb = int(v)
    if nb % _CHUNK or fwd % _CHUNK or B % nb:
        # LOUD fallback: a silently ignored override is the dead-flag
        # artifact class that already produced one wrong conclusion
        # (CLAUDE.md, r3 "DMA opt-ins neutral")
        import warnings
        warnings.warn(
            f"DMT_BLOCK_NB_BWD={nb} rejected (needs a multiple of "
            f"{_CHUNK} that divides B={B}, with fwd nb {fwd} also a "
            f"multiple of {_CHUNK}); backward uses nb={fwd}",
            stacklevel=2)
        return fwd
    return nb


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


def _compute_dtype(x):
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _sds(shape, dtype, like):
    """ShapeDtypeStruct carrying ``like``'s varying-mesh-axes set, so the
    pallas_call outputs type-check under shard_map (check_vma=True); a
    plain struct outside shard_map."""
    vma = getattr(jax.typeof(like), "vma", None)
    if not vma:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _wspecs(D, F):
    from jax.experimental import pallas as pl
    return [
        pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((8, D), lambda b: (0, 0)),
        pl.BlockSpec((D, F), lambda b: (0, 0)),
        pl.BlockSpec((1, F), lambda b: (0, 0)),
        pl.BlockSpec((F, D), lambda b: (0, 0)),
    ]


def _fwd_call(seed, enc_in, dec_in, kmr, kmc, ew, dw, *, num_heads, scale,
              rate, train, interpret, save=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp, D = enc_in.shape
    nb = _block_size(B)
    F = ew[2].shape[1]
    cd = _compute_dtype(enc_in)
    kernel = _make_fwd_kernel(num_heads, scale, rate, train, nb, Tp, D, cd,
                              save=save)
    out_specs = pl.BlockSpec((nb, D), lambda b: (b, 0))
    out_shape = _sds((B, D), enc_in.dtype, enc_in)
    if save:
        blk = pl.BlockSpec((nb, Tp, D), lambda b: (b, 0, 0))
        out_specs = [out_specs, blk, blk, blk, blk]
        out_shape = [out_shape,
                     _sds((B, Tp, D), cd, enc_in),       # Q
                     _sds((B, Tp, D), cd, enc_in),       # K
                     _sds((B, Tp, D), cd, enc_in),       # V
                     _sds((B, Tp, D), jnp.float32, enc_in)]  # ctx_e
    return pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed [1]
            pl.BlockSpec((nb, Tp, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, D), lambda b: (b, 0)),
            pl.BlockSpec((nb, 1, Tp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tp, 1), lambda b: (b, 0, 0)),
        ] + _wspecs(D, F) + _wspecs(D, F),
        out_specs=out_specs,
        out_shape=out_shape,
        # nb>32 (the DMT_BLOCK_NB A/B — fewer weight reloads, bigger MXU
        # M-dim) needs ~27M scoped VMEM in the fwd; raise the 16M
        # compiler guard only then, so the default nb=32 executable (and
        # its compile-cache entry) stays byte-identical
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024) if nb > 32
            else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",))),
        interpret=interpret,
    )(seed, enc_in, dec_in, kmr, kmc, *ew, *dw)


def _bwd_call(seed, enc_in, dec_in, kmr, kmc, ew, dw, g, *, num_heads,
              scale, rate, train, interpret, saved=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp, D = enc_in.shape
    nb = _block_size_bwd(B)
    F = ew[2].shape[1]
    cd = _compute_dtype(enc_in)
    n_programs = B // nb
    save = saved is not None
    kernel = _make_bwd_kernel(num_heads, scale, rate, train, nb, Tp, D, F,
                              n_programs, cd, save=save)
    # weight grads are computed from the (possibly data-sharded) batch, so
    # under shard_map they vary like the activations; the shard_map
    # transpose psums them into the replicated-weight cotangent
    wshapes = [
        _sds((D, 3 * D), jnp.float32, enc_in),
        _sds((8, D), jnp.float32, enc_in),
        _sds((D, F), jnp.float32, enc_in),
        _sds((1, F), jnp.float32, enc_in),
        _sds((F, D), jnp.float32, enc_in),
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
            pl.BlockSpec((nb, Tp, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, D), lambda b: (b, 0)),
            pl.BlockSpec((nb, 1, Tp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tp, 1), lambda b: (b, 0, 0)),
        ] + _wspecs(D, F) + _wspecs(D, F) + (
            [pl.BlockSpec((nb, Tp, D), lambda b: (b, 0, 0))] * 4
            if save else []) + [
            pl.BlockSpec((nb, D), lambda b: (b, 0)),         # g
        ],
        out_specs=[
            pl.BlockSpec((nb, Tp, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, D), lambda b: (b, 0)),
        ] + [pl.BlockSpec(s.shape, lambda b: (0, 0)) for s in wshapes] * 2,
        out_shape=[
            _sds((B, Tp, D), enc_in.dtype, enc_in),
            _sds((B, D), dec_in.dtype, dec_in),
        ] + wshapes + wshapes,
        scratch_shapes=wscratch + wscratch,
        # the fwd-replay + manual chain rule peaks ~19M of scoped VMEM at
        # nb=16 (Mosaic's conservative liveness across the unrolled
        # per-head dots); the 16M default limit is a compiler guard, not
        # the v5e hardware's 128M — raise it rather than shrinking nb
        # (smaller blocks starve the MXU on the [nb*Tp, D] projections)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, enc_in, dec_in, kmr, kmc, *ew, *dw,
      *(saved if save else ()), g)
    denc, ddec = outs[0], outs[1]
    gew = tuple(outs[2:7])
    gdw = tuple(outs[7:12])
    return denc, ddec, gew, gdw


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_block_op(num_heads, scale, rate, train, interpret,
                    seed, enc_in, dec_in, kmr, kmc, ew, dw):
    return _fwd_call(seed, enc_in, dec_in, kmr, kmc, ew, dw,
                     num_heads=num_heads, scale=scale, rate=rate,
                     train=train, interpret=interpret)


def _save_wanted() -> bool:
    """DMT_BLOCK_SAVE=1: the forward ALSO emits {Q, K, V (compute dtype),
    ctx_e (f32)} so the recompute backward skips the encoder projection +
    attention replay (VERDICT r3 #2b).  Bit-exact either way (the saved
    values are exactly what the replay feeds the same ops); the trade is
    ~(3+1)*B*Tp*D bytes of HBM round-trip against the replay compute."""
    import os
    return os.environ.get("DMT_BLOCK_SAVE", "0") == "1"


def _fused_block_fwd(num_heads, scale, rate, train, interpret,
                     seed, enc_in, dec_in, kmr, kmc, ew, dw):
    if _save_wanted():
        out, qs, ks, vs, ce = _fwd_call(
            seed, enc_in, dec_in, kmr, kmc, ew, dw, num_heads=num_heads,
            scale=scale, rate=rate, train=train, interpret=interpret,
            save=True)
        return out, (seed, enc_in, dec_in, kmr, kmc, ew, dw,
                     (qs, ks, vs, ce))
    out = _fused_block_op(num_heads, scale, rate, train, interpret,
                          seed, enc_in, dec_in, kmr, kmc, ew, dw)
    return out, (seed, enc_in, dec_in, kmr, kmc, ew, dw, None)


def _fused_block_bwd(num_heads, scale, rate, train, interpret, res, g):
    seed, enc_in, dec_in, kmr, kmc, ew, dw, saved = res
    denc, ddec, gew, gdw = _bwd_call(
        seed, enc_in, dec_in, kmr, kmc, ew, dw, g, num_heads=num_heads,
        scale=scale, rate=rate, train=train, interpret=interpret,
        saved=saved)
    gew = tuple(gg.astype(w.dtype) for gg, w in zip(gew, ew))
    gdw = tuple(gg.astype(w.dtype) for gg, w in zip(gdw, dw))
    return None, denc, ddec, None, None, gew, gdw


_fused_block_op.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_encode_decode(enc_params, dec_params, *, enc_in, dec_in, seq_mask,
                        num_heads: int, dropout: float, train: bool,
                        rng: Optional[jax.Array] = None,
                        interpret: bool = False, mesh=None):
    """Fused single-block encoder+decoder (reference
    TransformerModel.py:84-171).

    enc_in [B, Tk, D]: the scaled + position-encoded sequence (PRE input
    dropout — dropout runs in-kernel); dec_in [B, D] likewise for the
    target; seq_mask [B, Tk].  Returns [B, D].

    The sequence dim pads to a multiple of 8 here (zero key-mask on pad
    positions keeps them out of every output and gradient path, matching
    the jnp path's masking semantics) so the kernel's [nb, Tp, D] <->
    [nb*Tp, D] reshapes and per-example row slices are tile-aligned.

    Multi-chip: GSPMD has no partitioning rule for the Mosaic custom
    call, so when a ``mesh`` is given the op runs under ``shard_map``
    (batch split over the data axis, weights replicated).  shard_map's AD
    transpose psums the replicated-weight cotangents over the data axis
    automatically, and each shard offsets the in-kernel PRNG seed by its
    data-axis index so dropout masks do not repeat across batch shards.
    """
    B, Tk, D = enc_in.shape
    Tp = ((Tk + 7) // 8) * 8
    km = seq_mask.astype(jnp.float32)
    if Tp != Tk:
        enc_in = jnp.pad(enc_in, ((0, 0), (0, Tp - Tk), (0, 0)))
        km = jnp.pad(km, ((0, 0), (0, Tp - Tk)))
    # The batch dim pads to a multiple of the 32-example kernel block:
    # Mosaic requires 2-D operand blocks [nb, D] with nb % 8 == 0 (or
    # nb == B), and serving batches (e.g. 300 rerank candidates) satisfy
    # neither.  Padded examples carry a zero key mask (finite garbage
    # out, same as absent-query rows) and are sliced off below; training
    # batches are already multiples of 32, so the pad is a no-op there.
    sharded = mesh is not None and mesh.devices.size > 1
    if sharded:
        from ..core.mesh import DATA_AXIS
        mult = 32 * mesh.shape[DATA_AXIS]
    else:
        mult = 32
    B0 = B
    Bp = ((B + mult - 1) // mult) * mult
    if Bp != B:
        enc_in = jnp.pad(enc_in, ((0, Bp - B), (0, 0), (0, 0)))
        dec_in = jnp.pad(dec_in, ((0, Bp - B), (0, 0)))
        km = jnp.pad(km, ((0, Bp - B), (0, 0)))
        B = Bp
    scale = 1.0 / math.sqrt(D // num_heads)
    ew = _pack_weights(enc_params)
    dw = _pack_weights(dec_params)
    if train and dropout > 0.0 and rng is not None:
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
        do_train = True
    else:
        seed = jnp.zeros((1,), jnp.int32)
        do_train = False
    # the key mask in both row ([B,1,Tp], masks keys) and column
    # ([B,Tp,1], zeroes absent-query prob rows) layouts — built here where
    # the transpose is free, so the kernel does none
    kmr = km.reshape(B, 1, Tp)
    kmc = km.reshape(B, Tp, 1)
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P
        from ..core.mesh import DATA_AXIS

        def local(seed_l, enc_l, dec_l, kmr_l, kmc_l, *w):
            # decorrelate the hardware-PRNG streams across batch shards
            # (each shard's grid restarts program_id at 0)
            seed_l = seed_l + jax.lax.axis_index(DATA_AXIS) * (1 << 20)
            return _fused_block_op(num_heads, scale, float(dropout),
                                   do_train, interpret, seed_l, enc_l,
                                   dec_l, kmr_l, kmc_l, w[:5], w[5:])

        bspec = P(DATA_AXIS)
        # check_vma=False: the varying-axes checker descends into the
        # kernel jaxpr, where in-kernel iota/constants are unvarying and
        # every op on (batch x constant) trips it.  Replicated-weight
        # gradients stay correct — the transpose of an in_specs=P()
        # broadcast is structurally a psum over the data axis (asserted
        # against the single-device path by test_shard_map_multichip).
        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), bspec, bspec, bspec, bspec) + (P(),) * 10,
            out_specs=bspec, check_vma=False,
        )(seed, enc_in, dec_in, kmr, kmc, *ew, *dw)
        return out[:B0] if B != B0 else out
    out = _fused_block_op(num_heads, scale, float(dropout), do_train,
                          interpret, seed, enc_in, dec_in, kmr, kmc,
                          ew, dw)
    return out[:B0] if B != B0 else out
