"""Fused masked multi-head attention — Pallas TPU kernel with custom VJP.

Covers the attention core of the Deep Interest Transformer
(scores -> key-mask -> softmax -> query-zero -> context), the part XLA
cannot fuse across MXU ops: without the kernel, the [B, H, Tq, Tk] score
and probability tensors round-trip HBM twice per layer
(reference equivalent: TransformerModel_util.py:11-56).

Shapes are the DMT regime: Tk <= 50, d_model 80, 4 heads of 20.  The kernel
pads T to the sublane tile and D to the 128-lane tile and exploits a
head-masking identity to keep every matmul at full 128-lane contraction:

    scores_h = (q * head_mask_h) @ k^T      (zero lanes kill cross-head terms)
    ctx      = sum_h probs_h @ (v * head_mask_h)

so per example the whole MHA core is 2*H dots on [Tp, 128] tiles resident
in VMEM.  Backward recomputes probabilities (flash-style; cheap at T=50)
inside a second kernel.

The kernel serves the dropout-free path (inference/eval, and training with
transformer_dropout_rate=0); with probability-dropout active the caller
falls back to the jnp reference implementation
(nn/transformer.py attention_core) so training-mode randomness stays
byte-compatible with the non-kernel path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -(2.0 ** 32) + 1


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_masks(num_heads: int, d: int, dp: int) -> np.ndarray:
    """[H, dp] one-hot lane masks selecting each head's d/H-wide slice."""
    dh = d // num_heads
    m = np.zeros((num_heads, dp), np.float32)
    for h in range(num_heads):
        m[h, h * dh:(h + 1) * dh] = 1.0
    return m


def _attention_fwd_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, hm_ref,
                          o_ref, *, num_heads: int, scale: float,
                          block: int):
    """``block`` batch examples per program (amortizes grid overhead).

    q: [NB, Tqp, Dp], k/v: [NB, Tkp, Dp], qm: [NB, 1, Tqp],
    km: [NB, 1, Tkp], hm: [H, Dp] head masks, o: [NB, Tqp, Dp].
    """
    hm = hm_ref[:]          # [H, Dp]

    def one_example(i, _):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        qm = qm_ref[i]      # [1, Tqp]
        km = km_ref[i]      # [1, Tkp]
        acc = jnp.zeros(q.shape, jnp.float32)
        for h in range(num_heads):
            mask_h = hm[h][None, :]                   # [1, Dp]
            qh = q * mask_h
            scores = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [Tqp, Tkp]
            scores = jnp.where(km > 0, scores, NEG_INF)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            probs = probs * qm.reshape(-1, 1)         # query-zero rows
            vh = v * mask_h
            acc = acc + jnp.dot(probs.astype(v.dtype), vh,
                                preferred_element_type=jnp.float32)
        o_ref[i] = acc.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block, one_example, 0)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, hm_ref,
                          do_ref, dq_ref, dk_ref, dv_ref, *,
                          num_heads: int, scale: float, block: int):
    """Recompute probs per head, then chain rule; ``block`` examples per
    program.

    dprobs = do @ v_h^T;  dscores = probs * (dprobs - sum(dprobs*probs))
    dq_h = dscores @ k * scale (lanes masked); dk_h = dscores^T @ q_h * scale
    dv_h = probs^T @ do (lanes masked)
    """
    hm = hm_ref[:]

    def one_example(i, _):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        qm = qm_ref[i]
        km = km_ref[i]
        do = do_ref[i]
        dq = jnp.zeros(q.shape, jnp.float32)
        dk = jnp.zeros(k.shape, jnp.float32)
        dv = jnp.zeros(v.shape, jnp.float32)
        for h in range(num_heads):
            mask_h = hm[h][None, :]
            qh = q * mask_h
            scores = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(km > 0, scores, NEG_INF)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            pq = probs * qm.reshape(-1, 1)

            vh = v * mask_h
            # dprobs via do (only head-h lanes of do contribute)
            dprobs = jax.lax.dot_general(
                do, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Tqp, Tkp]
            dpq = dprobs * qm.reshape(-1, 1)
            # softmax backward on the un-query-masked probs
            dscores = probs * (dpq - jnp.sum(dpq * probs, axis=-1,
                                             keepdims=True))
            ds = dscores.astype(q.dtype)
            dq = dq + jnp.dot(ds, k, preferred_element_type=jnp.float32) \
                * scale * mask_h
            dk = dk + jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dv = dv + jax.lax.dot_general(
                pq.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * mask_h
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block, one_example, 0)


def _block_size(B: int) -> int:
    """Examples per program: amortize grid overhead, cap VMEM footprint."""
    for nb in (16, 8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


def _pallas_call_fwd(qp, kp, vp, qmp, kmp, hm, num_heads, scale, interpret):
    from jax.experimental import pallas as pl

    B, Tqp, Dp = qp.shape
    Tkp = kp.shape[1]
    nb = _block_size(B)
    kernel = functools.partial(_attention_fwd_kernel,
                               num_heads=num_heads, scale=scale, block=nb)
    return pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, Tqp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tqp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tkp), lambda b: (b, 0, 0)),
            pl.BlockSpec((num_heads, Dp), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, Tqp, Dp), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tqp, Dp), qp.dtype),
        interpret=interpret,
    )(qp, kp, vp, qmp, kmp, hm)


def _pallas_call_bwd(qp, kp, vp, qmp, kmp, hm, dop, num_heads, scale,
                     interpret):
    from jax.experimental import pallas as pl

    B, Tqp, Dp = qp.shape
    Tkp = kp.shape[1]
    nb = _block_size(B)
    kernel = functools.partial(_attention_bwd_kernel,
                               num_heads=num_heads, scale=scale, block=nb)
    return pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, Tqp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tqp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, 1, Tkp), lambda b: (b, 0, 0)),
            pl.BlockSpec((num_heads, Dp), lambda b: (0, 0)),
            pl.BlockSpec((nb, Tqp, Dp), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, Tqp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, Tkp, Dp), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tqp, Dp), qp.dtype),
            jax.ShapeDtypeStruct((B, Tkp, Dp), kp.dtype),
            jax.ShapeDtypeStruct((B, Tkp, Dp), vp.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, qmp, kmp, hm, dop)


def _make_padded_op(true_dh: int):
    """custom_vjp op closed over the true per-head dim (for the scale)."""
    scale = 1.0 / math.sqrt(true_dh)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
    def op(qp, kp, vp, qmp, kmp, hm, num_heads, interpret):
        return _pallas_call_fwd(qp, kp, vp, qmp, kmp, hm, num_heads, scale,
                                interpret)

    def fwd(qp, kp, vp, qmp, kmp, hm, num_heads, interpret):
        out = op(qp, kp, vp, qmp, kmp, hm, num_heads, interpret)
        return out, (qp, kp, vp, qmp, kmp, hm)

    def bwd(num_heads, interpret, res, do):
        qp, kp, vp, qmp, kmp, hm = res
        dq, dk, dv = _pallas_call_bwd(qp, kp, vp, qmp, kmp, hm, do,
                                      num_heads, scale, interpret)
        return (dq, dk, dv, jnp.zeros_like(qmp), jnp.zeros_like(kmp),
                jnp.zeros_like(hm))

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=16)
def _cached_op(true_dh: int):
    return _make_padded_op(true_dh)


def fused_attention(q, k, v, q_mask, k_mask, num_heads: int,
                    interpret: bool = False):
    """Drop-in for nn.transformer.attention_core (dropout-free path).

    q: [B, Tq, D]; k, v: [B, Tk, D]; masks [B, T] (1=present).
    Returns [B, Tq, D].
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    sublane = 16 if q.dtype == jnp.bfloat16 else 8  # dtype tile constraint
    Tqp, Tkp, Dp = _pad_to(Tq, sublane), _pad_to(Tk, sublane), _pad_to(D, 128)

    qp = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, Tkp - Tk), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, Dp - D)))
    # masks stay float32: Mosaic only supports minor-dim-inserting reshapes
    # (the [1,T] -> [T,1] broadcast inside the kernel) for 32-bit types
    qmp = jnp.pad(q_mask.astype(jnp.float32), ((0, 0), (0, Tqp - Tq)))[:, None, :]
    kmp = jnp.pad(k_mask.astype(jnp.float32), ((0, 0), (0, Tkp - Tk)))[:, None, :]

    hm = jnp.asarray(_head_masks(num_heads, D, Dp), q.dtype)
    op = _cached_op(D // num_heads)
    out = op(qp, kp, vp, qmp, kmp, hm, num_heads, interpret)
    return out[:, :Tq, :D]
