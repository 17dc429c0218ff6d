"""Pallas kernel tests (interpret mode on CPU): the fused attention kernel
must match the jnp reference (nn/transformer.attention_core) in both values
and gradients, at DMT shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.nn.transformer import attention_core
from cikm2020_dmt_tpu.ops.attention import fused_attention


def _case(rng, B, Tq, Tk, D, qlens, klens):
    q = jnp.asarray(rng.normal(size=(B, Tq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Tk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Tk, D)).astype(np.float32))
    qm = jnp.asarray((np.arange(Tq)[None] < np.asarray(qlens)[:, None])
                     .astype(np.float32))
    km = jnp.asarray((np.arange(Tk)[None] < np.asarray(klens)[:, None])
                     .astype(np.float32))
    return q, k, v, qm, km


class TestFusedAttention:
    def test_dmt_encoder_shape(self, rng):
        """The production shape: B x 50 x 80, 4 heads."""
        B, T, D, H = 4, 50, 80, 4
        q, k, v, qm, km = _case(rng, B, T, T, D,
                                [50, 17, 1, 33], [50, 17, 1, 33])
        want = attention_core(q, k, v, qm, km, H)
        got = fused_attention(q, k, v, qm, km, H, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_dmt_decoder_shape(self, rng):
        """Cross-attention: length-1 target query over 50 keys."""
        B, D, H = 4, 80, 4
        q, k, v, qm, km = _case(rng, B, 1, 50, D,
                                [1, 1, 1, 1], [50, 8, 2, 25])
        want = attention_core(q, k, v, qm, km, H)
        got = fused_attention(q, k, v, qm, km, H, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference(self, rng):
        B, T, D, H = 3, 10, 16, 4
        q, k, v, qm, km = _case(rng, B, T, T, D, [10, 4, 7], [10, 4, 7])
        tgt = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))

        def loss_ref(q, k, v):
            return jnp.sum((attention_core(q, k, v, qm, km, H) - tgt) ** 2
                           * qm[..., None])

        def loss_ker(q, k, v):
            return jnp.sum(
                (fused_attention(q, k, v, qm, km, H, interpret=True) - tgt)
                ** 2 * qm[..., None])

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g_ref, g_ker):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"d{name}")

    def test_jit_compatible(self, rng):
        B, T, D, H = 2, 10, 16, 2
        q, k, v, qm, km = _case(rng, B, T, T, D, [10, 5], [10, 5])

        @jax.jit
        def f(q, k, v):
            return fused_attention(q, k, v, qm, km, H, interpret=True)

        out = f(q, k, v)
        assert out.shape == (B, T, D)
        assert np.isfinite(np.asarray(out)).all()

    def test_fully_masked_keys_row(self, rng):
        """A row with zero valid keys must produce finite output."""
        B, T, D, H = 2, 8, 8, 2
        q, k, v, qm, km = _case(rng, B, T, T, D, [8, 8], [8, 0])
        out = fused_attention(q, k, v, qm, km, H, interpret=True)
        assert np.isfinite(np.asarray(out)).all()
