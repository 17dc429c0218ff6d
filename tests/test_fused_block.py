"""Fused transformer-block kernel (ops/block.py) vs the per-op jnp path
(nn/transformer.encode_decode): values and gradients must match at DMT
shapes, dropout off (in-kernel PRNG dropout is a documented
randomness-stream deviation, tested separately for semantics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.core.config import TransformerConfig
from cikm2020_dmt_tpu.nn.transformer import encode_decode, transformer_init
from cikm2020_dmt_tpu.ops.block import fused_encode_decode


def _tc(**kw):
    base = dict(d_model=80, num_heads=4, d_ff=320, maxlen_k=50, maxlen_q=1,
                num_blocks_encode=1, num_blocks_decode=1, dropout_rate=0.0,
                position_encoding_method="position_sin_cos",
                is_decoder_add_pos_emb=False)
    base.update(kw)
    return TransformerConfig(**base)


def _case(rng, B, T, D, lens):
    seq = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    tar = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    mask = jnp.asarray((np.arange(T)[None] < np.asarray(lens)[:, None])
                       .astype(np.float32))
    return seq, tar, mask


def _paths(params, tc, seq, mask, tar):
    """(jnp-path output, fused-path output) for the same inputs."""
    os.environ["DMT_FUSED_BLOCK"] = "0"
    try:
        want = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                             tar_emb=tar, train=False)
    finally:
        os.environ["DMT_FUSED_BLOCK"] = "1"
    try:
        got = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                            tar_emb=tar, train=False)
    finally:
        del os.environ["DMT_FUSED_BLOCK"]
    return want, got


class TestFusedBlock:
    def test_production_shape(self, rng):
        """B x 50 x 80, 4 heads — the flagship DMT sequence shape."""
        tc = _tc()
        B, T, D = 8, 50, 80
        seq, tar, mask = _case(rng, B, T, D, [50, 17, 1, 33, 50, 2, 49, 8])
        params = transformer_init(jax.random.PRNGKey(0), tc)
        want, got = _paths(params, tc, seq, mask, tar)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_decoder_pos_emb(self, rng):
        tc = _tc(is_decoder_add_pos_emb=True)
        B, T, D = 4, 50, 80
        seq, tar, mask = _case(rng, B, T, D, [50, 10, 1, 25])
        params = transformer_init(jax.random.PRNGKey(1), tc)
        want, got = _paths(params, tc, seq, mask, tar)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_small_dim_odd_batch(self, rng):
        """Non-divisible batch (block size 1) and a small model dim."""
        tc = _tc(d_model=16, num_heads=2, d_ff=32, maxlen_k=10)
        B, T, D = 3, 10, 16
        seq, tar, mask = _case(rng, B, T, D, [10, 4, 7])
        params = transformer_init(jax.random.PRNGKey(2), tc)
        want, got = _paths(params, tc, seq, mask, tar)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_serving_batch_300(self, rng):
        """300-candidate rerank batch at flagship dims: B is not a
        multiple of 8, which Mosaic rejects for the [nb, D] operand
        blocks unless the wrapper pads the batch to the 32-example block
        (caught live by bench_serve on TPU, round 3).  Values must match
        the jnp path on the real rows."""
        tc = _tc()
        B, T, D = 300, 50, 80
        lens = list(1 + (np.arange(B) * 7) % 50)
        seq, tar, mask = _case(rng, B, T, D, lens)
        params = transformer_init(jax.random.PRNGKey(5), tc)
        want, got = _paths(params, tc, seq, mask, tar)
        assert got.shape == (B, D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match(self, rng):
        """Recompute backward vs autodiff through the jnp path: grads wrt
        inputs AND every weight tensor."""
        tc = _tc(d_model=16, num_heads=2, d_ff=32, maxlen_k=10)
        B, T, D = 4, 10, 16
        seq, tar, mask = _case(rng, B, T, D, [10, 4, 7, 10])
        params = transformer_init(jax.random.PRNGKey(3), tc)
        tgt = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def loss(params, seq, tar, fused):
            os.environ["DMT_FUSED_BLOCK"] = "1" if fused else "0"
            try:
                out = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                                    tar_emb=tar, train=False)
            finally:
                del os.environ["DMT_FUSED_BLOCK"]
            return jnp.sum((out - tgt) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(params, seq, tar, False)
        g_ker = jax.grad(loss, argnums=(0, 1, 2))(params, seq, tar, True)
        flat_ref, tdef = jax.tree.flatten(g_ref)
        flat_ker, _ = jax.tree.flatten(g_ker)
        paths = [str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(g_ref)[0]]
        for path, a, b in zip(paths, flat_ref, flat_ker):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-4,
                err_msg=path)

    def test_save_variant_bit_exact(self, rng):
        """DMT_BLOCK_SAVE=1 (fwd emits Q/K/V/ctx_e; bwd skips the encoder
        projection+attention replay) must be BIT-exact vs full recompute:
        the saved values are exactly what the replay feeds the same ops
        (Q/K/V stored in compute dtype, ctx_e in f32)."""
        tc = _tc(dropout_rate=0.2)
        B, T, D = 8, 50, 80
        seq, tar, mask = _case(rng, B, T, D, [50, 3, 17, 1, 50, 25, 8, 42])
        params = transformer_init(jax.random.PRNGKey(7), tc)
        key = jax.random.key(3, impl="rbg")

        def loss(p):
            os.environ["DMT_FUSED_BLOCK"] = "1"
            try:
                out = encode_decode(p, tc, seq_emb=seq, seq_mask=mask,
                                    tar_emb=tar, train=True, rng=key)
            finally:
                del os.environ["DMT_FUSED_BLOCK"]
            return jnp.sum(jnp.sin(out))

        res = {}
        for flag in ("0", "1"):
            os.environ["DMT_BLOCK_SAVE"] = flag
            try:
                res[flag] = jax.value_and_grad(loss)(params)
            finally:
                del os.environ["DMT_BLOCK_SAVE"]
        assert float(res["0"][0]) == float(res["1"][0])
        for a, b in zip(jax.tree_util.tree_leaves(res["0"][1]),
                        jax.tree_util.tree_leaves(res["1"][1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bwd_block_size_override(self, rng):
        """DMT_BLOCK_NB_BWD: the backward kernel may run a different
        block size than the forward (different VMEM envelopes).  With
        dropout off the gradients must be bit-identical to the default
        split; the dropout-active mask invariance (example-chunked PRNG
        seeding) is hardware-verified in scripts/block_nb_verify_tpu.py
        because the Mosaic CPU interpreter's PRNG returns constant
        bits."""
        tc = _tc()
        B, T, D = 64, 50, 80
        lens = list(1 + (np.arange(B) * 11) % 50)
        seq, tar, mask = _case(rng, B, T, D, lens)
        params = transformer_init(jax.random.PRNGKey(9), tc)
        tgt = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def loss(params, seq, tar):
            os.environ["DMT_FUSED_BLOCK"] = "1"
            try:
                out = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                                    tar_emb=tar, train=False)
            finally:
                del os.environ["DMT_FUSED_BLOCK"]
            return jnp.sum((out - tgt) ** 2)

        grads = {}
        for nb_bwd in ("", "16", "32"):
            os.environ["DMT_BLOCK_NB_BWD"] = nb_bwd
            try:
                grads[nb_bwd] = jax.grad(loss, argnums=(0, 1, 2))(
                    params, seq, tar)
            finally:
                del os.environ["DMT_BLOCK_NB_BWD"]
        for nb_bwd in ("16", "32"):
            # not bit-exact: the [nb*Tp, D] dot M-dim changes with the
            # block size and the matmul backend's blocking with it
            # (measured ~1e-6 max abs on CPU interpret); weight grads
            # additionally sum per-block partials in a different order
            for a, b in zip(jax.tree_util.tree_leaves(grads[""]),
                            jax.tree_util.tree_leaves(grads[nb_bwd])):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=2e-3, atol=1e-4)

    def test_dropout_semantics(self, rng):
        """In-kernel dropout: deterministic per seed, differs across seeds,
        keeps tf scaling (mean approximately preserved), and backward
        regenerates the same masks (grad is finite + deterministic)."""
        tc = _tc(d_model=16, num_heads=2, d_ff=32, maxlen_k=10,
                 dropout_rate=0.3)
        B, T, D = 4, 10, 16
        seq, tar, mask = _case(rng, B, T, D, [10, 10, 10, 10])
        params = transformer_init(jax.random.PRNGKey(4), tc)
        # plain HLO interpret can't run the TPU PRNG primitives; the Mosaic
        # TPU interpreter can
        from jax.experimental.pallas import tpu as pltpu
        tpu_interp = pltpu.InterpretParams()

        def run(key):
            return fused_encode_decode(
                params["enc"][0], params["dec"][0], enc_in=seq, dec_in=tar,
                seq_mask=mask, num_heads=tc.num_heads, dropout=0.3,
                train=True, rng=key, interpret=tpu_interp)

        a1 = run(jax.random.PRNGKey(7))
        a2 = run(jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        if jax.default_backend() == "tpu":
            # the Mosaic CPU interpreter's prng_random_bits returns all
            # zeros (verified 2026-08); seed sensitivity is TPU-only
            b = run(jax.random.PRNGKey(8))
            assert not np.allclose(np.asarray(a1), np.asarray(b))

        def loss(seq):
            out = fused_encode_decode(
                params["enc"][0], params["dec"][0], enc_in=seq, dec_in=tar,
                seq_mask=mask, num_heads=tc.num_heads, dropout=0.3,
                train=True, rng=jax.random.PRNGKey(7), interpret=tpu_interp)
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss)(seq)
        g2 = jax.grad(loss)(seq)
        assert np.isfinite(np.asarray(g1)).all()
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_shard_map_multichip(self, rng):
        """The shard_map wrapper (batch over the data axis, replicated
        weights): values and every weight/input grad must match the
        single-device fused path — this is what validates the multi-chip
        fused-block deployment (weight-grad psum via shard_map AD)."""
        from jax.sharding import Mesh
        from cikm2020_dmt_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
        devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
        tc = _tc(d_model=16, num_heads=2, d_ff=32, maxlen_k=10)
        B, T, D = 8, 10, 16
        seq, tar, mask = _case(rng, B, T, D, [10, 4, 7, 10, 1, 3, 9, 10])
        params = transformer_init(jax.random.PRNGKey(6), tc)
        tgt = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def loss(params, seq, tar, use_mesh):
            out = fused_encode_decode(
                params["enc"][0], params["dec"][0], enc_in=seq, dec_in=tar,
                seq_mask=mask, num_heads=tc.num_heads, dropout=0.0,
                train=False, interpret=True,
                mesh=mesh if use_mesh else None)
            return jnp.sum((out - tgt) ** 2), out

        (l0, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                          has_aux=True)(
            params, seq, tar, False)
        (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                          has_aux=True)(
            params, seq, tar, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=2e-5, atol=2e-5)
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0][0:999],
                jax.tree_util.tree_flatten_with_path(g1)[0]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-4,
                                       err_msg=str(p))

    def test_bf16_inputs(self, rng):
        """bf16 activations in/out, f32 math inside."""
        tc = _tc()
        B, T, D = 4, 50, 80
        seq, tar, mask = _case(rng, B, T, D, [50, 10, 1, 25])
        params = transformer_init(jax.random.PRNGKey(5), tc)
        want = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                             tar_emb=tar, train=False)
        os.environ["DMT_FUSED_BLOCK"] = "1"
        try:
            got = encode_decode(params, tc,
                                seq_emb=seq.astype(jnp.bfloat16),
                                seq_mask=mask,
                                tar_emb=tar.astype(jnp.bfloat16),
                                train=False)
        finally:
            del os.environ["DMT_FUSED_BLOCK"]
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(want), rtol=0.1, atol=0.1)
