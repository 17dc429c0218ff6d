"""NN-layer golden tests: pooling, attention, bucketing, losses, metrics —
validated against NumPy oracles replicating the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.core.config import DMTConfig, TransformerConfig
from cikm2020_dmt_tpu.metrics import streaming
from cikm2020_dmt_tpu.nn.embedding import (pooled_lookup, presence_mask,
                                           seq_lookup, ts_bucketize)
from cikm2020_dmt_tpu.nn.layers import (dense_apply, dense_init,
                                        layer_norm_apply, layer_norm_init,
                                        mlp_apply, mlp_init)
from cikm2020_dmt_tpu.nn.transformer import (attention_core, encode_decode,
                                             sincos_table, transformer_init)
from cikm2020_dmt_tpu.train import losses


class TestEmbedding:
    def test_pooled_mean_matches_oracle(self, rng):
        table = rng.normal(size=(20, 4)).astype(np.float32)
        ids = np.array([[1, 2, 3, 0], [5, 0, 0, 0]], np.int32)
        wts = np.array([[1.0, 2.0, 3.0, 0.0], [4.0, 0.0, 0.0, 0.0]], np.float32)
        lens = np.array([3, 1], np.int32)
        out = pooled_lookup(jnp.asarray(table), jnp.asarray(ids),
                            jnp.asarray(wts), jnp.asarray(lens))
        # oracle: embedding_lookup_sparse mean = sum(w*e)/sum(w) over present
        row0 = (1 * table[1] + 2 * table[2] + 3 * table[3]) / 6.0
        row1 = table[5]
        np.testing.assert_allclose(out, np.stack([row0, row1]), rtol=1e-6)

    def test_pooled_empty_row_is_zero(self, rng):
        table = rng.normal(size=(5, 3)).astype(np.float32)
        out = pooled_lookup(jnp.asarray(table),
                            jnp.zeros((1, 4), jnp.int32),
                            jnp.zeros((1, 4), jnp.float32),
                            jnp.zeros((1,), jnp.int32))
        np.testing.assert_array_equal(out, np.zeros((1, 3), np.float32))

    def test_seq_lookup_zero_pad(self, rng):
        table = rng.normal(size=(5, 3)).astype(np.float32)
        ids = jnp.asarray([[0, 2]], jnp.int32)
        out = seq_lookup(jnp.asarray(table), ids, zero_pad=True)
        np.testing.assert_array_equal(out[0, 0], np.zeros(3, np.float32))
        np.testing.assert_allclose(out[0, 1], table[2], rtol=1e-6)
        out2 = seq_lookup(jnp.asarray(table), ids, zero_pad=False)
        np.testing.assert_allclose(out2[0, 0], table[0], rtol=1e-6)

    def test_ts_bucketize(self):
        ts = jnp.asarray([[0, 1, 2, 3, 4, 1024, 10**9]], jnp.int32)
        out = np.asarray(ts_bucketize(ts, 24))
        # 0->0 (padding), 1->1 (log2(1)=0)+1, 2->2, 3->2, 4->3, 1024->11, huge->clip 23
        np.testing.assert_array_equal(out[0], [0, 1, 2, 2, 3, 11, 23])

    def test_presence_mask(self):
        wts = jnp.ones((2, 4), jnp.float32)
        lens = jnp.asarray([2, 0], jnp.int32)
        np.testing.assert_array_equal(
            presence_mask(wts, lens), [[1, 1, 0, 0], [0, 0, 0, 0]])


class TestTransformer:
    def test_sincos_formula(self):
        """Table must match the reference numpy formula
        (TransformerModel_util.py:259-265)."""
        E, L = 8, 10
        table = sincos_table(L, E)
        ref = np.array([[pos / np.power(10000, (i - i % 2) / E) for i in range(E)]
                        for pos in range(L)])
        ref[:, 0::2] = np.sin(ref[:, 0::2])
        ref[:, 1::2] = np.cos(ref[:, 1::2])
        np.testing.assert_allclose(table, ref.astype(np.float32), atol=1e-6)

    def test_attention_matches_reference_math(self, rng):
        """attention_core vs a literal transcription of the reference's
        scaled_dot_product_attention (key-mask -> softmax -> query-mask),
        including the concat-split head layout."""
        B, Tq, Tk, D, H = 3, 5, 7, 8, 2
        q = rng.normal(size=(B, Tq, D)).astype(np.float32)
        k = rng.normal(size=(B, Tk, D)).astype(np.float32)
        v = rng.normal(size=(B, Tk, D)).astype(np.float32)
        q_lens = np.array([5, 3, 1])
        k_lens = np.array([7, 4, 2])
        q_mask = (np.arange(Tq)[None] < q_lens[:, None]).astype(np.float32)
        k_mask = (np.arange(Tk)[None] < k_lens[:, None]).astype(np.float32)

        out = np.asarray(attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(q_mask), jnp.asarray(k_mask), H))

        # oracle per reference: heads = D-slices; scale = sqrt(dh)
        dh = D // H
        expect = np.zeros_like(out)
        for b in range(B):
            for h in range(H):
                sl = slice(h * dh, (h + 1) * dh)
                scores = q[b, :, sl] @ k[b, :, sl].T / np.sqrt(dh)
                scores = np.where(k_mask[b][None, :] > 0, scores, -2.0**32 + 1)
                e = np.exp(scores - scores.max(-1, keepdims=True))
                probs = e / e.sum(-1, keepdims=True)
                probs = probs * q_mask[b][:, None]   # our zeroing deviation
                expect[b, :, sl] = probs @ v[b, :, sl]
        # compare only valid query rows (garbage rows differ by design)
        for b in range(B):
            valid = int(q_lens[b])
            np.testing.assert_allclose(out[b, :valid], expect[b, :valid],
                                       rtol=2e-5, atol=2e-5)

    def test_encode_decode_shapes_and_padding_invariance(self, rng):
        """The interest state must not depend on values at padded positions."""
        tc = TransformerConfig(d_model=16, d_ff=32, num_heads=4, maxlen_k=10)
        key = jax.random.PRNGKey(0)
        params = transformer_init(key, tc)
        B, L = 4, 10
        seq = rng.normal(size=(B, L, 16)).astype(np.float32)
        tar = rng.normal(size=(B, 16)).astype(np.float32)
        lens = np.array([10, 5, 1, 3])
        mask = (np.arange(L)[None] < lens[:, None]).astype(np.float32)

        out1 = encode_decode(params, tc, seq_emb=jnp.asarray(seq),
                             seq_mask=jnp.asarray(mask), tar_emb=jnp.asarray(tar))
        assert out1.shape == (B, 16)
        assert np.isfinite(np.asarray(out1)).all()
        # scribble on padded positions -> identical output
        seq2 = seq.copy()
        for b in range(B):
            seq2[b, lens[b]:] = 999.0
        out2 = encode_decode(params, tc, seq_emb=jnp.asarray(seq2),
                             seq_mask=jnp.asarray(mask), tar_emb=jnp.asarray(tar))
        np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)

    def test_layer_norm_reference_eps(self, rng):
        x = rng.normal(size=(2, 6)).astype(np.float32)
        p = layer_norm_init(jax.random.PRNGKey(0), 6)
        out = np.asarray(layer_norm_apply(p, jnp.asarray(x)))
        ref = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestLosses:
    def test_weighted_class_reduce_matches_reference_reduction(self, rng):
        B, C = 6, 5
        xent = rng.random(B).astype(np.float32)
        mask = np.eye(C, dtype=np.float32)[rng.integers(0, C, B)]
        w = np.array([1.0, 15.0, 15.0, 400.0, 400.0], np.float32)
        got = losses.weighted_class_reduce(
            jnp.asarray(xent), jnp.asarray(mask), jnp.asarray(w))
        # reference: entropy_mat = (mask*w).T * xent; sum(mean(axis=1))
        expect = ((mask * w).T * xent).mean(axis=1).sum()
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_sigmoid_xent_matches_tf_formula(self):
        logits = jnp.asarray([-3.0, 0.0, 2.0, 10.0])
        labels = jnp.asarray([0.0, 1.0, 1.0, 0.0])
        got = np.asarray(losses.sigmoid_xent(logits, labels))
        l, z = np.asarray(logits), np.asarray(labels)
        expect = np.maximum(l, 0) - l * z + np.log1p(np.exp(-np.abs(l)))
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_task_label_derivation(self):
        # mask columns over classes [0,1,2,4,5]
        mask = jnp.asarray([
            [1, 0, 0, 0, 0],   # label 0: no click, no order
            [0, 1, 0, 0, 0],   # label 1: click
            [0, 0, 1, 0, 0],   # label 2: click
            [0, 0, 0, 1, 0],   # label 4: click + order
            [0, 0, 0, 0, 1],   # label 5: click + order
        ], jnp.float32)
        clk, ordr = losses.derive_task_labels(mask)
        np.testing.assert_array_equal(clk, [0, 1, 1, 1, 1])
        np.testing.assert_array_equal(ordr, [0, 0, 0, 1, 1])

    def test_unbias_two_head_add(self):
        cfg = DMTConfig(loss_unbias_method="two_head_add",
                        loss_ctr_rel_method="ctr_rel")
        clk = jnp.asarray([[0.5], [-1.0]])
        ordr = jnp.asarray([[0.2], [0.3]])
        bias = jnp.asarray([[0.1], [-0.2]])
        mask = jnp.asarray([[0, 0, 0, 0, 1], [1, 0, 0, 0, 0]], jnp.float32)
        got = float(losses.multi_task_unbias_loss(cfg, ((clk, ordr), bias), mask))

        def sig(x):
            return 1 / (1 + np.exp(-x))

        def ce(p, y):
            p = np.clip(np.where(y > 0.5, p, 1 - p), 1e-7, 1 - 1e-7)
            return -np.log(p)

        lc = np.array([1.0, 0.0])
        lo = np.array([1.0, 0.0])
        xc = ce(sig(np.array([0.6, -1.2])), lc) + ce(sig(np.array([0.5, -1.0])), lc)
        xo = ce(sig(np.array([0.3, 0.1])), lo) + ce(sig(np.array([0.2, 0.3])), lo)
        m = np.asarray(mask)
        w_ctr = np.array([1, 15, 15, 15, 15], np.float32)
        w_ecvr = np.array([1, 1, 1, 400, 400], np.float32)
        expect = ((m * w_ctr).T * xc).mean(1).sum() + ((m * w_ecvr).T * xo).mean(1).sum()
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_uncertainty_weighting(self):
        cfg = DMTConfig(loss_weight_method="uncertainty")
        unc = {"click_weight": jnp.asarray([0.5]),
               "order_weight": jnp.asarray([-0.3])}
        clk = jnp.zeros((2, 1))
        ordr = jnp.zeros((2, 1))
        mask = jnp.asarray([[1, 0, 0, 0, 0], [0, 1, 0, 0, 0]], jnp.float32)
        got = float(losses.multi_task_loss(cfg, (clk, ordr), mask, unc))
        base_c = float(losses.multi_task_loss(
            cfg.replace(loss_weight_method="fixed", loss_weight=(1.0, 0.0)),
            (clk, ordr), mask))
        base_o = float(losses.multi_task_loss(
            cfg.replace(loss_weight_method="fixed", loss_weight=(0.0, 1.0)),
            (clk, ordr), mask))
        expect = np.exp(-0.5) * base_c + 0.25 + np.exp(0.3) * base_o - 0.15
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestStreamingMetrics:
    def test_auc_matches_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score
        n = 4000
        labels = (rng.random(n) < 0.3).astype(np.float32)
        preds = np.clip(rng.random(n) * 0.6 + labels * 0.3, 0, 1).astype(np.float32)
        state = streaming.auc_init()
        # stream in 4 chunks
        for chunk in range(4):
            sl = slice(chunk * 1000, (chunk + 1) * 1000)
            state = streaming.auc_update(state, jnp.asarray(labels[sl]),
                                         jnp.asarray(preds[sl]),
                                         jnp.ones(1000, jnp.float32))
        got = float(streaming.auc_value(state))
        expect = roc_auc_score(labels, preds)
        assert abs(got - expect) < 0.005  # bucketed estimator tolerance

    def test_auc_histogram_equals_threshold_compare(self, rng):
        """The O(B log T) histogram update must produce exactly the same
        counters as the textbook [T, B] per-threshold comparison (the
        formulation it replaced for speed), including ties at 0/1 and
        fractional weights."""
        n = 512
        labels = (rng.random(n) < 0.3).astype(np.float32)
        preds = np.clip(rng.random(n) * 1.2 - 0.1, 0, 1).astype(np.float32)
        preds[:8] = [0.0, 1.0, 0.5, 1 / 199, 2 / 199, 0.999, 1e-8, 0.25]
        w = rng.random(n).astype(np.float32)
        got = streaming.auc_update(streaming.auc_init(),
                                   jnp.asarray(labels), jnp.asarray(preds),
                                   jnp.asarray(w))
        th = np.asarray(streaming._thresholds())
        pos = (labels > 0) * w
        neg = (labels <= 0) * w
        above = (preds[None, :] > th[:, None]).astype(np.float32)
        np.testing.assert_allclose(np.asarray(got["tp"]), above @ pos,
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["fp"]), above @ neg,
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["fn"]),
                                   (1 - above) @ pos, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["tn"]),
                                   (1 - above) @ neg, rtol=1e-5, atol=1e-4)

    def test_auc_nan_preds_count_above_all_thresholds(self):
        """searchsorted parity: NaN predictions (diverged runs) sort last,
        i.e. land in the top bucket — tp/fp at every threshold."""
        labels = jnp.asarray([1.0, 0.0, 1.0])
        preds = jnp.asarray([float("nan"), float("nan"), 0.5])
        got = streaming.auc_update(streaming.auc_init(), labels, preds,
                                   jnp.ones(3, jnp.float32))
        # the NaN positive counts as tp at EVERY threshold; the NaN
        # negative as fp at every threshold
        assert float(got["tp"].min()) >= 1.0
        assert float(got["fp"].min()) >= 1.0

    def test_precision_recall(self):
        labels = jnp.asarray([1, 1, 0, 0, 1], jnp.float32)
        preds = jnp.asarray([1, 0, 1, 0, 1], jnp.float32)
        st = streaming.prf_update(streaming.prf_init(), labels, preds,
                                  jnp.ones(5, jnp.float32))
        assert float(streaming.precision_value(st)) == pytest.approx(2 / 3)
        assert float(streaming.recall_value(st)) == pytest.approx(2 / 3)

    def test_weights_exclude_padded_rows(self):
        labels = jnp.asarray([1, 0, 1], jnp.float32)
        preds = jnp.asarray([1, 0, 1], jnp.float32)
        w = jnp.asarray([1, 1, 0], jnp.float32)  # last row padded
        st = streaming.prf_update(streaming.prf_init(), labels, preds, w)
        assert float(st["tp"]) == 1.0

    def test_mean(self):
        st = streaming.mean_init()
        for v in [1.0, 2.0, 3.0]:
            st = streaming.mean_update(st, jnp.asarray(v))
        assert float(streaming.mean_value(st)) == pytest.approx(2.0)


class TestMLPLayers:
    def test_mlp_shapes_and_dropout_off_in_eval(self, rng):
        cfgkey = jax.random.PRNGKey(7)
        params, state = mlp_init(cfgkey, 12, (8, 4), 1)
        x = jnp.asarray(rng.normal(size=(5, 12)).astype(np.float32))
        y1, _ = mlp_apply(params, state, x, train=False)
        y2, _ = mlp_apply(params, state, x, keep_probs=(0.5, 0.5),
                          train=True, is_dropout=True,
                          rng=jax.random.PRNGKey(1))
        assert y1.shape == (5, 1)
        # train w/ dropout differs from eval
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # eval deterministic
        y3, _ = mlp_apply(params, state, x, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))


class TestPackedTables:
    def test_pack_roundtrip(self, rng):
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.nn.embedding import (pack_factor, pack_table,
                                                   unpack_table)
        assert pack_factor(32) == 4
        assert pack_factor(16) == 8
        assert pack_factor(8) == 16
        assert pack_factor(5) == 1   # 128 % 5 != 0 -> unpacked
        assert pack_factor(128) == 1
        t = rng.normal(size=(103, 32)).astype(np.float32)  # non-multiple rows
        packed = pack_table(jnp.asarray(t))
        assert packed.shape == (26, 128)
        back = unpack_table(packed, 103, 32)
        np.testing.assert_array_equal(np.asarray(back), t)

    def test_select_packed(self, rng):
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.nn.embedding import select_packed
        grid = rng.normal(size=(6, 128)).astype(np.float32)
        slot = np.array([0, 3, 1, 2, 0, 3], np.int32)
        out = np.asarray(select_packed(jnp.asarray(grid), jnp.asarray(slot),
                                       4, 32))
        for i, s in enumerate(slot):
            np.testing.assert_array_equal(out[i], grid[i, s*32:(s+1)*32])
        # DMT_PACK_SELECT=slice (lane-slices + masked sum, dodges the
        # einsum's [N,p,d] relayout copies) is the same math
        import os
        os.environ["DMT_PACK_SELECT"] = "slice"
        try:
            out2 = np.asarray(select_packed(jnp.asarray(grid),
                                            jnp.asarray(slot), 4, 32))
        finally:
            del os.environ["DMT_PACK_SELECT"]
        np.testing.assert_array_equal(out2, out)

    def test_packed_model_matches_unpacked(self, rng):
        """Packing is a pure layout change: same seed -> identical logits."""
        import jax
        import jax.numpy as jnp
        import sys
        sys.path.insert(0, "tests")
        from conftest import DEMO_DATA, make_demo_config
        from cikm2020_dmt_tpu.data.pipeline import batch_stream
        from cikm2020_dmt_tpu.models.zoo import build_model
        outs = {}
        batch = None
        for packed in (False, True):
            cfg = make_demo_config(model_type="embed_mlp",
                                   packed_tables=packed,
                                   pack_rows_threshold=1000)
            if batch is None:
                b = next(batch_stream(cfg, DEMO_DATA, 8, epochs=1))
                batch = {k: jnp.asarray(v) for k, v in b.arrays.items()}
            model = build_model(cfg)
            params, state = model.init(jax.random.PRNGKey(7))
            out, _ = model.apply(params, state, batch, train=False)
            outs[packed] = np.asarray(out)
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5,
                                   atol=1e-6)
