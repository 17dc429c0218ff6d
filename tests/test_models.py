"""Model-zoo tests: every model_type inits and runs forward on a real demo
batch; logit contracts match the reference's inference() returns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.data.pipeline import batch_stream
from cikm2020_dmt_tpu.models.components import (bias_combiner_dim,
                                                combiner_dim, interest_dim)
from cikm2020_dmt_tpu.models.zoo import (MODEL_REGISTRY, _register_baselines,
                                         build_model)

_register_baselines()
from cikm2020_dmt_tpu.train import losses

from conftest import DEMO_DATA, needs_demo_data, make_demo_config

B = 8


@pytest.fixture(scope="module")
def demo_batch():
    cfg = make_demo_config()
    batch = next(batch_stream(cfg, DEMO_DATA, batch_size=B, epochs=1))
    return {k: jnp.asarray(v) for k, v in batch.arrays.items()}


def _build(model_type, **overrides):
    cfg = make_demo_config(model_type=model_type, **overrides)
    return cfg, build_model(cfg)


@needs_demo_data
class TestZooForward:
    @pytest.mark.parametrize("model_type", sorted(MODEL_REGISTRY))
    def test_forward_shapes(self, model_type, demo_batch):
        cfg, model = _build(model_type)
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        if model_type == "mmoe_transformer_unbias":
            (clk, ordr), bias = out
            assert clk.shape == (B, 1) and ordr.shape == (B, 1)
            assert bias.shape == (B, 1)
            assert np.isfinite(np.asarray(bias)).all()
        elif model_type == "embed_mlp_unbias":
            clk, bias = out
            assert clk.shape == (B, 1) and bias.shape == (B, 1)
            assert np.isfinite(np.asarray(bias)).all()
        elif model.num_tasks == 2:
            clk, ordr = out
            assert clk.shape == (B, 1) and ordr.shape == (B, 1)
        else:
            assert out.shape == (B, 1)
            clk = out
        assert np.isfinite(np.asarray(clk)).all()

    def test_unbias_predict_mode_drops_bias_head(self, demo_batch):
        cfg, model = _build("mmoe_transformer_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False,
                             is_predict=True)
        clk, ordr = out  # rel-only pair, reference mmoe_transformer_unbias.py:312-316
        assert clk.shape == (B, 1) and ordr.shape == (B, 1)

    def test_train_mode_with_dropout_rng(self, demo_batch):
        cfg, model = _build("mmoe_transformer_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        out1, _ = model.apply(params, state, demo_batch, train=True,
                              rng=jax.random.PRNGKey(1))
        out2, _ = model.apply(params, state, demo_batch, train=True,
                              rng=jax.random.PRNGKey(2))
        # transformer + bias-net dropout are active in train mode
        (clk1, _), b1 = out1
        (clk2, _), b2 = out2
        assert not np.allclose(np.asarray(b1), np.asarray(b2))

    def test_loss_and_grads_finite(self, demo_batch):
        cfg, model = _build("mmoe_transformer_unbias")
        params, state = model.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            out, _ = model.apply(p, state, demo_batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.multi_task_unbias_loss(cfg, out, demo_batch["mask"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # the big sku table must receive gradient through both seq + pooled paths
        g_sku = grads["emb"]["Sku"]
        assert float(jnp.abs(g_sku).sum()) > 0

    def test_dims_consistency(self):
        cfg = make_demo_config()
        # 615 dense + 80 item-side + 3 x (80 seq + 8 ts) pooled = 959
        assert combiner_dim(cfg) == 615 + 80 + 3 * 88
        assert interest_dim(cfg) == 3 * 80
        assert bias_combiner_dim(cfg) == 20
        assert combiner_dim(cfg, skip_seq=True) == 615 + 80 + 3 * 8

    def test_unknown_model_type_raises(self):
        cfg = make_demo_config(model_type="nope")
        with pytest.raises(ValueError, match="unknown model_type"):
            build_model(cfg)


@needs_demo_data
class TestScores:
    def test_score_paths(self, demo_batch):
        cfg, model = _build("mmoe_transformer_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        p_ctr, p_cvr = losses.scores_from_logits(cfg, out)
        r_ctr, r_cvr = losses.scores_from_logits(cfg, out, rel_only=True)
        assert p_ctr.shape == (B,)
        (clk, ordr), bias = out
        np.testing.assert_allclose(
            np.asarray(p_ctr),
            1 / (1 + np.exp(-(np.asarray(clk) + np.asarray(bias)).reshape(-1))),
            rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(r_ctr),
            1 / (1 + np.exp(-np.asarray(clk).reshape(-1))), rtol=1e-5)


@needs_demo_data
class TestEmbedMLPUnbias:
    """embed_mlp_unbias: reference-dispatched (inference_mlp.py:33-35) but
    bytecode-only upstream; reconstructed as embed_mlp trunk + bias net."""

    def test_predict_mode_drops_bias_head(self, demo_batch):
        cfg, model = _build("embed_mlp_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False,
                             is_predict=True)
        assert out.shape == (B, 1)  # rel-only logit

    def test_loss_and_grads_finite(self, demo_batch):
        cfg, model = _build("embed_mlp_unbias")
        params, state = model.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            out, _ = model.apply(p, state, demo_batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.single_task_unbias_loss(
                cfg, out, demo_batch["mask"], demo_batch["label"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # bias net must receive gradient (biased-prob CE term)
        g_bias = jax.tree_util.tree_leaves(grads["bias_net"])
        assert sum(float(jnp.abs(g).sum()) for g in g_bias) > 0

    def test_scores_blend_and_rel_only(self, demo_batch):
        cfg, model = _build("embed_mlp_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        y_rel, y_bias = (np.asarray(t).reshape(-1) for t in out)
        p_ctr, p_cvr = losses.scores_from_logits(cfg, out)
        np.testing.assert_allclose(np.asarray(p_ctr),
                                   1 / (1 + np.exp(-(y_rel + y_bias))),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(p_ctr), np.asarray(p_cvr))
        r_ctr, _ = losses.scores_from_logits(cfg, out, rel_only=True)
        np.testing.assert_allclose(np.asarray(r_ctr),
                                   1 / (1 + np.exp(-y_rel)), rtol=1e-5)

    def test_trains_end_to_end(self, demo_batch, tmp_path):
        from cikm2020_dmt_tpu.train.loop import Trainer
        cfg = make_demo_config(model_type="embed_mlp_unbias",
                               output_path=str(tmp_path), batch_size=B)
        trainer = Trainer(cfg)
        vals = trainer.train(DEMO_DATA, max_steps=2)
        assert np.isfinite(vals["loss"])


@needs_demo_data
class TestRawLabelFidelity:
    def test_raw_label_switch_changes_loss(self, demo_batch):
        """cfg.single_task_raw_label feeds the raw 0..5 label into sigmoid
        CE exactly like the reference (inference_mlp.py:146-160)."""
        cfg_bin, model = _build("embed_mlp")
        cfg_raw = make_demo_config(model_type="embed_mlp",
                                   single_task_raw_label=True)
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        l_bin = losses.single_task_loss(cfg_bin, out, demo_batch["mask"],
                                        demo_batch["label"], train=True)
        l_raw = losses.single_task_loss(cfg_raw, out, demo_batch["mask"],
                                        demo_batch["label"], train=True)
        assert np.isfinite(float(l_bin)) and np.isfinite(float(l_raw))
        # demo batch contains ordered examples (label>1) so the raw-label
        # CE target differs from the binary click target
        labels = np.asarray(demo_batch["label"]).reshape(-1)
        if (labels > 1).any():
            assert float(l_bin) != float(l_raw)

    def test_raw_label_matches_manual_ce(self, demo_batch):
        cfg = make_demo_config(model_type="embed_mlp",
                               single_task_raw_label=True)
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        got = float(losses.single_task_loss(cfg, out, demo_batch["mask"],
                                            demo_batch["label"], train=True))
        z = np.asarray(out, np.float64).reshape(-1)
        y = np.asarray(demo_batch["label"], np.float64).reshape(-1)
        xent = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
        mask = np.asarray(demo_batch["mask"], np.float64)
        w = np.asarray(cfg.weight_vector(cfg.train_weight), np.float64)
        per_ex = (mask * w).sum(-1)
        # weighted_class_reduce: sum_c mean_b (mask[b,c] w[c] xent[b])
        want = float((xent * per_ex).sum() / mask.shape[0])
        np.testing.assert_allclose(got, want, rtol=1e-4)


@needs_demo_data
class TestGateIntrospection:
    def test_mmoe_gate_values(self, demo_batch):
        cfg, model = _build("mmoe_transformer_unbias")
        params, state = model.init(jax.random.PRNGKey(0))
        gates = model.gate_values(params, demo_batch)
        assert gates.shape == (2, B, cfg.num_experts)
        # softmax rows sum to 1
        np.testing.assert_allclose(np.asarray(gates).sum(-1),
                                   np.ones((2, B)), rtol=1e-5)


@needs_demo_data
class TestDinDienBytecodeParity:
    """Semantics reconstructed from the reference's bytecode-only modules
    (scripts/pyc36_dis.py over model/net/__pycache__/*.cpython-36.pyc)."""

    def test_din_raw_scores_become_sum_weights(self, demo_batch):
        """DIN pools attention-pair user features with its RAW scaled
        scores as sum-combiner weights (din.pyc embedding_din_weight_calc:
        no softmax; embedding_din: combiner_type='sum')."""
        from cikm2020_dmt_tpu.data.pipeline import IDS, LEN
        from cikm2020_dmt_tpu.models.baselines import (_group_embeddings,
                                                       din_attention_scores)
        from cikm2020_dmt_tpu.models.components import embedding_combiner

        cfg, model = _build("din")
        params, state = model.init(jax.random.PRNGKey(0))
        seq, tar, mask = _group_embeddings(params["emb"], demo_batch, cfg, 0,
                                           model.engine)
        y, _ = din_attention_scores(params["attn0"], {}, seq, tar,
                                    train=False)
        # scores differ across elements (not degenerate)
        assert float(jnp.std(y)) > 0

        user_feat = cfg.attention_pairs[0][0][0]
        spec = next(s for s in cfg.embeddings if s.feature == user_feat)
        grid = model.engine.seq(spec.table, params["emb"][spec.table],
                                demo_batch[user_feat + IDS], cfg.zero_pad)
        lens = demo_batch[user_feat + LEN]
        pos = np.arange(grid.shape[1])[None, :]
        m = (pos < np.asarray(lens)[:, None]).astype(np.float32)
        want = np.einsum("bl,bld->bd", np.asarray(y) * m, np.asarray(grid))

        override = {}
        for gi, grp in enumerate(cfg.attention_pairs):
            sq, tr, _ = _group_embeddings(params["emb"], demo_batch, cfg, gi,
                                          model.engine)
            yg, _ = din_attention_scores(params[f"attn{gi}"], {}, sq, tr,
                                         train=False)
            for u, _ in grp:
                override[u] = yg
        out = embedding_combiner(params["emb"], demo_batch, cfg,
                                 engine=model.engine, combiner="sum",
                                 wts_override=override)
        off = cfg.feature_dimension if cfg.is_use_feature else 0
        for s in cfg.embeddings:
            if s.feature == user_feat:
                break
            off += s.dim
        np.testing.assert_allclose(np.asarray(out)[:, off:off + spec.dim],
                                   want, rtol=1e-4, atol=1e-5)

    def test_gru_cell_tf_semantics(self):
        """TF GRUCell convention (dien_utils.pyc VecAttGRUCell.call):
        new_h = u*h + (1-u)*c with gate bias init 1.0; AUGRU scales
        u <- (1-att)*u, so att=1 forces new_h == candidate."""
        from cikm2020_dmt_tpu.models.baselines import _gru_cell, gru_init
        rng = jax.random.PRNGKey(7)
        p = gru_init(rng, 4, 3)
        assert np.allclose(np.asarray(p["gates"]["b"]), 1.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
        h = jax.random.normal(jax.random.PRNGKey(2), (2, 3))
        xh = np.concatenate([np.asarray(x), np.asarray(h)], -1)
        ru = 1 / (1 + np.exp(-(xh @ np.asarray(p["gates"]["w"]) + 1.0)))
        r, u = ru[:, :3], ru[:, 3:]
        xrh = np.concatenate([np.asarray(x), r * np.asarray(h)], -1)
        c = np.tanh(xrh @ np.asarray(p["cand"]["w"]))
        np.testing.assert_allclose(np.asarray(_gru_cell(p, h, x)),
                                   u * np.asarray(h) + (1 - u) * c,
                                   rtol=1e-5, atol=1e-6)
        att1 = jnp.ones((2,))
        np.testing.assert_allclose(np.asarray(_gru_cell(p, h, x, att1)), c,
                                   rtol=1e-5, atol=1e-6)

    def test_dien_attention_masked_softmax(self):
        from cikm2020_dmt_tpu.models.baselines import (dien_attention_apply,
                                                       dien_attention_init)
        p = dien_attention_init(jax.random.PRNGKey(0), q_dim=8, h=16)
        q = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
        f = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 16))
        mask = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]],
                           jnp.float32)
        a = np.asarray(dien_attention_apply(p, q, f, mask))
        np.testing.assert_allclose(a.sum(-1), np.ones(3), rtol=1e-5)
        assert (a[0, 2:] < 1e-6).all() and (a[2, 1:] < 1e-6).all()


class TestMMoEStackedParity:
    def test_stacked_matches_expert_loop(self):
        """The batched expert path must equal per-expert mlp_apply
        (same kernels, concatenated/stacked) with dropout off."""
        from cikm2020_dmt_tpu.models import components as C

        cfg = make_demo_config(is_dropout=False)
        assert not cfg.is_bn
        params, state = C.mmoe_init(jax.random.PRNGKey(3), 64, cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (16, 64))
        fast, _ = C.mmoe_apply(params, state, x, cfg, train=True)

        outs = []
        from cikm2020_dmt_tpu.nn.layers import dense_apply, mlp_apply
        exp = [mlp_apply(p, {}, x, train=True, is_bn=False,
                         is_dropout=False)[0] for p in params["experts"]]
        experts = jnp.stack(exp, axis=-1)
        for gate in params["gates"]:
            g = jax.nn.softmax(dense_apply(gate, x), axis=-1)
            outs.append(jnp.einsum("bhe,be->bh", experts, g))
        for a, b in zip(fast, outs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


@needs_demo_data
class TestBaselineGrads:
    @pytest.mark.parametrize("model_type", ["din", "dien"])
    def test_loss_and_grads_finite(self, model_type, demo_batch):
        cfg, model = _build(model_type)
        params, state = model.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            out, _ = model.apply(p, state, demo_batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.single_task_loss(cfg, out, demo_batch["mask"],
                                           demo_batch["label"], train=True)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # attention parameters receive gradient
        g_att = jax.tree_util.tree_leaves(grads["attn0"])
        assert sum(float(jnp.abs(g).sum()) for g in g_att) > 0
