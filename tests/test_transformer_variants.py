"""Transformer-config variant coverage: every position-encoding method,
input/output MLP options, and the sim-embed similarity crosses —
the reference's config degrees of freedom (dmt.conf:41-56, 125)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.core.config import TransformerConfig
from cikm2020_dmt_tpu.models.components import combiner_dim
from cikm2020_dmt_tpu.models.zoo import build_model
from cikm2020_dmt_tpu.data.pipeline import batch_stream

from conftest import DEMO_DATA, needs_demo_data, make_demo_config

B = 8


@pytest.fixture(scope="module")
def demo_batch():
    cfg = make_demo_config()
    batch = next(batch_stream(cfg, DEMO_DATA, batch_size=B, epochs=1))
    return {k: jnp.asarray(v) for k, v in batch.arrays.items()}


def _run(demo_batch, **tc_kw):
    overrides = tc_kw.pop("overrides", {})
    base = dict(d_model=80, d_ff=160, num_heads=4, maxlen_k=50)
    base.update(tc_kw)
    cfg = make_demo_config(
        model_type="mmoe_transformer",
        transformer=TransformerConfig(**base),
        **overrides)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    out, _ = model.apply(params, state, demo_batch, train=False)
    clk, ordr = out
    assert clk.shape == (B, 1)
    assert np.isfinite(np.asarray(clk)).all()
    assert np.isfinite(np.asarray(ordr)).all()
    return cfg, params


@needs_demo_data
class TestPositionEncodings:
    @pytest.mark.parametrize("method", [
        "position_sin_cos", "position_learn", "time_add", "time_concat",
        "none"])
    def test_methods_forward(self, demo_batch, method):
        cfg, params = _run(demo_batch, position_encoding_method=method)
        trans = params["trans"]["seq0"]
        if method == "position_learn":
            assert "pos_learn" in trans
        elif method in ("time_add", "time_concat"):
            assert "ts_proj" in trans
        else:
            assert "pos_learn" not in trans and "ts_proj" not in trans

    def test_methods_differ(self, demo_batch):
        outs = {}
        for method in ("position_sin_cos", "position_learn", "none"):
            cfg = make_demo_config(
                model_type="mmoe_transformer",
                transformer=TransformerConfig(
                    d_model=80, d_ff=160, num_heads=4, maxlen_k=50,
                    position_encoding_method=method))
            model = build_model(cfg)
            params, state = model.init(jax.random.PRNGKey(0))
            out, _ = model.apply(params, state, demo_batch, train=False)
            outs[method] = np.asarray(out[0])
        assert not np.allclose(outs["position_sin_cos"], outs["none"])


@needs_demo_data
class TestTransformerMLPOptions:
    def test_input_by_mlp(self, demo_batch):
        _run(demo_batch, is_trans_input_by_mlp=True, d_model=64)

    def test_out_concat_item(self, demo_batch):
        cfg, _ = _run(demo_batch, is_trans_out_concat_item=True)
        from cikm2020_dmt_tpu.models.components import interest_dim
        assert interest_dim(cfg) == 3 * (80 + 80)

    def test_out_concat_item_with_mlp(self, demo_batch):
        _run(demo_batch, is_trans_out_concat_item=True,
             is_trans_out_by_mlp=True)

    def test_decoder_pos_emb(self, demo_batch):
        _run(demo_batch, is_decoder_add_pos_emb=True)

    def test_two_encoder_blocks(self, demo_batch):
        _run(demo_batch, num_blocks_encode=2, num_blocks_decode=2)


@needs_demo_data
class TestSimEmbed:
    def test_similarity_crosses(self, demo_batch):
        # cross item sku against click-seq pooled sku (plausible pairing)
        cfg = make_demo_config(
            model_type="embed_mlp",
            sim_embed=(("item_fea_sku", "clk_seq_sku_7d_50"),))
        # combiner gains inner + cosine + |diff| + diff^2 = 2 + 2*32 dims
        base = combiner_dim(make_demo_config(model_type="embed_mlp"))
        assert combiner_dim(cfg) == base + 2 + 2 * 32
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, state, demo_batch, train=False)
        assert out.shape == (B, 1)
        assert np.isfinite(np.asarray(out)).all()
