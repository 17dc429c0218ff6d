"""Config DSL tests (reference recsys_conf.py / util.py parsers)."""

import os

from cikm2020_dmt_tpu.core.config import (
    DMTConfig, feature_max_len, parse_attention_pairs, parse_class_weights,
    parse_embedding_spec, parse_ts_features)

CONF = os.path.join(os.path.dirname(__file__), "..", "conf", "dmt.conf")


def test_embedding_spec_dsl():
    specs = parse_embedding_spec("Sku:5000000:32:item_fea_sku:i#Cid2:500:8:clk_seq_c2_7d_50:u")
    assert specs[0].table == "Sku"
    assert specs[0].id_size == 5_000_000
    assert specs[0].dim == 32
    assert specs[0].side == "i"
    assert specs[1].feature == "clk_seq_c2_7d_50"
    assert specs[1].side == "u"
    assert parse_embedding_spec("") == ()


def test_attention_pairs_dsl():
    groups = parse_attention_pairs("a:x#b:y|c:x")
    assert groups == ((("a", "x"), ("b", "y")), (("c", "x"),))
    assert parse_ts_features("t1|t2") == ("t1", "t2")
    assert parse_ts_features("") == ()


def test_class_weights_sorted_by_label():
    # reference util.py:132-144 sorts by label
    w = parse_class_weights("5:400.0,0:1.0,1:15.0,4:400.0,2:15.0")
    assert [l for l, _ in w] == [0, 1, 2, 4, 5]
    assert [x for _, x in w] == [1.0, 15.0, 15.0, 400.0, 400.0]


def test_feature_max_len():
    assert feature_max_len("clk_seq_sku_7d_50") == 50
    assert feature_max_len("cart_seq_sku_12m_10") == 10
    assert feature_max_len("item_c2") == 1
    assert feature_max_len("near_expo_seq_c2", default=10) == 10


def test_label_derivation():
    cfg = DMTConfig()
    assert cfg.labels == (0, 1, 2, 4, 5)
    assert cfg.num_label_classes == 5
    assert cfg.is_unbias_model
    assert cfg.is_transformer_model
    assert cfg.is_multi_task
    assert cfg.weight_vector(cfg.weight_ctr) == (1.0, 15.0, 15.0, 15.0, 15.0)
    assert cfg.weight_vector(cfg.weight_ecvr) == (1.0, 1.0, 1.0, 400.0, 400.0)


def test_recompute_max_steps():
    cfg = DMTConfig(epoch_num=2, batch_size=100, max_iter_step=10_000_000)
    cfg2 = cfg.recompute_max_steps((900, 100), num_replicas=2)
    # 2 epochs * 1000 examples / (100 * 2) = 10 steps
    assert cfg2.max_iter_step == 10
    assert cfg2.total_example_num == 1000


def test_from_ini_full_conf():
    cfg = DMTConfig.from_ini(CONF)
    assert cfg.model_type == "mmoe_transformer_unbias"
    assert cfg.feature_dimension == 615
    assert cfg.hidden_units_bottom == (512, 256, 128)
    assert cfg.hidden_units_bias == (32, 16)
    assert cfg.num_experts == 4
    assert cfg.transformer.d_model == 80
    assert cfg.transformer.num_heads == 4
    assert cfg.transformer.maxlen_k == 50
    assert cfg.transformer.position_encoding_method == "position_learn"
    assert cfg.loss_unbias_method == "two_head_add"
    assert cfg.loss_ctr_rel_method == "ctr_rel"
    assert len(cfg.embeddings) == 23
    assert len(cfg.embeddings_bias) == 4
    assert len(cfg.attention_pairs) == 3
    assert all(len(g) == 5 for g in cfg.attention_pairs)
    assert cfg.attention_ts == (
        "clk_seq_ts_7d_50", "ord_seq_ts_12m_50", "cart_seq_ts_12m_10")
    assert cfg.learning_rate == (0.001, 0.0001)
    assert cfg.step_boundary == (300_000_000,)
    assert cfg.zero_pad is True
    assert cfg.tag == "dmt"


def test_config_is_hashable_static_arg():
    # must be usable as a static argument of a jitted function
    cfg = DMTConfig.from_ini(CONF)
    assert hash(cfg) == hash(DMTConfig.from_ini(CONF))
