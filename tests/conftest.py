"""Test harness setup.

Runs everything on CPU with 8 virtual XLA devices so multi-chip sharding
paths (Mesh data x model) are exercised without TPU hardware, per the
multi-host test strategy in SURVEY.md §4.
"""

import os

# Force-override: the container exports JAX_PLATFORMS=axon (real TPU); tests
# must run on CPU with fake devices.  (When the axon chip claim is wedged,
# prefix pytest with `env -u PALLAS_AXON_POOL_IPS` so interpreter startup
# skips TPU registration entirely.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

REFERENCE = "/root/reference"
DEMO_DATA = os.path.join(
    REFERENCE, "jd_recsys_demo/2019-12-04_2019-12-04/test_ord/2019-12-19_2019-12-19/data")
IDTABLES = os.path.join(REFERENCE, "DMT_code/conf/idtables")

needs_demo_data = pytest.mark.skipif(
    not os.path.isdir(DEMO_DATA), reason="JD demo dataset not available")


@pytest.fixture(scope="session")
def demo_files():
    import glob
    return sorted(glob.glob(os.path.join(DEMO_DATA, "part-r-*")))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_demo_config(**overrides):
    """Config matching the JD demo data layout: the dmt.conf embedding spec
    with the ord_seq caps corrected to the shipped ``_12m_10`` names
    (SURVEY.md §2.4.9) and Sku shrunk for CPU-runnable tests."""
    from cikm2020_dmt_tpu.core.config import DMTConfig, parse_attention_pairs, parse_embedding_spec, parse_ts_features

    emb = (
        "Sku:100000:32:item_fea_sku:i#Cid2:500:8:item_c2:i#Cid3:12000:8:item_c3:i"
        "#Brand:190000:16:item_brand:i#Shopid:230000:16:item_shop:i"
        "#Sku:100000:32:clk_seq_sku_7d_50:u#TimeClick:24:8:clk_seq_ts_7d_50:u"
        "#Cid2:500:8:clk_seq_c2_7d_50:u#Cid3:12000:8:clk_seq_c3_7d_50:u"
        "#Brand:190000:16:clk_seq_brand_7d_50:u#Shopid:230000:16:clk_seq_shop_7d_50:u"
        "#Sku:100000:32:ord_seq_sku_12m_10:u#TimeOrder:24:8:ord_seq_ts_12m_10:u"
        "#Cid2:500:8:ord_seq_c2_12m_10:u#Cid3:12000:8:ord_seq_c3_12m_10:u"
        "#Brand:190000:16:ord_seq_brand_12m_10:u#Shopid:230000:16:ord_seq_shop_12m_10:u"
        "#Sku:100000:32:cart_seq_sku_12m_10:u#TimeCart:24:8:cart_seq_ts_12m_10:u"
        "#Cid2:500:8:cart_seq_c2_12m_10:u#Cid3:12000:8:cart_seq_c3_12m_10:u"
        "#Brand:190000:16:cart_seq_brand_12m_10:u#Shopid:230000:16:cart_seq_shop_12m_10:u"
    )
    attn = (
        "clk_seq_sku_7d_50:item_fea_sku#clk_seq_c2_7d_50:item_c2#clk_seq_c3_7d_50:item_c3"
        "#clk_seq_brand_7d_50:item_brand#clk_seq_shop_7d_50:item_shop"
        "|ord_seq_sku_12m_10:item_fea_sku#ord_seq_c2_12m_10:item_c2#ord_seq_c3_12m_10:item_c3"
        "#ord_seq_brand_12m_10:item_brand#ord_seq_shop_12m_10:item_shop"
        "|cart_seq_sku_12m_10:item_fea_sku#cart_seq_c2_12m_10:item_c2#cart_seq_c3_12m_10:item_c3"
        "#cart_seq_brand_12m_10:item_brand#cart_seq_shop_12m_10:item_shop"
    )
    emb_bias = ("Cid2:500:5:item_c2:i#Cid3:12000:5:item_c3:i"
                "#Cid2:500:5:near_expo_seq_c2:u#Cid3:12000:5:near_expo_seq_c3:u")
    ts = "clk_seq_ts_7d_50|ord_seq_ts_12m_10|cart_seq_ts_12m_10"

    kw = dict(
        embeddings=parse_embedding_spec(emb),
        embeddings_bias=parse_embedding_spec(emb_bias),
        attention_pairs=parse_attention_pairs(attn),
        attention_ts=parse_ts_features(ts),
        vocab_path=IDTABLES if os.path.isdir(IDTABLES) else "",
        validation_data_path=DEMO_DATA,
        test_data_path=DEMO_DATA,
        test_data_path_ord=DEMO_DATA,
        batch_size=32,
        test_batch_size=32,
        validation_batch_size=32,
    )
    kw.update(overrides)
    return DMTConfig(**kw)


@pytest.fixture(scope="session")
def demo_config():
    return make_demo_config()
