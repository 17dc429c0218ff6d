"""Serving-export tests: normalization math, u-side tiling, bundle
round-trip, blended Scores."""

import os

import jax
import numpy as np
import pytest

from cikm2020_dmt_tpu.core.checkpoint import CheckpointManager
from cikm2020_dmt_tpu.data.pipeline import IDS, LEN, WTS
from cikm2020_dmt_tpu.serve.export import (ServingPreprocessor, Scorer,
                                           export_model, load_scorer,
                                           norm_constants, normalize_dense,
                                           read_stat_vector)
from cikm2020_dmt_tpu.train.loop import Trainer

from conftest import DEMO_DATA, REFERENCE, needs_demo_data, make_demo_config

MEAN = os.path.join(REFERENCE, "jd_recsys_demo/stat/mean/part-00000")
STD = os.path.join(REFERENCE, "jd_recsys_demo/stat/std/part-00000")


class TestNormalization:
    def test_norm_constants_formula(self):
        mean = np.array([1.0, 0.5], np.float64)
        std = np.array([2.0, 0.1], np.float64)
        scale, const = norm_constants(mean, std)
        eps = 1e-7
        want_scale = std / (3 * (std + eps) ** 2)
        want_const = (mean * std / (3 * (std + eps) ** 2)
                      + mean * std / (std + eps) - mean)
        np.testing.assert_allclose(scale, want_scale.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(const, want_const.astype(np.float32), rtol=1e-6)

    def test_normalize_clips(self):
        scale = np.ones(3, np.float32)
        const = np.zeros(3, np.float32)
        import jax.numpy as jnp
        out = np.asarray(normalize_dense(
            jnp.asarray([-5.0, 0.5, 100.0]), jnp.asarray(scale),
            jnp.asarray(const)))
        # negative raw clipped to 0 first; output clipped to +-0.99
        np.testing.assert_allclose(out, [0.0, 0.5, 0.99], rtol=1e-6)

    @needs_demo_data
    def test_reads_demo_stat_files(self):
        mean = read_stat_vector(MEAN, 615)
        std = read_stat_vector(STD, 615)
        assert mean.shape == (615,) and std.shape == (615,)
        scale, const = norm_constants(mean, std)
        assert np.isfinite(scale).all() and np.isfinite(const).all()


@needs_demo_data
class TestServingPreprocessor:
    def test_uside_tiled_iside_per_row(self):
        cfg = make_demo_config()
        prep = ServingPreprocessor(cfg)
        batch = prep.assemble(
            batch_size=3,
            id_values={
                "clk_seq_sku_7d_50": [b"24741889990", b"31802870586"],
                "item_fea_sku": [b"1", b"2", b"3"],
            })
        # u-side sequence identical across rows
        assert (batch["clk_seq_sku_7d_50" + IDS][0]
                == batch["clk_seq_sku_7d_50" + IDS][2]).all()
        assert batch["clk_seq_sku_7d_50" + LEN].tolist() == [2, 2, 2]
        # i-side: one id per row
        assert batch["item_fea_sku" + LEN].tolist() == [1, 1, 1]
        ids = batch["item_fea_sku" + IDS][:, 0]
        assert len(set(ids.tolist())) == 3

    def test_ts_feature_raw_ints(self):
        cfg = make_demo_config()
        prep = ServingPreprocessor(cfg)
        batch = prep.assemble(2, {"clk_seq_ts_7d_50": [b"1024", b"notanum"]})
        assert batch["clk_seq_ts_7d_50" + IDS][0, 0] == 1024
        assert batch["clk_seq_ts_7d_50" + IDS][0, 1] == 0

    def test_native_lookup_matches_python(self):
        """The C dmt_lookup_batch request path and the python VocabSet
        path must produce identical assembled batches (vocab hit, OOV
        bucket, FNV-hash table, ts raw ints, partial weights)."""
        cfg = make_demo_config()
        nat = ServingPreprocessor(cfg)
        py = ServingPreprocessor(cfg, use_native=False)
        assert nat._native is not None and py._native is None
        req = dict(
            id_values={
                "clk_seq_sku_7d_50": [b"24741889990", b"no-such-sku-xyz"],
                "clk_seq_c3_7d_50": [b"9728", b"1349", b"zz-oov"],
                "clk_seq_ts_7d_50": [b"77", b"bad"],
                "item_fea_sku": [b"1", b"2", b"3"],
                "item_c3": [b"9728", b"definitely-oov", b"1349"],
            },
            id_wts={"clk_seq_c3_7d_50": [0.5]},  # shorter than ids -> pad 1.0
        )
        a = nat.assemble(3, **req)
        b = py.assemble(3, **req)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@needs_demo_data
class TestExportRoundtrip:
    def test_export_and_score(self, tmp_path):
        cfg = make_demo_config(
            model_type="mmoe_transformer_unbias", batch_size=16,
            validate_step=2, output_path=str(tmp_path),
            train_data_mean_path=MEAN, train_data_std_path=STD,
            epoch_num=1)
        Trainer(cfg).train(data_path=DEMO_DATA, max_steps=2, log_every=100)
        export_dir = export_model(cfg, 2)
        assert os.path.exists(os.path.join(export_dir, "descriptor.json"))

        scorer = load_scorer(cfg, export_dir)
        prep = ServingPreprocessor(cfg)
        B = 4
        batch_ids = {
                "item_fea_sku": [b"1", b"2", b"3", b"4"],
                "item_c2": [b"1584"] * B,
                "item_c3": [b"13760"] * B,
                "item_brand": [b"184144"] * B,
                "item_shop": [b"753023"] * B,
                "near_expo_seq_c2": [b"1583", b"1584"],
                "near_expo_seq_c3": [b"1593", b"13790"],
                "clk_seq_sku_7d_50": [b"24741889990"],
                "clk_seq_c2_7d_50": [b"5019"],
                "clk_seq_c3_7d_50": [b"15053"],
                "clk_seq_brand_7d_50": [b"211780"],
                "clk_seq_shop_7d_50": [b"207685"],
                "clk_seq_ts_7d_50": [b"134638"],
                "ord_seq_sku_12m_10": [b"48221645792"],
                "ord_seq_c2_12m_10": [b"1583"],
                "ord_seq_c3_12m_10": [b"1595"],
                "ord_seq_brand_12m_10": [b"276817"],
                "ord_seq_shop_12m_10": [b"138899"],
                "ord_seq_ts_12m_10": [b"1467275"],
                "cart_seq_sku_12m_10": [b"34560285023"],
                "cart_seq_c2_12m_10": [b"1346"],
                "cart_seq_c3_12m_10": [b"12023"],
                "cart_seq_brand_12m_10": [b"235028"],
                "cart_seq_shop_12m_10": [b"647108"],
                "cart_seq_ts_12m_10": [b"6648465"],
        }
        batch_raw = np.abs(np.random.default_rng(0).normal(
            size=(B, 615))).astype(np.float32)
        batch = prep.assemble(B, id_values=batch_ids,
                              raw_features=batch_raw)
        out = scorer(batch)
        assert out["Scores"].shape == (B,)
        assert np.isfinite(out["Scores"]).all()
        assert (out["Scores"] >= 0).all() and (out["Scores"] <= 1).all()
        # blended score formula (export_model.py:109-115)
        w = cfg.export_weight
        want = (w[0] * out["click_Scores"] + w[1] * out["order_Scores"]) / sum(w)
        np.testing.assert_allclose(out["Scores"], want, rtol=1e-6)

        # device-tiled request path ([1, L] u-side rows broadcast in-graph,
        # reference export_model.py:58-99) scores identically
        untiled = prep.assemble(
            B, id_values=batch_ids, raw_features=batch_raw,
            tile_uside=False)
        for f in prep.schema.id_features:
            if f.side == "u":
                assert untiled[f.name + IDS].shape[0] == 1
        out2 = scorer(untiled)
        np.testing.assert_allclose(out2["Scores"], out["Scores"], rtol=1e-6)

        # async dispatch returns the same scores (device arrays)
        out3 = scorer.score_async(untiled)
        np.testing.assert_allclose(np.asarray(out3["Scores"]),
                                   out["Scores"], rtol=1e-6)

        # grouped multi-user scoring: two DIFFERENT requests in one
        # launch must reproduce their per-request scores exactly (the
        # in-graph u-side repeat must stay per-request, not leak across)
        ids2 = dict(batch_ids)
        ids2["clk_seq_sku_7d_50"] = [b"48221645792", b"34560285023"]
        ids2["item_fea_sku"] = [b"9", b"8", b"7", b"6"]
        raw2 = np.abs(np.random.default_rng(1).normal(
            size=(B, 615))).astype(np.float32)
        untiled2 = prep.assemble(B, id_values=ids2, raw_features=raw2,
                                 tile_uside=False)
        single2 = scorer(untiled2)
        g = scorer.score_group_async([untiled, untiled2])
        gs = np.asarray(g["Scores"])
        assert gs.shape == (2 * B,)
        np.testing.assert_allclose(gs[:B], out["Scores"], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(gs[B:], single2["Scores"], rtol=1e-5,
                                   atol=1e-6)

        # micro-batching queue: concurrent submits resolve to their own
        # request's scores (including the padded-group path)
        from cikm2020_dmt_tpu.serve.queue import ScorerQueue
        q = ScorerQueue(scorer, max_group=4, groups=(1, 2, 4))
        q.warmup(untiled)
        futs = [q.submit(untiled), q.submit(untiled2), q.submit(untiled)]
        res = [{k: np.asarray(v) for k, v in f.result(timeout=120).items()}
               for f in futs]
        q.close()
        np.testing.assert_allclose(res[0]["Scores"], out["Scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(res[1]["Scores"], single2["Scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(res[2]["Scores"], out["Scores"],
                                   rtol=1e-5, atol=1e-6)


class TestInt8Quantization:
    def test_quantize_roundtrip_error_bound(self):
        from cikm2020_dmt_tpu.serve.export import quantize_table
        rng = np.random.default_rng(3)
        t = (rng.normal(size=(64, 32)) * rng.uniform(0.01, 5, (64, 1))
             ).astype(np.float32)
        t[7] = 0.0  # all-zero row: scale guard
        qt = quantize_table(t)
        assert qt["q"].dtype == np.int8 and qt["scale"].dtype == np.float32
        deq = qt["q"].astype(np.float32) * qt["scale"]
        # symmetric per-row quantization: |err| <= scale/2 elementwise
        assert (np.abs(deq - t) <= qt["scale"] / 2 + 1e-7).all()
        assert (deq[7] == 0).all()


@needs_demo_data
class TestInt8ExportRoundtrip:
    def test_int8_scores_close_to_f32(self, tmp_path):
        import dataclasses

        from cikm2020_dmt_tpu.serve.export import export_model, load_scorer

        cfg = make_demo_config(
            model_type="mmoe_transformer_unbias", batch_size=16,
            validate_step=2, output_path=str(tmp_path),
            train_data_mean_path=MEAN, train_data_std_path=STD,
            epoch_num=1)
        Trainer(cfg).train(data_path=DEMO_DATA, max_steps=2, log_every=100)
        d32 = export_model(cfg, 2, export_dir=str(tmp_path / "f32"))
        cfg8 = dataclasses.replace(cfg, export_int8_rows=1000)
        d8 = export_model(cfg8, 2, export_dir=str(tmp_path / "int8"))

        import json as _json
        desc = _json.load(open(f"{d8}/descriptor.json"))
        assert "Sku" in desc["int8_tables"]

        s32 = load_scorer(cfg, d32)
        s8 = load_scorer(cfg8, d8)
        assert isinstance(s8.params["emb"]["Sku"], dict)
        assert s8.params["emb"]["Sku"]["q"].dtype == np.int8

        prep = ServingPreprocessor(cfg)
        rng = np.random.default_rng(0)
        ids = {
            "item_fea_sku": [str(x).encode()
                             for x in rng.integers(1, 10**9, 8)],
            "item_c3": [b"13760"] * 8,
            "clk_seq_sku_7d_50": [str(x).encode()
                                  for x in rng.integers(1, 10**9, 20)],
            "clk_seq_c3_7d_50": [b"15053", b"9728"],
        }
        raw = np.abs(rng.normal(size=(8, 615))).astype(np.float32)
        batch = prep.assemble(8, id_values=ids, raw_features=raw,
                              tile_uside=False)
        o32 = s32(batch)
        o8 = s8(batch)
        # per-row int8 step bounds the embedding error; scores stay close
        np.testing.assert_allclose(o8["Scores"], o32["Scores"], atol=0.05)
        assert np.isfinite(o8["Scores"]).all()
