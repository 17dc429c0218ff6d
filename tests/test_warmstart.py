"""Warm-start embedding tests (reference base.py:178-196 semantics)."""

import pickle

import numpy as np
import pytest

from cikm2020_dmt_tpu.train.warmstart import (load_pretrained_table,
                                              parse_update_emb,
                                              warm_start_embeddings)


def test_parse_update_emb():
    assert parse_update_emb("Sku:/tmp/sku#Brand:/tmp/brand") == {
        "Sku": "/tmp/sku", "Brand": "/tmp/brand"}
    assert parse_update_emb("") == {}
    assert parse_update_emb("garbage") == {}


def test_load_pickle_and_npy(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)
    p1 = str(tmp_path / "t1")
    with open(p1 + ".pickle", "wb") as f:
        pickle.dump(arr, f)
    np.testing.assert_array_equal(load_pretrained_table(p1), arr)
    p2 = str(tmp_path / "t2.npy")
    np.save(p2, arr)
    np.testing.assert_array_equal(load_pretrained_table(p2), arr)
    with pytest.raises(FileNotFoundError):
        load_pretrained_table(str(tmp_path / "missing"))


def test_warm_start_replaces_matching_table(tmp_path):
    arr = np.ones((8, 4), np.float32) * 7
    path = str(tmp_path / "sku")
    with open(path + ".pickle", "wb") as f:
        pickle.dump(arr, f)
    params = {"emb": {"Sku": np.zeros((8, 4), np.float32),
                      "Cid2": np.zeros((5, 2), np.float32)},
              "mlp": {"w": np.zeros((3, 3))}}
    out = warm_start_embeddings(params, {"Sku": path})
    np.testing.assert_array_equal(out["emb"]["Sku"], arr)
    np.testing.assert_array_equal(out["emb"]["Cid2"], params["emb"]["Cid2"])


def test_warm_start_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "sku")
    with open(path + ".pickle", "wb") as f:
        pickle.dump(np.zeros((2, 2), np.float32), f)
    params = {"emb": {"Sku": np.zeros((8, 4), np.float32)}}
    with pytest.raises(ValueError, match="shape"):
        warm_start_embeddings(params, {"Sku": path})
    with pytest.raises(KeyError):
        warm_start_embeddings(params, {"Nope": path})
