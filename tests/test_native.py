"""Native data-path tests: the C++ parser must produce batches
byte-identical to the pure-python assembler on real demo records."""

import numpy as np
import pytest

from cikm2020_dmt_tpu.data.native import (NativeAssembler, load_library,
                                          native_batch_stream, scan_file)
from cikm2020_dmt_tpu.data.pipeline import batch_stream

from conftest import DEMO_DATA, needs_demo_data, make_demo_config


@pytest.fixture(scope="module")
def lib():
    return load_library()


@needs_demo_data
class TestNativeParity:
    def test_scan_matches_python_framing(self, lib, demo_files):
        from cikm2020_dmt_tpu.data.tfrecord import read_records
        blob, offs, lens = scan_file(demo_files[0])
        py_records = list(read_records(demo_files[0]))
        assert len(offs) == len(py_records)
        for i in (0, 1, len(offs) - 1):
            assert blob[offs[i]:offs[i] + lens[i]] == py_records[i]

    def test_batch_bit_identical_to_python(self):
        cfg = make_demo_config()
        py = next(batch_stream(cfg, DEMO_DATA, batch_size=64, epochs=1))
        nat = next(native_batch_stream(cfg, DEMO_DATA, batch_size=64, epochs=1))
        assert set(py.arrays) == set(nat.arrays)
        for k in sorted(py.arrays):
            np.testing.assert_array_equal(
                py.arrays[k], nat.arrays[k], err_msg=f"array {k}")
        assert py.headers == nat.headers

    def test_full_epoch_same_batches(self):
        cfg = make_demo_config()
        py_batches = list(batch_stream(cfg, DEMO_DATA, 128, epochs=1,
                                       drop_remainder=False))
        nat_batches = list(native_batch_stream(cfg, DEMO_DATA, 128, epochs=1,
                                               drop_remainder=False))
        assert len(py_batches) == len(nat_batches)
        for pb, nb in zip(py_batches, nat_batches):
            np.testing.assert_array_equal(pb["label"], nb["label"])
            np.testing.assert_array_equal(pb["valid"], nb["valid"])
            np.testing.assert_array_equal(
                pb["clk_seq_sku_7d_50__ids"], nb["clk_seq_sku_7d_50__ids"])
            np.testing.assert_array_equal(
                pb["clk_seq_ts_7d_50__ids"], nb["clk_seq_ts_7d_50__ids"])

    def test_cross_file_segments_and_headers(self):
        """Batches spanning TFRecord files parse by segment directly into
        the output rows; headers must still match the python path, and
        with_headers=False must leave everything else identical."""
        cfg = make_demo_config()
        py = list(batch_stream(cfg, DEMO_DATA, 96, epochs=1,
                               drop_remainder=False))
        nat = list(native_batch_stream(cfg, DEMO_DATA, 96, epochs=1,
                                       drop_remainder=False))
        nohdr = list(native_batch_stream(cfg, DEMO_DATA, 96, epochs=1,
                                         drop_remainder=False,
                                         with_headers=False))
        assert len(py) == len(nat) == len(nohdr)
        for pb, nb, hb in zip(py, nat, nohdr):
            assert pb.headers == nb.headers
            assert all(h == b"" for h in hb.headers)
            for key in ("features", "label", "propensity_weight",
                        "em_position", "em_page",
                        "clk_seq_sku_7d_50__ids"):
                np.testing.assert_array_equal(pb[key], nb[key], err_msg=key)
                np.testing.assert_array_equal(pb[key], hb[key], err_msg=key)

    def test_shuffled_epoch_is_permutation(self):
        cfg = make_demo_config()
        plain = list(native_batch_stream(cfg, DEMO_DATA, 64, epochs=1,
                                         drop_remainder=False))
        shuffled = list(native_batch_stream(cfg, DEMO_DATA, 64, epochs=1,
                                            shuffle=True, drop_remainder=False))
        a = np.concatenate([b["label"][b["valid"] > 0] for b in plain])
        b = np.concatenate([b["label"][b["valid"] > 0] for b in shuffled])
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.sort(a), np.sort(b))

    def test_drop_remainder_keeps_all_full_batches(self):
        """Regression: the worker-pool stream must drain in-flight batches
        at end of stream even when drop_remainder drops the partial one
        (v2 bug: the last num_workers full batches were silently lost)."""
        cfg = make_demo_config()
        per_epoch = sum(b["valid"].sum() for b in native_batch_stream(
            cfg, DEMO_DATA, 4096, epochs=1, drop_remainder=False))
        total = int(per_epoch) * 5
        for workers in (1, 3):
            got = list(native_batch_stream(cfg, DEMO_DATA, 64, epochs=5,
                                           drop_remainder=True,
                                           num_workers=workers))
            assert len(got) == total // 64
            assert all(b.size == 64 for b in got)

    def test_throughput_exceeds_python(self):
        import time
        cfg = make_demo_config()
        nat = NativeAssembler(cfg)
        # warm: one pass
        list(native_batch_stream(cfg, DEMO_DATA, 256, epochs=1, assembler=nat))
        t0 = time.perf_counter()
        n = 0
        for batch in native_batch_stream(cfg, DEMO_DATA, 256, epochs=8,
                                         assembler=nat):
            n += batch.size
        native_eps = n / (time.perf_counter() - t0)
        # python reference pace measured ~340 ex/s; demand a big margin
        assert native_eps > 3000, f"native parse only {native_eps:.0f} ex/s"


@needs_demo_data
class TestFuzzParity:
    """Randomized Example protos (missing fields, overlong lists, weight
    mismatches, junk values, unknown features) must parse byte-identically
    through the C++ and python assemblers."""

    def _random_example(self, rng, schema, ts_feats):
        feats = {}
        # header: 13 tab-separated fields, sometimes long/junk/missing
        r = rng.random()
        if r > 0.1:
            fields = [f"f{j}-{rng.integers(1e6)}" for j in range(13)]
            fields[4] = str(rng.integers(-5, 500))     # pos (clipped 400)
            fields[11] = str(rng.integers(-5, 200))    # page (clipped 100)
            if r > 0.9:
                fields[4] = "junk"                     # non-numeric pos
            feats["header"] = [("\t".join(fields)).encode()]
        if rng.random() > 0.05:
            feats["label"] = [float(rng.integers(0, 6))]
        if rng.random() > 0.05:
            # fixed-len like dense: exactly num_classes, or more
            feats["mask"] = list(rng.random(
                int(rng.choice([schema.num_classes,
                                schema.num_classes + 3]))).astype(float))
        if rng.random() > 0.05:
            # fixed-len contract (reference tf.FixedLenFeature): exactly
            # dense_dim values, or more (both paths slice); never fewer
            n_dense = int(rng.choice([schema.dense_dim,
                                      schema.dense_dim + 40]))
            feats["features"] = list(rng.random(n_dense).astype(float))
        for f in schema.id_features:
            r = rng.random()
            if r < 0.15:
                continue                               # feature absent
            k = int(rng.integers(0, 2 * f.max_len))
            if f.name in ts_feats:
                vals = [str(rng.integers(-10, 10**7)).encode()
                        for _ in range(k)]
                if k and r > 0.9:
                    vals[0] = b"notanumber"
                if k and r > 0.95:
                    vals[-1] = b"123.000000"
            else:
                vals = [f"id{rng.integers(1e9)}".encode() for _ in range(k)]
                if k and r > 0.9:
                    vals[0] = b""                      # empty id
            feats[f.name] = vals
            wr = rng.random()
            if wr < 0.3:
                pass                                   # no weights
            elif wr < 0.5:
                feats[f.name + "Wts"] = [0.0] * k      # all-zero -> 1.0 fill
            else:
                # reference sp_weights contract: >= as many weights as ids
                m = k + int(rng.integers(0, 3))
                feats[f.name + "Wts"] = list(
                    rng.random(m).astype(float))
        if rng.random() > 0.8:
            feats["unknown_feature"] = [b"ignored", b"values"]
        return feats

    def test_random_examples_bit_identical(self, tmp_path):
        from cikm2020_dmt_tpu.data.example import encode_example
        from cikm2020_dmt_tpu.data.pipeline import batch_stream
        from cikm2020_dmt_tpu.data.schema import FeatureSchema
        from cikm2020_dmt_tpu.data.tfrecord import write_records

        cfg = make_demo_config()
        schema = FeatureSchema.from_config(cfg)
        ts = set(cfg.attention_ts)
        rng = np.random.default_rng(20260818)
        write_records(str(tmp_path / "fuzz.tfrecord"), [
            encode_example(self._random_example(rng, schema, ts))
            for _ in range(192)])
        spec = str(tmp_path / "*.tfrecord")

        py = list(batch_stream(cfg, spec, 64, epochs=1,
                               drop_remainder=False))
        nat = list(native_batch_stream(cfg, spec, 64, epochs=1,
                                       drop_remainder=False))
        assert len(py) == len(nat) == 3
        for pb, nb in zip(py, nat):
            assert set(pb.arrays) == set(nb.arrays)
            for k in sorted(pb.arrays):
                np.testing.assert_array_equal(pb.arrays[k], nb.arrays[k],
                                              err_msg=k)
            assert pb.headers == nb.headers

    def test_header_cap_truncates_bytes_not_positions(self, tmp_path):
        """Headers beyond HEADER_CAP are truncated in the native batch's
        header bytes (documented capacity limit, data/native.py) — but
        em_position/em_page still parse from the full value because the C
        scanner reads the record, not the truncated copy."""
        from cikm2020_dmt_tpu.data.example import encode_example
        from cikm2020_dmt_tpu.data.native import HEADER_CAP
        from cikm2020_dmt_tpu.data.tfrecord import write_records

        cfg = make_demo_config()
        fields = ["x" * 200] * 4 + ["321"] + ["y" * 900] * 6 + ["77", "z"]
        hdr = ("\t".join(fields)).encode()
        assert len(hdr) > HEADER_CAP
        write_records(str(tmp_path / "h.tfrecord"),
                      [encode_example({"header": [hdr],
                                       "label": [1.0]})] * 4)
        nb = next(native_batch_stream(cfg, str(tmp_path / "*.tfrecord"), 4,
                                      epochs=1, drop_remainder=False))
        assert nb.headers[0] == hdr[:HEADER_CAP]
        assert nb["em_position"][0] == 321   # pos field, past nothing
        assert nb["em_page"][0] == 77        # page field sits past the cap

    def test_corrupt_framing_same_verdict_both_paths(self, tmp_path):
        """Truncated records raise in both paths; trailing garbage
        shorter than a frame header is ignored by both."""
        from cikm2020_dmt_tpu.data.example import encode_example
        from cikm2020_dmt_tpu.data.tfrecord import read_records, write_records

        good = str(tmp_path / "good.tfrecord")
        write_records(good, [encode_example({"label": [1.0]})] * 3)
        data = open(good, "rb").read()

        tail = str(tmp_path / "tail.tfrecord")
        with open(tail, "wb") as f:
            f.write(data + b"\x00" * 8)  # < 12B trailing garbage
        assert len(list(read_records(tail))) == 3
        _, offs, _ = scan_file(tail)
        assert len(offs) == 3

        trunc = str(tmp_path / "trunc.tfrecord")
        with open(trunc, "wb") as f:
            f.write(data[:-10])  # cut into the last record
        with pytest.raises(IOError):
            list(read_records(trunc))
        with pytest.raises(IOError):
            scan_file(trunc)
