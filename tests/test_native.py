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
