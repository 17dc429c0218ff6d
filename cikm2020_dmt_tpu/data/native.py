"""ctypes binding + build driver for the native data-path accelerator
(native/dmtdata.cc).

The shared library is compiled on demand with g++ (no pybind11 in the
image) and cached by source hash under ``native/build/``.  The
``NativeAssembler`` produces batches byte-identical to the pure-python
``BatchAssembler`` (asserted by tests/test_native.py) at >50x the speed;
``native_batch_stream`` is the drop-in fast pipeline.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import random
import subprocess
from typing import Iterator, Optional

import numpy as np

from ..core.config import DMTConfig
from .pipeline import IDS, LEN, WTS, Batch, expand_files, shard_files
from .propensity import PropensityModel
from .schema import FeatureSchema
from .vocab import VocabSet

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "dmtdata.cc"))

# Max stored header bytes per example: longer headers are TRUNCATED in
# Batch.headers (production JD headers measure ~100-300B).  em_position /
# em_page are immune — the C scanner parses them from the full record
# value, not the truncated copy (tests/test_native.py header-cap test).
HEADER_CAP = 1024


def _build_library() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    build_dir = os.path.join(os.path.dirname(_SRC), "build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, f"libdmtdata-{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-pthread", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


_LIB = None


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(_build_library())
    c = ctypes
    lib.dmt_ctx_create.restype = c.c_void_p
    lib.dmt_ctx_create.argtypes = [c.c_int] * 6
    lib.dmt_ctx_destroy.argtypes = [c.c_void_p]
    lib.dmt_ctx_add_table.restype = c.c_int
    lib.dmt_ctx_add_table.argtypes = [c.c_void_p, c.c_int64]
    lib.dmt_table_add_vocab.argtypes = [
        c.c_void_p, c.c_int, c.c_char_p, c.POINTER(c.c_int64), c.c_int64]
    lib.dmt_ctx_add_feature.restype = c.c_int
    lib.dmt_ctx_add_feature.argtypes = [c.c_void_p, c.c_char_p, c.c_int, c.c_int]
    lib.dmt_ctx_finalize.argtypes = [c.c_void_p]
    lib.dmt_lookup_batch.argtypes = [
        c.c_void_p, c.c_int, c.c_char_p, c.POINTER(c.c_int64), c.c_int64,
        c.POINTER(c.c_int32)]
    lib.dmt_factorize_headers.restype = c.c_int64
    lib.dmt_factorize_headers.argtypes = [
        c.c_char_p, c.c_int64, c.c_int64, c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int64)]
    lib.dmt_hfact_create.restype = c.c_void_p
    lib.dmt_hfact_create.argtypes = []
    lib.dmt_hfact_feed.restype = c.c_int64
    lib.dmt_hfact_feed.argtypes = [
        c.c_void_p, c.c_char_p, c.c_int64, c.c_int64, c.c_int, c.c_int,
        c.c_int, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32)]
    lib.dmt_hfact_uniques.restype = c.c_int64
    lib.dmt_hfact_uniques.argtypes = [c.c_void_p, c.c_int]
    lib.dmt_hfact_destroy.argtypes = [c.c_void_p]
    lib.dmt_scan_tfrecord.restype = c.c_int64
    lib.dmt_scan_tfrecord.argtypes = [
        c.c_char_p, c.c_int64, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.c_int64]
    lib.dmt_parse_batch.argtypes = [
        c.c_void_p, c.c_char_p, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.c_int64,
        c.POINTER(c.c_float), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.c_uint8), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.POINTER(c.c_int32)), c.POINTER(c.POINTER(c.c_float)),
        c.POINTER(c.POINTER(c.c_int32))]
    _LIB = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class NativeAssembler:
    """C++-backed batch assembly with the same output contract as
    pipeline.BatchAssembler."""

    def __init__(self, cfg: DMTConfig, schema: Optional[FeatureSchema] = None,
                 vocabs: Optional[VocabSet] = None,
                 propensity: Optional[PropensityModel] = None,
                 num_threads: int = 0):
        self.cfg = cfg
        self.schema = schema or FeatureSchema.from_config(cfg)
        vocabs = vocabs or VocabSet(cfg.embeddings + cfg.embeddings_bias,
                                    cfg.vocab_path)
        self.propensity = propensity or PropensityModel(cfg.propensity_em_type)
        lib = load_library()
        hidx = self.schema.header_index
        self._ctx = lib.dmt_ctx_create(
            self.schema.dense_dim, self.schema.num_classes, HEADER_CAP,
            hidx.get("pos", 4), hidx.get("page", 11), num_threads)
        ts_feats = set(cfg.attention_ts)
        table_ids: dict[str, int] = {}
        for f in self.schema.id_features:
            if f.name in ts_feats:
                table = -1
            else:
                if f.table not in table_ids:
                    vocab = vocabs.by_table[f.table]
                    tid = lib.dmt_ctx_add_table(self._ctx, vocab.id_size)
                    if vocab._map is not None:
                        keys = sorted(vocab._map.items(), key=lambda kv: kv[1])
                        blob = b"".join(k for k, _ in keys)
                        offs = np.zeros(len(keys) + 1, np.int64)
                        np.cumsum([len(k) for k, _ in keys], out=offs[1:])
                        lib.dmt_table_add_vocab(
                            self._ctx, tid, blob, _ptr(offs, ctypes.c_int64),
                            len(keys))
                    table_ids[f.table] = tid
                table = table_ids[f.table]
            lib.dmt_ctx_add_feature(self._ctx, f.name.encode(), f.max_len,
                                    table)
        lib.dmt_ctx_finalize(self._ctx)
        self._feature_table = {
            f.name: (-1 if f.name in ts_feats else table_ids[f.table])
            for f in self.schema.id_features}
        self._lib = lib

    def lookup_ids(self, feature: str, values: list[bytes]) -> np.ndarray:
        """Vectorized vocab/OOV/hash mapping of raw byte ids (serving
        request path — one C call instead of len(values) Python dict
        probes).  ``feature`` must not be a raw-int timestamp feature."""
        table = self._feature_table[feature]
        if table < 0:
            raise ValueError(f"{feature} is a raw-int ts feature")
        out = np.empty(len(values), np.int32)
        if not values:
            return out
        blob = b"".join(values)
        offs = np.zeros(len(values) + 1, np.int64)
        np.cumsum([len(v) for v in values], out=offs[1:])
        self._lib.dmt_lookup_batch(self._ctx, table, blob,
                                   _ptr(offs, ctypes.c_int64), len(values),
                                   _ptr(out, ctypes.c_int32))
        return out

    def __del__(self):
        if getattr(self, "_ctx", None) and self._lib:
            self._lib.dmt_ctx_destroy(self._ctx)
            self._ctx = None

    def assemble_records(self, blob: bytes, offsets: np.ndarray,
                         lengths: np.ndarray,
                         target_size: Optional[int] = None,
                         with_headers: bool = True) -> Batch:
        return self.assemble_segments([(blob, offsets, lengths)],
                                      target_size, with_headers)

    def assemble_segments(self, segments, target_size: Optional[int] = None,
                          with_headers: bool = True) -> Batch:
        """Assemble one batch from [(blob, offsets, lengths), ...].

        Each segment parses directly into its row range of the
        preallocated output arrays (the C parser fills rows 0..k-1 of the
        buffers it is handed, so row-sliced numpy views address any
        offset) — no staging copy when a batch spans TFRecord files.
        ``with_headers=False`` skips materializing per-row Python bytes
        (training never reads them; eval/test do)."""
        n = sum(len(o) for _, o, _ in segments)
        b = target_size or n
        s = self.schema
        a: dict[str, np.ndarray] = {
            "features": np.zeros((b, s.dense_dim), np.float32),
            "label": np.zeros((b,), np.float32),
            "mask": np.zeros((b, s.num_classes), np.float32),
            "valid": np.zeros((b,), np.float32),
            "em_position": np.zeros((b,), np.int32),
            "em_page": np.zeros((b,), np.int32),
        }
        a["valid"][:n] = 1.0
        # the C parser's header stride is the ctx's HEADER_CAP; a None
        # buffer tells it to skip the header memcpy entirely (training
        # passes with_headers=False and never reads the bytes — em_position
        # / em_page are still parsed straight out of the record)
        if with_headers:
            header_buf = np.zeros((b, HEADER_CAP), np.uint8)
            header_len = np.zeros((b,), np.int32)
        else:
            header_buf = header_len = None
        feat_ids, feat_wts, feat_len = [], [], []
        for f in s.id_features:
            a[f.name + IDS] = np.zeros((b, f.max_len), np.int32)
            a[f.name + WTS] = np.zeros((b, f.max_len), np.float32)
            a[f.name + LEN] = np.zeros((b,), np.int32)
            feat_ids.append(a[f.name + IDS])
            feat_wts.append(a[f.name + WTS])
            feat_len.append(a[f.name + LEN])

        nf = len(s.id_features)
        row = 0
        for blob, offsets, lengths in segments:
            k = len(offsets)
            if k == 0:
                continue
            ids_arr = (ctypes.POINTER(ctypes.c_int32) * nf)(
                *[_ptr(x[row:], ctypes.c_int32) for x in feat_ids])
            wts_arr = (ctypes.POINTER(ctypes.c_float) * nf)(
                *[_ptr(x[row:], ctypes.c_float) for x in feat_wts])
            len_arr = (ctypes.POINTER(ctypes.c_int32) * nf)(
                *[_ptr(x[row:], ctypes.c_int32) for x in feat_len])
            offsets = np.ascontiguousarray(offsets, np.int64)
            lengths = np.ascontiguousarray(lengths, np.int64)
            self._lib.dmt_parse_batch(
                self._ctx, blob, _ptr(offsets, ctypes.c_int64),
                _ptr(lengths, ctypes.c_int64), k,
                _ptr(a["features"][row:], ctypes.c_float),
                _ptr(a["label"][row:], ctypes.c_float),
                _ptr(a["mask"][row:], ctypes.c_float),
                _ptr(header_buf[row:], ctypes.c_uint8)
                if header_buf is not None else None,
                _ptr(header_len[row:], ctypes.c_int32)
                if header_len is not None else None,
                _ptr(a["em_position"][row:], ctypes.c_int32),
                _ptr(a["em_page"][row:], ctypes.c_int32),
                ids_arr, wts_arr, len_arr)
            row += k

        p, w, w_pos, w_mul = self.propensity.weights(
            a["em_position"], a["em_page"], a["label"])
        a["propensity"] = p
        a["propensity_weight"] = w
        a["propensity_weight_positive"] = w_pos
        a["propensity_weight_mul"] = w_mul
        if with_headers and header_buf is not None:
            headers = [bytes(header_buf[i, :header_len[i]])
                       for i in range(n)]
            headers.extend(b"" for _ in range(b - n))
        else:
            headers = [b""] * b
        return Batch(a, headers)


def factorize_headers(header_schema, headers) -> Optional[tuple]:
    """One-pass C parse of eval header lines: labels + first-occurrence
    sid/uuid group codes (pd.factorize order), no Python string objects.

    Returns (labels int64 [n], sid_codes int64 [n], uuid_codes int64 [n])
    or None when the native path can't parse (short lines, embedded
    newlines, build failure) — callers fall back to the pandas path
    (metrics/offline._parse_headers), which this is code-for-code
    equivalent to (asserted by tests/test_offline_metrics.py)."""
    try:
        lib = load_library()
    except Exception:
        return None
    idx = {name: i for i, name in enumerate(header_schema)}
    label_i, sid_i = idx["label"], idx["sid"]
    uuid_i = idx.get("uuid", sid_i)
    n = len(headers)
    blob = b"\n".join(headers)
    labels = np.empty(n, np.int64)
    sid_codes = np.empty(n, np.int32)
    uuid_codes = np.empty(n, np.int32)
    n_uniq = np.zeros(2, np.int64)
    r = lib.dmt_factorize_headers(
        blob, len(blob), n, label_i, sid_i, uuid_i,
        _ptr(labels, ctypes.c_int64), _ptr(sid_codes, ctypes.c_int32),
        _ptr(uuid_codes, ctypes.c_int32), _ptr(n_uniq, ctypes.c_int64))
    if r != n:
        return None
    return labels, sid_codes.astype(np.int64), uuid_codes.astype(np.int64)


class HeaderFactorizer:
    """Streaming header parse+factorize for reference-scale eval splits.

    Same semantics as :func:`factorize_headers` (first-occurrence
    pd.factorize codes, asserted chunk-size-invariant by
    tests/test_offline_metrics.py) but STATEFUL: headers are fed in
    chunks and only O(unique groups) bytes stay resident in the native
    hash arenas — the raw lines can be dropped after each feed.  This is
    what lets ``run_eval`` survive the reference's 105.4M-row test split
    (~20 GB of raw header text) on a small host
    (reference metrics.py:134-199 holds the whole split in a DataFrame).

    Raises RuntimeError on unparseable lines — callers that need a
    fallback should catch and revert to list accumulation.
    """

    def __init__(self, header_schema):
        idx = {name: i for i, name in enumerate(header_schema)}
        self._label_i, self._sid_i = idx["label"], idx["sid"]
        self._uuid_i = idx.get("uuid", self._sid_i)
        self._lib = load_library()
        self._h = self._lib.dmt_hfact_create()
        self._labels: list[np.ndarray] = []
        self._sid: list[np.ndarray] = []
        self._uuid: list[np.ndarray] = []
        self.rows = 0

    def feed(self, headers) -> None:
        """Consume one chunk (sequence of header byte lines)."""
        n = len(headers)
        if n == 0:
            return
        blob = b"\n".join(headers)
        labels = np.empty(n, np.int64)
        sid_codes = np.empty(n, np.int32)
        uuid_codes = np.empty(n, np.int32)
        r = self._lib.dmt_hfact_feed(
            self._h, blob, len(blob), n, self._label_i, self._sid_i,
            self._uuid_i, _ptr(labels, ctypes.c_int64),
            _ptr(sid_codes, ctypes.c_int32), _ptr(uuid_codes, ctypes.c_int32))
        if r != n:
            raise RuntimeError(
                f"native header factorize parsed {r}/{n} lines")
        self._labels.append(labels)
        self._sid.append(sid_codes)
        self._uuid.append(uuid_codes)
        self.rows += n

    def result(self):
        """(labels int64 [n], sid_codes int64 [n], uuid_codes int64 [n])."""
        if not self._labels:
            z64 = np.zeros(0, np.int64)
            return z64, z64.copy(), z64.copy()
        return (np.concatenate(self._labels),
                np.concatenate(self._sid).astype(np.int64),
                np.concatenate(self._uuid).astype(np.int64))

    def __del__(self):
        h, self._h = getattr(self, "_h", None), None
        if h is not None:
            try:
                self._lib.dmt_hfact_destroy(h)
            except Exception:
                pass


def scan_file(path: str) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Read + frame-scan one TFRecord file natively."""
    lib = load_library()
    with open(path, "rb") as f:
        blob = f.read()
    cap = max(16, len(blob) // 64)  # records are >=64B in practice
    while True:
        offs = np.zeros(cap, np.int64)
        lens = np.zeros(cap, np.int64)
        n = lib.dmt_scan_tfrecord(blob, len(blob), _ptr(offs, ctypes.c_int64),
                                  _ptr(lens, ctypes.c_int64), cap)
        if n < 0:
            raise IOError(f"corrupt TFRecord framing in {path}")
        if n < cap:  # n == cap => the scan may have hit the cap mid-file
            return blob, offs[:n], lens[:n]
        cap *= 4


def native_batch_stream(
    cfg: DMTConfig,
    path_spec: str,
    batch_size: int,
    epochs: int = 1,
    shuffle: bool = False,
    drop_remainder: bool = True,
    pad_remainder: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
    assembler: Optional[NativeAssembler] = None,
    seed: Optional[int] = None,
    with_headers: bool = True,
    num_workers: Optional[int] = None,
    cache_bytes: Optional[int] = None,
) -> Iterator[Batch]:
    """Fast batch stream: native framing scan + parallel native parse.

    Shuffling operates on record indices within a sliding window of whole
    files (record-level, like the reference's shuffle buffer) and on file
    order per epoch.

    Throughput engineering (the per-record Python tuple bookkeeping of the
    v1 stream HALVED the parser's 88k ex/s to 44k on the demo):
    - record bookkeeping is vectorized numpy ([bi], [ri] arrays; batch
      extraction slices + run-splits them with array ops, no per-record
      Python objects);
    - ``num_workers`` assembler threads (cfg.data_workers) pipeline whole
      batches: dmt_parse_batch drops the GIL, so one batch's C++ parse
      overlaps the next one's numpy allocation + propensity math.  Batches
      are submitted and yielded FIFO, so the stream stays deterministic
      for any worker count;
    - a bounded scan cache (cfg.data_cache_bytes LRU) keeps whole-file
      framing scans resident across epochs — multi-epoch runs over
      datasets that fit the budget skip both the file re-read and the
      re-scan.
    """
    files = shard_files(expand_files(path_spec), num_shards, shard_index)
    if not files:
        raise FileNotFoundError(f"no input files match {path_spec!r}")
    rng = random.Random(cfg.seed if seed is None else seed)
    if num_workers is None:
        num_workers = getattr(cfg, "data_workers", 0)
    if num_workers <= 0:
        # auto: one assembler per core, capped — interleaved A/B on a
        # 4-core host: 2 workers ~78k ex/s, 4 workers ~92k (the C++
        # parse drops the GIL, so threads keep scaling to core count)
        num_workers = min(8, os.cpu_count() or 4)
    if assembler is None:
        # split the cores between the stream workers and each call's
        # internal parse pool — nested full-width pools oversubscribe
        # (4 workers x 4 parse threads on 4 cores measures 147k ex/s
        # where 4x1 measures 177k)
        per_call = max(1, (os.cpu_count() or 4) // max(1, num_workers))
        assembler = NativeAssembler(cfg, num_threads=per_call)
    if cache_bytes is None:
        cache_bytes = getattr(cfg, "data_cache_bytes", 0)

    import collections
    import threading
    from concurrent.futures import ThreadPoolExecutor

    # ---- bounded LRU of (blob, offs, lens) keyed by path ----
    cache: "collections.OrderedDict[str, tuple]" = collections.OrderedDict()
    cache_lock = threading.Lock()
    cache_total = 0

    def get_file(path: str):
        nonlocal cache_total
        with cache_lock:
            ent = cache.get(path)
            if ent is not None:
                cache.move_to_end(path)
                return ent
        ent = scan_file(path)
        if cache_bytes > 0:
            with cache_lock:
                if path not in cache:
                    cache[path] = ent
                    cache_total += len(ent[0])
                    while cache_total > cache_bytes and len(cache) > 1:
                        _, old = cache.popitem(last=False)
                        cache_total -= len(old[0])
        return ent

    # ---- vectorized pending-record state ----
    blob_reg: dict[int, tuple] = {}
    next_bi = 0
    pend_bi = np.empty(0, np.int64)
    pend_ri = np.empty(0, np.int64)

    def split_segments(tb: np.ndarray, tr: np.ndarray):
        """Consecutive same-blob runs -> [(blob, offs, lens), ...]."""
        cuts = np.flatnonzero(np.diff(tb)) + 1
        lo_hi = zip(np.concatenate([[0], cuts]),
                    np.concatenate([cuts, [len(tb)]]))
        segs = []
        for lo, hi in lo_hi:
            blob, offs, lens = blob_reg[int(tb[lo])]
            idx = tr[lo:hi]
            segs.append((blob, offs[idx], lens[idx]))
        return segs

    def take_batches(flush_partial: bool):
        """Pop (segs, target_size) work items off the pending arrays."""
        nonlocal pend_bi, pend_ri
        while (len(pend_bi) >= batch_size
               or (flush_partial and len(pend_bi))):
            n = min(batch_size, len(pend_bi))
            tb, tr = pend_bi[:n].copy(), pend_ri[:n].copy()
            pend_bi = pend_bi[n:].copy()
            pend_ri = pend_ri[n:].copy()
            target = (batch_size
                      if (pad_remainder and n < batch_size) else None)
            yield split_segments(tb, tr), target
        if not len(pend_bi):
            # all submitted work holds direct refs to its blobs; registry
            # entries are only needed for still-pending records
            blob_reg.clear()

    # ---- FIFO assembler pool (order-preserving => deterministic) ----
    pool = (ThreadPoolExecutor(max_workers=num_workers)
            if num_workers > 1 else None)
    inflight: collections.deque = collections.deque()

    def emit(final: bool) -> Iterator[Batch]:
        """final = end of stream: flush the partial batch (unless
        drop_remainder) AND drain every in-flight future."""
        for segs, target in take_batches(final and not drop_remainder):
            if pool is None:
                yield assembler.assemble_segments(segs, target,
                                                  with_headers)
                continue
            inflight.append(pool.submit(
                assembler.assemble_segments, segs, target, with_headers))
            while len(inflight) > num_workers:
                yield inflight.popleft().result()
        if final:
            while inflight:
                yield inflight.popleft().result()

    def epoch_files():
        epoch_iter = range(epochs) if epochs >= 0 else iter(int, 1)
        for _ in epoch_iter:
            order = list(files)
            if shuffle:
                rng.shuffle(order)
            yield from order

    try:
        # pipeline file reads 2 deep so IO overlaps parse
        readahead = ThreadPoolExecutor(max_workers=1)
        file_iter = epoch_files()
        futures = []
        for path in file_iter:
            futures.append(readahead.submit(get_file, path))
            if len(futures) >= 2:
                break
        while futures:
            blob, offs, lens = futures.pop(0).result()
            nxt = next(file_iter, None)
            if nxt is not None:
                futures.append(readahead.submit(get_file, nxt))
            bi = next_bi
            next_bi += 1
            blob_reg[bi] = (blob, offs, lens)
            k = len(offs)
            pend_bi = np.concatenate(
                [pend_bi, np.full(k, bi, np.int64)])
            pend_ri = np.concatenate(
                [pend_ri, np.arange(k, dtype=np.int64)])
            if shuffle and k:
                # permute the tail window so records mix across the last
                # two files (record-level shuffle buffer, like the
                # reference's dataset.shuffle)
                w = min(len(pend_bi), 2 * k)
                perm = np.random.default_rng(
                    rng.getrandbits(63)).permutation(w)
                pend_bi[-w:] = pend_bi[-w:][perm]
                pend_ri[-w:] = pend_ri[-w:][perm]
            yield from emit(final=False)
        yield from emit(final=True)
    finally:
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
        readahead.shutdown(wait=False, cancel_futures=True)
