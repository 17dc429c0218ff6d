"""ScorerQueue unit tests against a stub scorer (no model/export needed;
the real-scorer integration path is covered by tests/test_export.py).

Reference contract being generalized: one Scores signature per request
(saved_model/export_model.py:109-115); the queue adds micro-batching
without changing per-request results.
"""

import numpy as np
import pytest

from cikm2020_dmt_tpu.serve.queue import ScorerQueue


class StubScorer:
    """score_group_async contract: [sum(B_i)] Scores in request order.
    Each request dict carries its own 'valid' rows; scores = row values
    so slicing bugs are visible."""

    def __init__(self):
        self.group_sizes = []

    def _score(self, batches):
        rows = np.concatenate([np.asarray(b["valid"]) for b in batches])
        return {"Scores": rows * 2.0}

    def score_async(self, batch):
        return self._score([batch])

    def score_group_async(self, batches):
        sizes = {len(b["valid"]) for b in batches}
        if len(sizes) != 1:
            raise ValueError("unequal candidate counts")
        self.group_sizes.append(len(batches))
        return self._score(batches)


def _req(vals):
    return {"valid": np.asarray(vals, np.float32)}


class TestScorerQueue:
    def test_resolves_per_request(self):
        s = StubScorer()
        q = ScorerQueue(s, max_group=4, groups=(1, 2, 4))
        futs = [q.submit(_req([i, i + 0.5])) for i in range(5)]
        res = [np.asarray(f.result(timeout=30)["Scores"]) for f in futs]
        q.close()
        for i, r in enumerate(res):
            np.testing.assert_allclose(r, [2 * i, 2 * i + 1.0])

    def test_bad_request_does_not_fail_neighbors(self):
        """A mismatched candidate count fails ONLY its own future; the
        co-batched requests retry individually and still resolve."""
        s = StubScorer()
        q = ScorerQueue(s, max_group=4, groups=(1, 2, 4))
        import threading
        # stall the dispatcher long enough to co-batch good + bad
        gate = threading.Event()
        orig = s.score_group_async

        def slow_first(batches):
            gate.wait(10)
            return orig(batches)

        s.score_group_async = slow_first
        f_warm = q.submit(_req([9.0]))          # dispatcher blocks here
        f_good = q.submit(_req([1.0]))
        f_bad = q.submit(_req([1.0, 2.0]))      # different count
        f_good2 = q.submit(_req([3.0]))
        gate.set()
        np.testing.assert_allclose(
            np.asarray(f_warm.result(timeout=30)["Scores"]), [18.0])
        np.testing.assert_allclose(
            np.asarray(f_good.result(timeout=30)["Scores"]), [2.0])
        np.testing.assert_allclose(
            np.asarray(f_good2.result(timeout=30)["Scores"]), [6.0])
        # the odd-sized request degrades to an individual dispatch (the
        # stub's count check only applies to groups) — it resolves too
        np.testing.assert_allclose(
            np.asarray(f_bad.result(timeout=30)["Scores"]), [2.0, 4.0])
        q.close()

    def test_submit_after_close_raises(self):
        q = ScorerQueue(StubScorer(), max_group=2, groups=(1, 2))
        q.close()
        with pytest.raises(RuntimeError):
            q.submit(_req([1.0]))
        q.close()  # idempotent

    def test_groups_actually_batch_under_load(self):
        s = StubScorer()
        q = ScorerQueue(s, max_group=4, groups=(1, 2, 4))
        import threading
        gate = threading.Event()
        orig = s.score_group_async

        def gated(batches):
            gate.wait(10)
            return orig(batches)

        s.score_group_async = gated
        futs = [q.submit(_req([float(i)])) for i in range(5)]
        gate.set()
        for f in futs:
            f.result(timeout=30)
        q.close()
        # first request dispatched alone; the 4 queued behind it merged
        assert max(s.group_sizes) >= 2, s.group_sizes
