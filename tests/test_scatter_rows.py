"""Sorted-unique scatter tests (ops/scatter_rows): segment dedup math and
the Pallas row-writer in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.ops.scatter_rows import (scatter_add_rows,
                                               segment_rows, write_rows)


class TestSegmentRows:
    def test_dedup_sums_duplicates(self, rng):
        N, R, D = 500, 64, 8
        ids = rng.integers(0, R, N).astype(np.int32)
        rows = rng.normal(size=(N, D)).astype(np.float32)
        uids, urows = segment_rows(jnp.asarray(ids), jnp.asarray(rows), R)
        uids, urows = np.asarray(uids), np.asarray(urows)
        # every real id appears exactly once
        real = uids[uids < R]
        assert len(real) == len(np.unique(ids))
        assert len(np.unique(real)) == len(real)
        # summed rows match numpy accumulation
        want = np.zeros((R, D), np.float32)
        np.add.at(want, ids, rows)
        got = np.zeros((R + 1, D), np.float32)
        np.add.at(got, uids, urows)
        np.testing.assert_allclose(got[:R], want, rtol=2e-5, atol=1e-4)

    def test_sentinel_rows_are_zero(self, rng):
        ids = np.array([3, 3, 3, 7], np.int32)
        rows = np.ones((4, 4), np.float32)
        uids, urows = segment_rows(jnp.asarray(ids), jnp.asarray(rows), 10)
        uids, urows = np.asarray(uids), np.asarray(urows)
        sentinel = uids == 10
        assert sentinel.sum() == 2  # 4 slots - 2 unique ids
        np.testing.assert_array_equal(urows[sentinel], 0.0)


class TestWriteRows:
    def test_unique_write(self, rng):
        R, D, N = 300, 32, 128
        ids = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
        rows = rng.normal(size=(N, D)).astype(np.float32)
        out = write_rows(jnp.asarray(ids), jnp.asarray(rows), R,
                         interpret=True)
        want = np.zeros((R, D), np.float32)
        want[ids] = rows
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    def test_update_rows_in_place(self, rng):
        """update_rows == .at[ids].set(rows, mode='drop') for unique sorted
        ids incl. the lazy-Adam out-of-range sentinel tail (skipped), in
        f32 AND bf16 (bf16 tables are the production default)."""
        from cikm2020_dmt_tpu.ops.scatter_rows import update_rows
        for dt in (np.float32, jnp.bfloat16):
            for d in (128, 256):
                R, U = 500, 90
                table = rng.normal(size=(R, d)).astype(dt)
                ids = np.sort(rng.choice(R, U,
                                         replace=False)).astype(np.int32)
                # sentinel tail (skipped) + a negative id (dropped, like
                # mode="drop")
                ids = np.concatenate([np.array([-3], np.int32), ids,
                                      R + np.arange(17, dtype=np.int32)])
                rows = rng.normal(size=(len(ids), d)).astype(dt)
                want = np.asarray(table).copy()
                want[ids[1:U + 1]] = np.asarray(rows)[1:U + 1]
                got = update_rows(jnp.asarray(table), jnp.asarray(ids),
                                  jnp.asarray(rows), interpret=True)
                assert got.dtype == table.dtype
                np.testing.assert_array_equal(np.asarray(got), want)

    def test_gather_rows_matches_take(self, rng):
        """gather_rows == jnp.take(table, min(ids, R-1)) incl. the
        out-of-range sentinel tail (clamped to the last row)."""
        from cikm2020_dmt_tpu.ops.scatter_rows import gather_rows
        for d in (128, 256):
            R, U = 500, 90
            table = rng.normal(size=(R, d)).astype(np.float32)
            ids = np.sort(rng.choice(R, U, replace=False)).astype(np.int32)
            ids = np.concatenate([np.array([-2], np.int32), ids,
                                  R + np.arange(17, dtype=np.int32)])
            want = table[np.clip(ids, 0, R - 1)]
            got = gather_rows(jnp.asarray(table), jnp.asarray(ids),
                              interpret=True)
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_scatter_add_rows_matches_at_add(self, rng):
        R, D, N = 200, 16, 1000
        ids = rng.integers(0, R, N).astype(np.int32)
        rows = rng.normal(size=(N, D)).astype(np.float32)
        want = np.zeros((R, D), np.float32)
        np.add.at(want, ids, rows)
        got = scatter_add_rows(jnp.asarray(ids), jnp.asarray(rows), R,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=1e-4)


class TestAdamUpdateRows:
    @pytest.mark.parametrize("dt", [np.float32, jnp.bfloat16])
    def test_matches_two_stage_math(self, rng, dt):
        """Fused kernel (interpret) == _adam_rows_math + .at[].set for
        sorted unique ids with a sentinel tail."""
        from cikm2020_dmt_tpu.ops.scatter_rows import adam_update_rows
        from cikm2020_dmt_tpu.train.lazy import _adam_rows_math
        R, U, d = 400, 64, 128
        b1, b2, eps = 0.9, 0.999, 1e-8
        table = jnp.asarray(rng.normal(size=(R, d)).astype(dt))
        mv = jnp.asarray(np.abs(rng.normal(size=(R, 2 * d))
                                ).astype(np.float32))
        nreal = 40
        ids = np.concatenate([
            np.sort(rng.choice(R, nreal, replace=False)),
            R + np.arange(U - nreal)]).astype(np.int32)
        rows = jnp.take(table, jnp.minimum(jnp.asarray(ids), R - 1), axis=0)
        g = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
        mvu = jnp.take(mv, jnp.minimum(jnp.asarray(ids), R - 1), axis=0)
        lr, count = jnp.float32(0.01), jnp.int32(7)

        p_new, mv_new = _adam_rows_math(rows, g, mvu, lr, count,
                                        b1, b2, eps, table.dtype)
        want_t = np.asarray(table).copy()
        want_t[ids[:nreal]] = np.asarray(p_new)[:nreal]
        want_mv = np.asarray(mv).copy()
        want_mv[ids[:nreal]] = np.asarray(mv_new)[:nreal]

        got_t, got_mv = adam_update_rows(
            table, mv, jnp.asarray(ids), rows, g, mvu, lr, count,
            b1, b2, eps, interpret=True)
        assert got_t.dtype == table.dtype
        np.testing.assert_allclose(np.asarray(got_t, np.float32),
                                   want_t.astype(np.float32),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_mv), want_mv,
                                   rtol=1e-6, atol=1e-6)


class TestTiledScatter:
    def test_tiled_matches_at_add(self, rng):
        from cikm2020_dmt_tpu.ops.scatter_rows import tiled_scatter_add
        R, D, N = 4096, 32, 2000
        ids = np.sort(rng.integers(0, R, N)).astype(np.int32)
        rows = rng.normal(size=(N, D)).astype(np.float32)
        want = np.zeros((R, D), np.float32)
        np.add.at(want, ids, rows)
        got = tiled_scatter_add(jnp.asarray(ids), jnp.asarray(rows), R,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:R], want, rtol=2e-5,
                                   atol=1e-4)


class TestTakeOnehot:
    def test_value_and_grad_match_plain_take(self, rng):
        from cikm2020_dmt_tpu.ops.scatter_rows import take_onehot
        table = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
        # duplicates, id 0, max id, and out-of-range ids (clip semantics)
        ids = jnp.asarray(rng.integers(0, 45, size=(8, 12)).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(8, 12, 16)).astype(np.float32))

        def f_oh(t):
            return jnp.sum(take_onehot(t, ids) * ct)

        def f_plain(t):
            return jnp.sum(jnp.take(t, ids, axis=0, mode="clip") * ct)

        np.testing.assert_allclose(f_oh(table), f_plain(table), rtol=1e-6)
        g_o = jax.grad(f_oh)(table)
        g_p = jax.grad(f_plain)(table)
        np.testing.assert_allclose(np.asarray(g_o), np.asarray(g_p),
                                   atol=1e-5)

    def test_bf16_cotangent_keeps_table_dtype(self, rng):
        from cikm2020_dmt_tpu.ops.scatter_rows import take_onehot
        table = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 24, size=(64,)).astype(np.int32))

        def f(t):
            return jnp.sum(take_onehot(t.astype(jnp.bfloat16), ids)
                           .astype(jnp.float32) ** 2)

        g = jax.grad(f)(table)
        assert g.dtype == jnp.float32
        assert np.isfinite(np.asarray(g)).all()


class TestSortedSegsum:
    def _ref(self, g, seg, num_out):
        # float64 oracle: the kernel's chunked carry-chain accumulation
        # order differs from sequential np.add.at, so long Zipf runs
        # (500+ terms) legitimately diverge by ~1e-5 in f32
        out = np.zeros((num_out, g.shape[1]), np.float64)
        np.add.at(out, seg, g.astype(np.float64))
        return out

    @pytest.mark.parametrize("case", ["uniform", "zipf", "one_run",
                                      "boundary", "capped", "ragged"])
    def test_matches_segment_sum(self, rng, case):
        from cikm2020_dmt_tpu.ops.scatter_rows import sorted_segment_sum_rows
        d, chunk = 128, 64
        if case == "uniform":
            n, runs = 1000, 300
        elif case == "zipf":
            n, runs = 2000, 50
        elif case == "one_run":
            n, runs = 500, 1
        elif case == "boundary":
            n, runs = 4 * chunk, 4   # run flips exactly at chunk edges
        elif case == "capped":
            n, runs = 1000, 200
        else:
            n, runs = 777, 120       # n not a chunk multiple
        if case == "boundary":
            seg = np.repeat(np.arange(4), chunk).astype(np.int32)
        elif case == "zipf":
            draws = np.minimum(rng.zipf(1.3, n) - 1, runs - 1)
            seg = np.sort(draws).astype(np.int32)
            seg = np.cumsum(np.diff(seg, prepend=seg[0]) > 0).astype(np.int32)
        else:
            # dense nondecreasing run ids with every value present
            cuts = np.sort(rng.choice(np.arange(1, n), runs - 1,
                                      replace=False)) if runs > 1 else []
            seg = np.zeros(n, np.int32)
            seg[list(cuts)] = 1
            seg = np.cumsum(seg).astype(np.int32)
        num_out = int(seg.max()) + 1
        if case == "capped":
            num_out += 37            # budget beyond runs: tail stays zero
        g = rng.normal(size=(n, d)).astype(np.float32)
        got = sorted_segment_sum_rows(jnp.asarray(g), jnp.asarray(seg),
                                      num_out, chunk=chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   self._ref(g, seg, num_out),
                                   rtol=1e-4, atol=2e-4)

    def test_bf16_input_accumulates_f32(self, rng):
        """bf16 cotangent rows (bf16-table grids, the production default)
        sum exactly in f32 inside the kernel; output is f32."""
        from cikm2020_dmt_tpu.ops.scatter_rows import sorted_segment_sum_rows
        n, d, chunk, runs = 1000, 128, 64, 40
        cuts = np.sort(rng.choice(np.arange(1, n), runs - 1, replace=False))
        seg = np.zeros(n, np.int32)
        seg[list(cuts)] = 1
        seg = np.cumsum(seg).astype(np.int32)
        num_out = runs
        g = rng.normal(size=(n, d)).astype(jnp.bfloat16)
        got = sorted_segment_sum_rows(jnp.asarray(g), jnp.asarray(seg),
                                      num_out, chunk=chunk, interpret=True)
        assert got.dtype == jnp.float32
        want = np.zeros((num_out, d), np.float32)
        np.add.at(want, seg, np.asarray(g, np.float32))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)

    def test_sorted_vjp_matches_plain(self, rng):
        from cikm2020_dmt_tpu.ops.scatter_rows import (take_rows_sparse,
                                                       take_rows_sparse_sorted)
        U, N, D = 40, 300, 128
        ids = rng.integers(0, 60, N).astype(np.int32)
        order = np.argsort(ids, kind="stable").astype(np.int32)
        sids = ids[order]
        first = np.concatenate([[True], sids[1:] != sids[:-1]])
        seg = (np.cumsum(first) - 1).astype(np.int32)
        seg = np.minimum(seg, U)                     # budget cap -> slot U
        pos = np.empty(N, np.int32)
        pos[order] = seg
        rows_ext = rng.normal(size=(U + 1, D)).astype(np.float32)

        def f(fn, *extra):
            return lambda r: jnp.sum(jnp.sin(fn(r, jnp.asarray(pos), *extra)))

        g1 = jax.grad(f(take_rows_sparse))(jnp.asarray(rows_ext))
        g2 = jax.grad(f(take_rows_sparse_sorted, jnp.asarray(order),
                        jnp.asarray(seg)))(jnp.asarray(rows_ext))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)
