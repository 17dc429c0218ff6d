"""Row-DMA kernel + scatter-free gather tests (ops/scatter_rows), in
interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.ops.scatter_rows import update_rows


class TestUpdateRows:
    @pytest.mark.parametrize("dt", [np.float32, np.int32])
    def test_update_rows_in_place(self, rng, dt):
        """update_rows == .at[ids].set(rows, mode='drop') for unique sorted
        ids incl. the lazy-Adam out-of-range sentinel tail (skipped).
        32-bit dtypes at 128 lanes only — the hardware law (v5e Mosaic
        rejects 16-bit and >128-lane row slices; wide rows row-stack to
        [k*R, 128] instead, see lazy_adam_rows)."""
        for d in (128,):
            R, U = 500, 90
            table = rng.normal(size=(R, d)).astype(dt)
            ids = np.sort(rng.choice(R, U, replace=False)).astype(np.int32)
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
