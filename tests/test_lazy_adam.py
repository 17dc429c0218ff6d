"""Lazy (row-sparse) Adam + exact small-table dedup backward.

Covers train/lazy.py (id-union collection, overlay lookups, LazyAdam row
update), the engine overlay dispatch (parallel/embedding_shard.py), and
ops/scatter_rows.dedup_take_exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import __graft_entry__ as g
from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
from cikm2020_dmt_tpu.ops.scatter_rows import dedup_take_exact
from cikm2020_dmt_tpu.train.loop import Trainer

KW = dict(sku_rows=4096, batch_size=64, validate_step=10**9,
          dedup_rows_threshold=1000, pack_rows_threshold=1000,
          # algorithm-parity tests compare against f32 oracles; pin
          # storage to f32 (the r5 default bf16-ifies every >=500-row
          # table — dtype variants are exercised by their own tests)
          table_bf16_threshold=0)


def one_dev_mesh():
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))


def run_steps(cfg, batches, n_steps):
    tr = Trainer(cfg, mesh=one_dev_mesh())
    ts = tr.shard_state(tr.init_state())
    step = tr._train_step()
    rng = jax.random.key(0, impl="rbg")
    loss = None
    for i in range(n_steps):
        b = tr.device_batch(g._as_batch(batches[i % len(batches)]))
        ts, _, loss = step(ts, task_metrics_init(), b,
                           jax.random.fold_in(rng, i))
    return tr, ts, float(loss)


def canon_mv(x):
    """Moment layouts differ by flavor (flat [2R, D] plain vs [2, R, D]
    sharded/full-mesh — see Trainer.init_state); normalize to [2, R, D]
    for cross-flavor parity asserts."""
    x = np.asarray(x)
    return x.reshape(2, -1, x.shape[-1]) if x.ndim == 2 else x


class TestLazyAdam:
    def test_plan_gating(self):
        cfg = g._demo_config(**KW)
        tr = Trainer(cfg, mesh=one_dev_mesh())
        names = {t.name for t in tr.lazy_plan}
        # every table at/above the threshold, none below
        assert "Sku" in names and "Cid2" not in names
        # multi-device meshes keep the plan (data-parallel: plain path;
        # model-split tables: sharded update — see TestDataParallelLazy /
        # TestShardedLazy)
        if len(jax.devices()) > 1:
            tr8 = Trainer(cfg)
            assert any(t.name == "Sku" for t in tr8.lazy_plan)
        # non-adam optimizer disables it
        tr_sgd = Trainer(g._demo_config(optimizer="sgd", **KW),
                         mesh=one_dev_mesh())
        assert tr_sgd.lazy_plan == ()
        # flag off disables it
        tr_off = Trainer(g._demo_config(lazy_adam=False, **KW),
                         mesh=one_dev_mesh())
        assert tr_off.lazy_plan == ()

    def test_first_step_matches_dense_adam(self):
        """With zero moments, LazyAdam's first step equals dense Adam
        exactly: untouched rows get zero update either way."""
        batch = g.synthetic_batch(g._demo_config(**KW), 64)
        results = {}
        for lazy in (True, False):
            cfg = g._demo_config(lazy_adam=lazy, **KW)
            _, ts, loss = run_steps(cfg, [batch], 1)
            results[lazy] = (
                jax.tree_util.tree_map(np.asarray, ts["params"]), loss)
        pl, pd = results[True][0], results[False][0]
        assert results[True][1] == pytest.approx(results[False][1], abs=1e-5)
        for k in pd["emb"]:
            np.testing.assert_allclose(pl["emb"][k], pd["emb"][k],
                                       atol=1e-6, err_msg=k)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            {k: v for k, v in pl.items() if k != "emb"},
            {k: v for k, v in pd.items() if k != "emb"})

    def test_multi_step_matches_numpy_lazyadam(self):
        """3 steps over distinct batches must track a numpy LazyAdam
        simulator driven by the dense per-step gradients (computed at the
        lazy trainer's own parameter trajectory)."""
        cfg = g._demo_config(**KW)
        batches = [g.synthetic_batch(cfg, 64, seed=s) for s in (0, 1, 2)]
        tr = Trainer(cfg, mesh=one_dev_mesh())
        assert any(t.name == "Sku" for t in tr.lazy_plan)
        ts = tr.shard_state(tr.init_state())
        step = tr._train_step()
        rng = jax.random.key(0, impl="rbg")

        # dense-gradient oracle on an overlay-free twin
        cfg_d = g._demo_config(lazy_adam=False, **KW)
        tr_d = Trainer(cfg_d, mesh=one_dev_mesh())
        grad_fn = jax.jit(jax.grad(
            lambda p, ms, b, r: tr_d.loss_fn(p, ms, b, r)[0]))

        sku = np.asarray(ts["params"]["emb"]["Sku"], np.float64)
        m = np.zeros_like(sku)
        v = np.zeros_like(sku)
        b1, b2, eps = 0.9, 0.999, 1e-8
        lr = float(tr._schedule(jnp.int32(1)))
        for i in range(3):
            db = tr.device_batch(g._as_batch(batches[i]))
            flat = {k: jnp.asarray(v)
                    for k, v in g._as_batch(batches[i]).arrays.items()}
            r = jax.random.fold_in(rng, i)
            gtab = np.asarray(
                grad_fn(ts["params"], ts["model_state"], flat, r)
                ["emb"]["Sku"], np.float64)
            ts, _, _ = step(ts, task_metrics_init(), db, r)
            # touched physical rows = the batch's id union (plan fields)
            from cikm2020_dmt_tpu.train.lazy import collect
            spec = next(t for t in tr.lazy_plan if t.name == "Sku")
            col = collect(spec, flat,
                          jnp.asarray(sku.astype(np.float32)),
                          cfg.dedup_budget_div)
            uids = np.unique(np.asarray(col.uids))
            uids = uids[uids < sku.shape[0]]
            t = i + 1
            m[uids] = b1 * m[uids] + (1 - b1) * gtab[uids]
            v[uids] = b2 * v[uids] + (1 - b2) * gtab[uids] ** 2
            mhat = m[uids] / (1 - b1 ** t)
            vhat = v[uids] / (1 - b2 ** t)
            sku[uids] -= lr * mhat / (np.sqrt(vhat) + eps)
        got = np.asarray(ts["params"]["emb"]["Sku"], np.float64)
        np.testing.assert_allclose(got, sku, atol=2e-5)

    def test_checkpoint_roundtrip(self, tmp_path):
        """lazy_opt state survives save/restore, and the eval-side
        structure-agnostic restore reads params from a lazy checkpoint."""
        cfg = g._demo_config(output_path=str(tmp_path), **KW)
        batch = g.synthetic_batch(cfg, 64)
        tr, ts, _ = run_steps(cfg, [batch], 2)
        tr._save(ts, 2, task_metrics_init())
        template = jax.tree_util.tree_map(np.asarray, tr.init_state())
        restored = tr.ckpt.restore(2, template)
        assert "lazy_opt" in restored
        np.testing.assert_allclose(
            np.asarray(restored["params"]["emb"]["Sku"]),
            np.asarray(ts["params"]["emb"]["Sku"]))
        np.testing.assert_allclose(
            np.asarray(restored["lazy_opt"]["Sku"]["mv"]),
            np.asarray(ts["lazy_opt"]["Sku"]["mv"]))
        from cikm2020_dmt_tpu.train.evaluate import _restore_for_eval
        raw = _restore_for_eval(tr.ckpt, 2, tr.model)
        np.testing.assert_allclose(
            np.asarray(raw["params"]["emb"]["Sku"]),
            np.asarray(ts["params"]["emb"]["Sku"]))

    def test_budget_overflow_degrades_gracefully(self):
        """All-unique ids blowing the N/div budget must not NaN or crash:
        overflowed ids read the zero row and take no gradient."""
        cfg = g._demo_config(dedup_budget_div=64, **KW)
        batch = g.synthetic_batch(cfg, 64)
        # force near-unique sku ids
        rng = np.random.default_rng(7)
        for k in list(batch):
            if "sku" in k and k.endswith("__ids"):
                ids = rng.permutation(4096)[: batch[k].size]
                batch[k] = (ids.reshape(batch[k].shape)
                            * (batch[k] != 0)).astype(np.int32)
        _, ts, loss = run_steps(cfg, [batch], 2)
        assert np.isfinite(loss)
        assert np.isfinite(np.asarray(ts["params"]["emb"]["Sku"])).all()
        # the overflow counter must surface the dropped ids
        assert int(ts["lazy_overflow"]) > 0

    def test_no_overflow_counter_stays_zero(self):
        cfg = g._demo_config(**KW)
        batch = g.synthetic_batch(cfg, 64)
        _, ts, _ = run_steps(cfg, [batch], 2)
        assert int(ts["lazy_overflow"]) == 0


class TestExactDedup:
    def test_value_and_grad_match_plain_take(self):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32))
        # duplicates, id 0, max id, and out-of-range ids (clip semantics)
        ids = jnp.asarray(
            rng.integers(0, 45, size=(8, 12)).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(8, 12, 16)).astype(np.float32))

        def f_exact(t):
            return jnp.sum(dedup_take_exact(t, ids) * ct)

        def f_plain(t):
            return jnp.sum(jnp.take(t, ids, axis=0, mode="clip") * ct)

        np.testing.assert_allclose(f_exact(table), f_plain(table),
                                   rtol=1e-6)
        g_e = jax.grad(f_exact)(table)
        g_p = jax.grad(f_plain)(table)
        np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_p),
                                   atol=1e-5)

    def test_n_smaller_than_rows(self):
        table = jnp.ones((1000, 4))
        ids = jnp.asarray([3, 3, 7], jnp.int32)
        ct = jnp.asarray(np.full((3, 4), 2.0, np.float32))
        grad = jax.grad(
            lambda t: jnp.sum(dedup_take_exact(t, ids) * ct))(table)
        dense = np.zeros((1000, 4), np.float32)
        dense[3] = 4.0
        dense[7] = 2.0
        np.testing.assert_allclose(np.asarray(grad), dense)


class TestLazyScheduleParity:
    def test_lr_boundary_matches_optax_convention(self):
        """optax.scale_by_schedule evaluates at the PRE-increment count:
        update k (1-based) uses schedule(k-1).  The lazy path must switch
        piecewise-constant rates on the same update as the dense params."""
        from cikm2020_dmt_tpu.train.lazy import lazy_adam_rows
        from cikm2020_dmt_tpu.train.optim import piecewise_constant
        sched = piecewise_constant((2,), (0.1, 0.01))
        R, D = 4, 128
        uids = jnp.arange(R, dtype=jnp.int32)
        rows = jnp.ones((R, D), jnp.float32)
        grows = jnp.ones((R, D), jnp.float32)
        b1, b2, eps = 0.9, 0.999, 1e-8
        # update number k uses schedule(k-1); tf.train.piecewise_constant
        # keeps rates[0] for step <= boundary, so the switch lands on the
        # update where k-1 > 2, i.e. k=4
        for k, want_lr in ((1, 0.1), (3, 0.1), (4, 0.01)):
            table = jnp.ones((R, D), jnp.float32)
            mv = jnp.zeros((2 * R, D), jnp.float32)  # flat row-stacked
            t2, _ = lazy_adam_rows(table, mv, uids, rows, grows,
                                   jnp.int32(k), sched)
            mhat = (1 - b1) / (1 - b1 ** k)
            vhat = (1 - b2) / (1 - b2 ** k)
            want = 1.0 - want_lr * mhat / (np.sqrt(vhat) + eps)
            np.testing.assert_allclose(np.asarray(t2)[0, 0], want,
                                       rtol=1e-5)


class TestOverflowExactForward:
    """cfg.lazy_overflow_exact: budget-overflowed ids must read their TRUE
    table rows in the forward (only their gradient is skipped)."""

    def _setup(self):
        from cikm2020_dmt_tpu.train.lazy import LazyTableSpec, collect
        R, D = 512, 8
        table = jnp.arange(R * D, dtype=jnp.float32).reshape(R, D) / (R * D)
        rng = np.random.default_rng(3)
        # N=2048 elements covering all 512 distinct ids -> U=256 budget,
        # 256 unique ids overflow
        ids = rng.integers(0, R, size=(64, 32)).astype(np.int32)
        ids.flat[:R] = np.arange(R)  # guarantee all 512 ids present
        batch = {"f__ids": ids}
        spec = LazyTableSpec("T", (("f", R),), 1, D)
        col = collect(spec, batch, table, budget_div=8)
        assert int(col.overflow) > 0
        return spec, col, table, batch, ids

    def test_forward_exact_with_fallback(self):
        from cikm2020_dmt_tpu.train.lazy import make_overlay, overlay_take
        spec, col, table, batch, ids = self._setup()
        ov = make_overlay(spec, col, col.rows, table=table)
        got = overlay_take(ov, batch["f__ids"])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(table)[ids], rtol=1e-6)

    def test_zero_rows_without_fallback(self):
        from cikm2020_dmt_tpu.train.lazy import make_overlay, overlay_take
        spec, col, table, batch, ids = self._setup()
        ov = make_overlay(spec, col, col.rows)
        got = np.asarray(overlay_take(ov, batch["f__ids"]))
        # overflowed elements read the zero row (pre-fallback behavior);
        # table rows are all nonzero except id 0
        zero_rows = (got == 0).all(axis=-1).sum()
        assert zero_rows > ids.size // 16

    def test_gradient_skipped_only_for_overflow(self):
        from cikm2020_dmt_tpu.train.lazy import make_overlay, overlay_take
        spec, col, table, batch, ids = self._setup()

        def f(rows_diff):
            ov = make_overlay(spec, col, rows_diff, table=table)
            return jnp.sum(overlay_take(ov, batch["f__ids"]))

        g = np.asarray(jax.grad(f)(col.rows))
        assert np.isfinite(g).all()
        # in-budget rows accumulate their duplication count; totals match
        # the number of non-overflowed elements
        pos = np.asarray(col.pos)
        U = col.rows.shape[0]
        assert g.sum() == pytest.approx((pos < U).sum() * table.shape[1])


class TestBf16Tables:
    """cfg.table_bf16_threshold: big tables stored bfloat16, update math
    f32 (nn/embedding.collection_init + train/lazy.lazy_adam_rows)."""

    BKW = dict(KW, table_bf16_threshold=1000)

    def test_dtypes_and_update(self):
        cfg = g._demo_config(**self.BKW)
        batch = g.synthetic_batch(cfg, 64)
        tr = Trainer(cfg, mesh=one_dev_mesh())
        assert any(t.name == "Sku" for t in tr.lazy_plan)
        ts0 = tr.shard_state(tr.init_state())
        emb0 = {k: np.asarray(v) for k, v in ts0["params"]["emb"].items()}
        # threshold: Sku (4096 rows) bf16, Cid2 (500) stays param_dtype
        assert ts0["params"]["emb"]["Sku"].dtype == jnp.bfloat16
        assert ts0["params"]["emb"]["Cid2"].dtype == jnp.float32
        # moments stay f32 regardless of the table dtype
        assert ts0["lazy_opt"]["Sku"]["mv"].dtype == jnp.float32

        _, ts, loss = run_steps(cfg, [batch], 2)
        assert np.isfinite(loss)
        sku = np.asarray(ts["params"]["emb"]["Sku"])
        assert sku.dtype == np.dtype("bfloat16") or sku.dtype.name == "bfloat16"
        # touched rows moved; the table kept its dtype through the update
        assert (sku != emb0["Sku"]).any()
        assert ts["params"]["emb"]["Sku"].dtype == jnp.bfloat16

    def test_step_close_to_f32(self):
        """Same f32-initialized params, big table cast to bf16: one train
        step's loss must track the f32 run within bf16 tolerance."""
        cfg = g._demo_config(**KW)
        batch = g.synthetic_batch(cfg, 64)
        tr = Trainer(cfg, mesh=one_dev_mesh())
        ts = tr.shard_state(tr.init_state())
        step = tr._train_step()
        rng = jax.random.key(0, impl="rbg")
        b = tr.device_batch(g._as_batch(batch))
        _, _, loss32 = step(ts, task_metrics_init(), b,
                            jax.random.fold_in(rng, 0))

        ts_b = tr.shard_state(tr.init_state())
        ts_b["params"]["emb"]["Sku"] = (
            ts_b["params"]["emb"]["Sku"].astype(jnp.bfloat16))
        step_b = tr._train_step()
        _, _, loss16 = step_b(ts_b, task_metrics_init(), b,
                              jax.random.fold_in(rng, 0))
        assert float(loss16) == pytest.approx(float(loss32), rel=2e-2)

    def test_f32_math_wrapper(self):
        """Dense-path adam on bf16 params: moments live in f32, the
        update math runs f32, and only the returned update is rounded
        to the param dtype (train/optim.f32_math)."""
        import optax

        from cikm2020_dmt_tpu.train.optim import f32_math

        opt = f32_math(optax.adam(1e-3))
        params = {"w": jnp.full((4, 8), 0.5, jnp.bfloat16),
                  "v": jnp.zeros((3,), jnp.float32)}
        state = opt.init(params)
        mus = jax.tree_util.tree_leaves(state[0].mu)
        assert all(m.dtype == jnp.float32 for m in mus), mus
        grads = {"w": jnp.full((4, 8), 1e-4, jnp.bfloat16),
                 "v": jnp.ones((3,), jnp.float32)}
        updates, state = opt.update(grads, state, params)
        assert updates["w"].dtype == jnp.bfloat16
        assert updates["v"].dtype == jnp.float32
        # adam's first normalized step is ~lr regardless of grad scale
        assert np.all(np.abs(np.asarray(updates["w"],
                                        np.float32)) > 1e-4)

    def test_dense_bf16_table_trains(self):
        """End-to-end: with lazy Adam OFF, a bf16-stored table updates
        through the dense optax path — moments live in f32 (f32_math)
        and the table actually moves over steps (the round-to-zero
        hazard the wrapper exists to prevent)."""
        cfg = g._demo_config(lazy_adam=False, **self.BKW)
        tr = Trainer(cfg, mesh=one_dev_mesh())
        ts = tr.shard_state(tr.init_state())
        sku0 = np.asarray(ts["params"]["emb"]["Sku"], np.float32).copy()
        assert ts["params"]["emb"]["Sku"].dtype == jnp.bfloat16
        # optax state must carry f32 moments for the bf16 leaf
        leaves = jax.tree_util.tree_leaves(ts["opt_state"])
        assert all(l.dtype != jnp.bfloat16 for l in leaves
                   if hasattr(l, "dtype") and l.ndim == 2), [
            (l.shape, l.dtype) for l in leaves if hasattr(l, "dtype")]
        step = tr._train_step()
        batch = tr.device_batch(g._as_batch(g.synthetic_batch(cfg, 64)))
        rng = jax.random.key(0, impl="rbg")
        for i in range(2):
            ts, _, loss = step(ts, task_metrics_init(), batch,
                               jax.random.fold_in(rng, i))
        assert np.isfinite(float(loss))
        sku1 = np.asarray(ts["params"]["emb"]["Sku"], np.float32)
        moved = np.mean(np.any(sku1 != sku0, axis=1))
        # the synthetic batch touches a fraction of rows; those rows
        # must have moved (adam's first step is ~lr per weight)
        assert moved > 0.001, f"bf16 dense table barely moved: {moved}"

    def test_warns_without_lazy_plan(self, capsys):
        # adam: no warning — dense bf16 tables run through
        # train/optim.f32_math (f32 moments + update arithmetic, one
        # bf16 rounding at the param write, same as the lazy contract)
        cfg = g._demo_config(lazy_adam=False, **self.BKW)
        Trainer(cfg, mesh=one_dev_mesh())
        assert "bf16 tables" not in capsys.readouterr().out
        # non-adam optimizers keep low-precision state -> still warn
        cfg = g._demo_config(lazy_adam=False, optimizer="adagrad",
                             **self.BKW)
        Trainer(cfg, mesh=one_dev_mesh())
        assert "bf16 tables" in capsys.readouterr().out


class TestDataParallelLazy:
    """Lazy Adam on a pure data-parallel mesh (model axis == 1): the math
    is the single-chip math over the global batch; GSPMD inserts the
    data-axis collectives ([U, D] touched-row all-reduce instead of the
    dense [R, D] table-gradient all-reduce)."""

    def _mesh(self, data):
        devs = jax.devices()
        if len(devs) < data:
            pytest.skip(f"needs {data} devices")
        return Mesh(np.array(devs[:data]).reshape(data, 1),
                    ("data", "model"))

    def test_plan_enabled_on_data_mesh(self):
        cfg = g._demo_config(mesh_data=8, mesh_model=1, **KW)
        tr = Trainer(cfg, mesh=self._mesh(8))
        assert any(t.name == "Sku" for t in tr.lazy_plan)

    def test_matches_single_device_lazy(self):
        """Same global batch, same seed: the 8-way data-parallel lazy step
        must reproduce the single-device lazy step (identical uids/rows
        math; only the collective schedule differs)."""
        batch = g.synthetic_batch(g._demo_config(**KW), 64)
        results = {}
        for data in (1, 8):
            cfg = g._demo_config(mesh_data=data, mesh_model=1, **KW)
            tr = Trainer(cfg, mesh=self._mesh(data))
            assert tr.lazy_plan
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[data] = (
                float(loss),
                np.asarray(ts["params"]["emb"]["Sku"]),
                canon_mv(ts["lazy_opt"]["Sku"]["mv"]))
        assert results[1][0] == pytest.approx(results[8][0], rel=1e-5)
        # cross-device psum reassociation reaches the params through
        # Adam's rsqrt; measured spread is ~5e-6 relative (33/262k
        # elements past 2e-6 at one step)
        np.testing.assert_allclose(results[1][1], results[8][1],
                                   atol=1e-4, err_msg="Sku table")
        np.testing.assert_allclose(results[1][2], results[8][2],
                                   atol=1e-4, err_msg="Sku moments")

    def test_first_step_matches_dense_adam_on_mesh(self):
        batch = g.synthetic_batch(g._demo_config(**KW), 64)
        results = {}
        for lazy in (True, False):
            cfg = g._demo_config(mesh_data=8, mesh_model=1, lazy_adam=lazy,
                                 **KW)
            tr = Trainer(cfg, mesh=self._mesh(8))
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[lazy] = (float(loss),
                             np.asarray(ts["params"]["emb"]["Sku"]))
        assert results[True][0] == pytest.approx(results[False][0],
                                                 abs=1e-5)
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   atol=1e-5)


class TestShardedLazy:
    """Lazy Adam with row-split tables on a (data x model) mesh: union
    rows exchanged once per step (shard_take_rows), update local per
    shard (lazy_adam_rows_sharded).  Pinned to the model-axis flavor
    (full_mesh_tables=False); the default full-mesh flavor is covered by
    TestFullMeshLazy."""

    SKW = dict(KW, shard_rows_threshold=512, full_mesh_tables=False)

    def _mesh(self, data, model):
        devs = jax.devices()
        if len(devs) < data * model:
            pytest.skip(f"needs {data * model} devices")
        return Mesh(np.array(devs[:data * model]).reshape(data, model),
                    ("data", "model"))

    def test_plan_marks_sharded(self):
        cfg = g._demo_config(mesh_data=2, mesh_model=4, **self.SKW)
        tr = Trainer(cfg, mesh=self._mesh(2, 4))
        by_name = {t.name: t for t in tr.lazy_plan}
        # packed Sku: 4096 logical / pack 4 = 1024 phys rows >= 512 -> split
        assert by_name["Sku"].sharded
        # packed Cid3: 2048 / 16 = 128 phys rows < 512 -> replicated plan
        assert "Cid3" in by_name and not by_name["Cid3"].sharded

    def test_first_step_matches_dense_adam_sharded(self):
        batch = g.synthetic_batch(g._demo_config(**self.SKW), 64)
        results = {}
        for lazy in (True, False):
            cfg = g._demo_config(mesh_data=2, mesh_model=4, lazy_adam=lazy,
                                 **self.SKW)
            tr = Trainer(cfg, mesh=self._mesh(2, 4))
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[lazy] = (float(loss),
                             np.asarray(ts["params"]["emb"]["Sku"]),
                             np.asarray(ts["params"]["emb"]["Cid3"]))
        assert results[True][0] == pytest.approx(results[False][0],
                                                 abs=1e-4)
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   atol=1e-4, err_msg="Sku")
        np.testing.assert_allclose(results[True][2], results[False][2],
                                   atol=1e-4, err_msg="Cid3")

    def test_matches_single_device_lazy(self):
        batch = g.synthetic_batch(g._demo_config(**self.SKW), 64)
        results = {}
        for data, model in ((1, 1), (2, 4)):
            cfg = g._demo_config(mesh_data=data, mesh_model=model,
                                 **self.SKW)
            tr = Trainer(cfg, mesh=self._mesh(data, model))
            assert tr.lazy_plan
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[(data, model)] = (
                float(loss),
                np.asarray(ts["params"]["emb"]["Sku"]),
                canon_mv(ts["lazy_opt"]["Sku"]["mv"]))
        a, b_ = results[(1, 1)], results[(2, 4)]
        assert a[0] == pytest.approx(b_[0], rel=1e-5)
        np.testing.assert_allclose(a[1], b_[1], atol=1e-4, err_msg="Sku")
        np.testing.assert_allclose(a[2], b_[2], atol=1e-4, err_msg="mv")


class TestFullMeshLazy:
    """Full-mesh table sharding (parallel/full_shard.py): rows split over
    data x model, per-data-shard unions, all_to_all row fetch + gradient
    push.  Parity targets: the single-device lazy step and the dense-Adam
    step (same contracts the model-axis flavor meets)."""

    FKW = dict(KW, shard_rows_threshold=512, dedup_budget_div=1)
    # div=1: the per-shard budget covers every unique id, so parity runs
    # never hit the overflow/capacity paths (those are tested separately)

    def _mesh(self, data, model):
        devs = jax.devices()
        if len(devs) < data * model:
            pytest.skip(f"needs {data * model} devices")
        return Mesh(np.array(devs[:data * model]).reshape(data, model),
                    ("data", "model"))

    def test_plan_marks_full_mesh(self):
        for data, model in ((2, 4), (8, 1)):
            cfg = g._demo_config(mesh_data=data, mesh_model=model,
                                 **self.FKW)
            tr = Trainer(cfg, mesh=self._mesh(data, model))
            by_name = {t.name: t for t in tr.lazy_plan}
            # packed Sku: 1024 phys rows, divisible by 8 -> full mesh
            assert by_name["Sku"].full_mesh and not by_name["Sku"].sharded
            # packed Cid3: 128 phys rows < threshold -> replicated plan
            assert "Cid3" in by_name and not by_name["Cid3"].full_mesh

    def test_param_sharding_spans_both_axes(self):
        from cikm2020_dmt_tpu.core.mesh import param_shardings
        cfg = g._demo_config(mesh_data=2, mesh_model=4, **self.FKW)
        tr = Trainer(cfg, mesh=self._mesh(2, 4))
        ts = tr.init_state()
        psh = param_shardings(cfg, ts["params"], tr.mesh)
        spec = psh["emb"]["Sku"].spec
        assert tuple(spec) == (("data", "model"), None), spec

    def test_fms_grad_bf16_close_to_f32(self):
        """cfg.fms_grad_bf16 (bf16 gradient push over the all_to_all,
        f32 accumulation after receive — the multi-host DCN knob) must
        track the f32 push closely: forward identical, post-step tables
        within bf16-compression tolerance."""
        batch = g.synthetic_batch(g._demo_config(**self.FKW), 64)
        results = {}
        for flag in (False, True):
            cfg = g._demo_config(mesh_data=2, mesh_model=4,
                                 fms_grad_bf16=flag, **self.FKW)
            tr = Trainer(cfg, mesh=self._mesh(2, 4))
            assert any(t.full_mesh for t in tr.lazy_plan)
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[flag] = (float(loss),
                             np.asarray(ts["params"]["emb"]["Sku"],
                                        np.float32))
        # forward path is untouched by the push dtype
        assert results[False][0] == results[True][0]
        # first Adam step is ~sign(g)*lr per element, so bf16-rounding
        # the pushed grads barely moves the updated rows
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   atol=2e-3)

    @pytest.mark.parametrize("data,model", [(2, 4), (4, 2), (8, 1)])
    def test_matches_single_device_lazy(self, data, model):
        batch = g.synthetic_batch(g._demo_config(**self.FKW), 64)
        results = {}
        for d, m in ((1, 1), (data, model)):
            cfg = g._demo_config(mesh_data=d, mesh_model=m, **self.FKW)
            tr = Trainer(cfg, mesh=self._mesh(d, m))
            by_name = {t.name: t for t in tr.lazy_plan}
            if (d, m) != (1, 1):
                assert by_name["Sku"].full_mesh
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            assert int(ts["lazy_overflow"]) == 0
            results[(d, m)] = (
                float(loss),
                np.asarray(ts["params"]["emb"]["Sku"]),
                canon_mv(ts["lazy_opt"]["Sku"]["mv"]))
        a, b_ = results[(1, 1)], results[(data, model)]
        assert a[0] == pytest.approx(b_[0], rel=1e-5)
        np.testing.assert_allclose(a[1], b_[1], atol=1e-4, err_msg="Sku")
        np.testing.assert_allclose(a[2], b_[2], atol=1e-4, err_msg="mv")

    def test_first_step_matches_dense_adam(self):
        batch = g.synthetic_batch(g._demo_config(**self.FKW), 64)
        results = {}
        for lazy in (True, False):
            cfg = g._demo_config(mesh_data=2, mesh_model=4, lazy_adam=lazy,
                                 **self.FKW)
            tr = Trainer(cfg, mesh=self._mesh(2, 4))
            ts = tr.shard_state(tr.init_state())
            step = tr._train_step()
            b = tr.device_batch(g._as_batch(batch))
            ts, _, loss = step(ts, task_metrics_init(), b,
                               jax.random.fold_in(jax.random.key(
                                   0, impl="rbg"), 0))
            results[lazy] = (float(loss),
                             np.asarray(ts["params"]["emb"]["Sku"]),
                             np.asarray(ts["params"]["emb"]["Cid3"]))
        assert results[True][0] == pytest.approx(results[False][0],
                                                 abs=1e-4)
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   atol=1e-4, err_msg="Sku")
        np.testing.assert_allclose(results[True][2], results[False][2],
                                   atol=1e-4, err_msg="Cid3")

    def test_capacity_overflow_counted_and_forward_exact(self):
        """Tiny DMT_FMS_CAP_MULT forces bucket-capacity overflow: the
        forward must fall back to the exact fetch (loss matches the
        roomy-capacity run) and the overflow counter must fire."""
        import os
        # big table (rows_per_device >> capacity floor) + near-unique sku
        # ids spread over the full range: uniques-per-owner must exceed
        # cap*U/N + 128 for the 0.01 run to actually overflow — a small
        # table can never overflow (capacity >= rows per device)
        kw = dict(self.FKW, sku_rows=65536)
        batch = g.synthetic_batch(g._demo_config(**kw), 64)
        rng = np.random.default_rng(7)
        for k in list(batch):
            if "sku" in k and k.endswith("__ids"):
                # ~70% of ids concentrated in owner 0's row range
                # (about half the slots are sequence padding and zero
                # out): the 0.01-mult capacity (128 floor) overflows
                # that bucket (~170 uniques per model slice) while the
                # 2.0-mult capacity (272) still holds it — the slack
                # floor is per (requester, owner) bucket, so a uniform
                # id spread can no longer overflow the sliced layout
                n = batch[k].size
                n0 = int(0.7 * n)
                ids = np.concatenate([
                    rng.permutation(8192)[:n0],
                    8192 + rng.permutation(65536 - 8192)[:n - n0]])
                ids = rng.permutation(ids)
                batch[k] = (ids.reshape(batch[k].shape)
                            * (batch[k] != 0)).astype(np.int32)
        losses = {}
        for mult in ("2.0", "0.01"):
            os.environ["DMT_FMS_CAP_MULT"] = mult
            try:
                cfg = g._demo_config(mesh_data=2, mesh_model=4, **kw)
                tr = Trainer(cfg, mesh=self._mesh(2, 4))
                ts = tr.shard_state(tr.init_state())
                step = tr._train_step()
                b = tr.device_batch(g._as_batch(batch))
                ts, _, loss = step(ts, task_metrics_init(), b,
                                   jax.random.fold_in(jax.random.key(
                                       0, impl="rbg"), 0))
                losses[mult] = float(loss)
                if mult == "0.01":
                    assert int(ts["lazy_overflow"]) > 0
                else:
                    assert int(ts["lazy_overflow"]) == 0
            finally:
                os.environ.pop("DMT_FMS_CAP_MULT", None)
        assert losses["2.0"] == pytest.approx(losses["0.01"], rel=1e-5)


class TestGridBf16:
    def test_hybrid_tracks_f32(self):
        """grid_bf16 (f32 tables + bf16 union grid) must track the plain
        f32 run closely: only the grid values and their cotangents round
        to bf16; the Adam update reads true f32 rows and writes f32."""
        cfg32 = g._demo_config(**KW)
        cfgh = g._demo_config(grid_bf16=True, **KW)
        batches = [g.synthetic_batch(cfg32, 64, seed=s) for s in (0, 1)]
        _, ts32, loss32 = run_steps(cfg32, batches, 2)
        _, tsh, lossh = run_steps(cfgh, batches, 2)
        sku = np.asarray(tsh["params"]["emb"]["Sku"])
        assert sku.dtype == np.float32
        assert np.isfinite(lossh)
        # bf16 grid rounding perturbs the loss at ~1e-2 relative scale
        assert lossh == pytest.approx(loss32, rel=2e-2)
        np.testing.assert_allclose(
            sku, np.asarray(ts32["params"]["emb"]["Sku"]), atol=5e-3)
