"""Sharding tests on the 8-virtual-device CPU mesh: sharded embedding
lookups must match the replicated path bit-for-bit; gradients must flow to
the correct table rows; the full sharded train step must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cikm2020_dmt_tpu.core.mesh import (MODEL_AXIS, batch_sharding,
                                        build_mesh, param_shardings)
from cikm2020_dmt_tpu.nn.embedding import pooled_lookup, seq_lookup
from cikm2020_dmt_tpu.parallel.embedding_shard import (
    ShardedEmbeddingEngine, make_engine, should_shard_table)

from conftest import make_demo_config


@pytest.fixture(scope="module")
def mesh22():
    cfg = make_demo_config(mesh_data=4, mesh_model=2, shard_rows_threshold=64)
    return cfg, build_mesh(cfg)


def _rand_lookup_case(rng, rows=256, dim=8, B=8, L=6):
    table = rng.normal(size=(rows, dim)).astype(np.float32)
    ids = rng.integers(0, rows, (B, L)).astype(np.int32)
    lens = rng.integers(0, L + 1, B).astype(np.int32)
    wts = (rng.random((B, L)) + 0.25).astype(np.float32)
    wts = wts * (np.arange(L)[None] < lens[:, None])
    return table, ids, wts, lens


class TestShardedLookups:
    def test_policy(self, mesh22):
        cfg, mesh = mesh22
        assert should_shard_table(cfg, mesh, 256)
        assert not should_shard_table(cfg, mesh, 32)     # below threshold
        assert not should_shard_table(cfg, mesh, 129)    # not divisible

    def test_pooled_matches_replicated(self, mesh22, rng):
        cfg, mesh = mesh22
        engine = ShardedEmbeddingEngine(cfg, mesh)
        table, ids, wts, lens = _rand_lookup_case(rng)
        want = pooled_lookup(*map(jnp.asarray, (table, ids, wts, lens)))
        with jax.sharding.set_mesh(mesh):
            got = engine.pooled("T", jnp.asarray(table), jnp.asarray(ids),
                                jnp.asarray(wts), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_seq_matches_replicated(self, mesh22, rng):
        cfg, mesh = mesh22
        engine = ShardedEmbeddingEngine(cfg, mesh)
        table, ids, _, _ = _rand_lookup_case(rng)
        for zero_pad in (False, True):
            want = seq_lookup(jnp.asarray(table), jnp.asarray(ids), zero_pad)
            with jax.sharding.set_mesh(mesh):
                got = engine.seq("T", jnp.asarray(table), jnp.asarray(ids),
                                 zero_pad)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"zero_pad={zero_pad}")

    def test_gradient_matches_replicated(self, mesh22, rng):
        cfg, mesh = mesh22
        engine = ShardedEmbeddingEngine(cfg, mesh)
        table, ids, wts, lens = _rand_lookup_case(rng)
        target = rng.normal(size=(8, 8)).astype(np.float32)

        def loss_rep(t):
            out = pooled_lookup(t, jnp.asarray(ids), jnp.asarray(wts),
                                jnp.asarray(lens))
            return jnp.sum((out - target) ** 2)

        def loss_shard(t):
            out = engine.pooled("T", t, jnp.asarray(ids), jnp.asarray(wts),
                                jnp.asarray(lens))
            return jnp.sum((out - target) ** 2)

        g_rep = jax.grad(loss_rep)(jnp.asarray(table))
        with jax.sharding.set_mesh(mesh):
            g_shard = jax.grad(loss_shard)(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_rep),
                                   rtol=1e-4, atol=1e-5)

    def test_seq_gradient_matches_replicated(self, mesh22, rng):
        """Gradient parity through the dedup+all_gather exchange path."""
        cfg, mesh = mesh22
        engine = ShardedEmbeddingEngine(cfg, mesh)
        table, ids, _, _ = _rand_lookup_case(rng)
        target = rng.normal(size=(8, 6, 8)).astype(np.float32)

        def loss_rep(t):
            return jnp.sum((seq_lookup(t, jnp.asarray(ids), True)
                            - target) ** 2)

        def loss_shard(t):
            return jnp.sum((engine.seq("T", t, jnp.asarray(ids), True)
                            - target) ** 2)

        g_rep = jax.grad(loss_rep)(jnp.asarray(table))
        with jax.sharding.set_mesh(mesh):
            g_shard = jax.grad(loss_shard)(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_rep),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("case", ["unique_overflow", "owner_skew"])
    def test_seq_exchange_fallback_branches(self, case, rng):
        """Budget overflow (unique ids > bL/div) and per-owner capacity
        skew must both take the psum fallback and still match the
        replicated lookup, values AND gradients."""
        cfg = make_demo_config(mesh_data=2, mesh_model=4,
                               shard_rows_threshold=64)
        mesh = build_mesh(cfg)
        engine = ShardedEmbeddingEngine(cfg, mesh)
        rows, dim, B, L = 2048, 8, 16, 64   # bl=512/local > U=256
        table = rng.normal(size=(rows, dim)).astype(np.float32)
        if case == "unique_overflow":
            # all-unique ids -> nuniq(512) > U(256)
            ids = rng.permutation(rows)[:B * L].reshape(B, L).astype(np.int32)
        else:
            # <=256 uniques but all owned by shard 0 -> counts[0] > C(128)
            ids = rng.integers(0, rows // 4, (B, L)).astype(np.int32)
        want = seq_lookup(jnp.asarray(table), jnp.asarray(ids), True)
        with jax.sharding.set_mesh(mesh):
            got = engine.seq("T", jnp.asarray(table), jnp.asarray(ids), True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        def loss_rep(t):
            return jnp.sum(seq_lookup(t, jnp.asarray(ids), True) ** 2)

        def loss_shard(t):
            return jnp.sum(engine.seq("T", t, jnp.asarray(ids), True) ** 2)

        g_rep = jax.grad(loss_rep)(jnp.asarray(table))
        with jax.sharding.set_mesh(mesh):
            g_shard = jax.grad(loss_shard)(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_rep),
                                   rtol=1e-4, atol=1e-5)

    def test_seq_exchange_vs_psum_same_result(self, rng):
        """shard_seq_exchange on/off must agree (fast branch exercised:
        duplicated Zipf-ish ids keep uniques under budget)."""
        cfg_ex = make_demo_config(mesh_data=2, mesh_model=4,
                                  shard_rows_threshold=64)
        cfg_ps = make_demo_config(mesh_data=2, mesh_model=4,
                                  shard_rows_threshold=64,
                                  shard_seq_exchange=False)
        mesh = build_mesh(cfg_ex)
        rows, dim, B, L = 2048, 8, 16, 64
        table = rng.normal(size=(rows, dim)).astype(np.float32)
        ids = rng.integers(0, 60, (B, L)).astype(np.int32) * 31 % rows
        with jax.sharding.set_mesh(mesh):
            a = ShardedEmbeddingEngine(cfg_ex, mesh).seq(
                "T", jnp.asarray(table), jnp.asarray(ids), True)
            b = ShardedEmbeddingEngine(cfg_ps, mesh).seq(
                "T", jnp.asarray(table), jnp.asarray(ids), True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_packed_table_sharded_seq_matches_replicated(self, rng):
        """Lane-packed table (4x 32-dim rows per 128-lane row) served
        through the sharded exchange path must match the replicated
        packed lookup."""
        from cikm2020_dmt_tpu.nn.embedding import pack_table
        from cikm2020_dmt_tpu.parallel.embedding_shard import EmbeddingEngine
        cfg = make_demo_config(mesh_data=4, mesh_model=2,
                               shard_rows_threshold=64,
                               pack_rows_threshold=50_000)
        mesh = build_mesh(cfg)
        rows, dim = 100_000, 32      # the demo Sku spec
        logical = rng.normal(size=(rows, dim)).astype(np.float32)
        packed = pack_table(jnp.asarray(logical))     # [25000, 128]
        ids = (rng.zipf(1.3, (8, 50)) % rows).astype(np.int32)
        rep = EmbeddingEngine(cfg)
        want = rep.seq("Sku", packed, jnp.asarray(ids), True)
        with jax.sharding.set_mesh(mesh):
            got = ShardedEmbeddingEngine(cfg, mesh).seq(
                "Sku", packed, jnp.asarray(ids), True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_make_engine_dispatch(self, mesh22):
        cfg, mesh = mesh22
        assert isinstance(make_engine(cfg, mesh), ShardedEmbeddingEngine)
        cfg1 = make_demo_config(mesh_model=1)
        mesh1 = build_mesh(cfg1)
        eng = make_engine(cfg1, mesh1)
        assert type(eng).__name__ == "EmbeddingEngine"
        assert eng.cfg is cfg1


class TestParamShardings:
    def test_large_tables_row_sharded(self, mesh22):
        cfg, mesh = mesh22
        params = {"emb": {"Sku": jnp.zeros((1024, 32)),
                          "Cid2": jnp.zeros((50, 8))},
                  "mlp": {"w": jnp.zeros((100, 10))}}
        sh = param_shardings(cfg, params, mesh)
        assert sh["emb"]["Sku"].spec == P(MODEL_AXIS, None)
        assert sh["emb"]["Cid2"].spec == P()      # below threshold
        assert sh["mlp"]["w"].spec == P()          # not a table


class TestShardedTrainStep:
    def test_full_sharded_step_via_graft_entry(self):
        """The driver's dryrun contract: full flagship train step over a
        4x2 mesh with row-sharded tables."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as g
        g.dryrun_multichip(8)


class TestShardedEval:
    def test_run_eval_on_mesh_matches_single_device(self):
        """Multi-chip eval: run_eval with a 4x2 mesh must produce the same
        scores as the single-device path."""
        import jax
        from cikm2020_dmt_tpu.models.zoo import build_model
        from cikm2020_dmt_tpu.train.evaluate import run_eval
        from conftest import DEMO_DATA
        cfg = make_demo_config(mesh_data=4, mesh_model=2,
                               shard_rows_threshold=1000,
                               model_type="embed_mlp",
                               validation_batch_size=64)
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        vals1, h1, c1, o1 = run_eval(cfg, model, params, state, DEMO_DATA,
                                     batch_size=64)
        mesh = build_mesh(cfg)
        from cikm2020_dmt_tpu.core.mesh import param_shardings
        sharded = jax.tree_util.tree_map(
            jax.device_put, params, param_shardings(cfg, params, mesh))
        vals2, h2, c2, o2 = run_eval(cfg, model, sharded, state, DEMO_DATA,
                                     batch_size=64, mesh=mesh)
        assert h1 == h2
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(vals1["click_auc"], vals2["click_auc"],
                                   rtol=1e-4)
