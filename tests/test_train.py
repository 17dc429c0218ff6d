"""Training-runtime tests: optimizer/schedule, train loop on demo data,
checkpoint save/resume contract, evaluator + predict flows."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cikm2020_dmt_tpu.core.checkpoint import CheckpointManager, step_from_name
from cikm2020_dmt_tpu.train.evaluate import (newest_result_step, predict,
                                             run_eval, validation)
from cikm2020_dmt_tpu.train.loop import Trainer
from cikm2020_dmt_tpu.train.optim import ftrl, make_optimizer, piecewise_constant
from cikm2020_dmt_tpu.models.zoo import build_model

from conftest import DEMO_DATA, needs_demo_data, make_demo_config


class TestOptim:
    def test_piecewise_constant(self):
        sched = piecewise_constant((100, 200), (0.1, 0.01, 0.001))
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(100)) == pytest.approx(0.1)
        assert float(sched(101)) == pytest.approx(0.01)
        assert float(sched(201)) == pytest.approx(0.001)

    def test_piecewise_pads_truncated_rates(self):
        # dmt.conf: 2 rates, 1 boundary -> exact; 2 rates, 2 boundaries -> pad
        sched = piecewise_constant((10, 20), (0.1, 0.01))
        assert float(sched(25)) == pytest.approx(0.01)

    def test_ftrl_reduces_quadratic(self):
        opt = ftrl(0.5)
        params = {"w": jnp.asarray([5.0, -3.0])}
        state = opt.init(params)
        import optax
        for _ in range(400):
            grads = {"w": 2 * params["w"]}  # d/dw w^2
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(jnp.abs(params["w"]).sum()) < 0.5

    @pytest.mark.parametrize("name", ["sgd", "adam", "adagrad", "rmsprop",
                                      "adadelta", "ftrl"])
    def test_factory(self, name):
        cfg = make_demo_config(optimizer=name)
        opt = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
        assert jnp.isfinite(updates["w"]).all()

    def test_unknown_optimizer(self):
        with pytest.raises(ValueError, match="unknown optimizer"):
            make_optimizer(make_demo_config(optimizer="nope"))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "m"))
        tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                "b": {"c": np.float32(3.5)}}
        mgr.save(100, tree)
        assert mgr.has_step(100)
        assert os.path.exists(mgr.marker_path(100))
        got = mgr.restore(100, tree)
        np.testing.assert_array_equal(got["a"], tree["a"])
        assert float(got["b"]["c"]) == 3.5

    def test_newest_step_after_requires_done_marker(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "m"))
        mgr.save(10, {"x": np.zeros(2)})
        mgr.save(20, {"x": np.zeros(2)})
        os.remove(mgr.marker_path(20))  # simulate in-flight save
        assert mgr.newest_step_after(0) == 10
        assert mgr.newest_step_after(10) is None

    def test_step_from_name(self):
        assert step_from_name("model.ckpt-12345") == 12345
        assert step_from_name("whatever") is None


@needs_demo_data
class TestTrainLoop:
    def _cfg(self, tmp_path, **kw):
        kw.setdefault("model_type", "mlp")
        kw.setdefault("batch_size", 32)
        kw.setdefault("validate_step", 5)
        kw.setdefault("output_path", str(tmp_path))
        kw.setdefault("epoch_num", 3)
        return make_demo_config(**kw)

    def test_loss_decreases_on_mlp(self, tmp_path):
        cfg = self._cfg(tmp_path)
        trainer = Trainer(cfg)
        vals = trainer.train(data_path=DEMO_DATA, max_steps=15, log_every=100)
        assert np.isfinite(vals["loss"])
        # streaming click AUC should exceed chance on 15 steps of demo data
        assert vals["click_auc"] > 0.5

    def test_checkpoint_cadence_and_markers(self, tmp_path):
        cfg = self._cfg(tmp_path)
        Trainer(cfg).train(data_path=DEMO_DATA, max_steps=10, log_every=100)
        mgr = CheckpointManager(cfg.model_path)
        assert mgr.all_steps() == [5, 10]
        assert os.path.exists(mgr.marker_path(5))
        assert os.path.exists(cfg.train_result_path)

    def test_resume_from_checkpoint(self, tmp_path):
        cfg = self._cfg(tmp_path)
        Trainer(cfg).train(data_path=DEMO_DATA, max_steps=5, log_every=100)
        t2 = Trainer(cfg)
        t2.train(data_path=DEMO_DATA, max_steps=8, resume_step=5, log_every=100)
        mgr = CheckpointManager(cfg.model_path)
        assert 8 in mgr.all_steps()
        restored = mgr.restore(8)
        assert int(np.asarray(restored["step"])) == 8


@needs_demo_data
class TestEvalAndPredict:
    def _train_one(self, tmp_path, **kw):
        kw.setdefault("model_type", "mlp")
        cfg = make_demo_config(batch_size=32,
                               validate_step=4, output_path=str(tmp_path),
                               epoch_num=2, **kw)
        Trainer(cfg).train(data_path=DEMO_DATA, max_steps=4, log_every=100)
        return cfg

    def test_validation_once(self, tmp_path):
        cfg = self._train_one(tmp_path)
        vals = validation(cfg, once=True)
        assert vals is not None
        assert 0.0 <= vals["click_auc"] <= 1.0
        assert os.path.exists(cfg.validation_result_path)
        assert newest_result_step(cfg.validation_result_path) == 4
        # idempotent: no new ckpt -> once returns None
        assert validation(cfg, once=True) is None

    def test_predict_writes_results(self, tmp_path):
        cfg = self._train_one(tmp_path)
        results = predict(cfg, 4, test_tag="ord", test_score_method="rel")
        assert len(results) == 1
        r = next(iter(results.values()))
        assert 0.0 <= r["overall_auc"]["click"] <= 1.0
        assert 0.0 <= r["grouped_auc"][2] <= 1.0
        detail = glob.glob(os.path.join(str(tmp_path), "*.detail"))
        assert detail
        with open(detail[0]) as f:
            first = f.readline().split("\t")
        assert len(first) == 13 + 2  # header fields + 2 scores

    def test_predict_surfaces_mmoe_gates(self, tmp_path):
        """mmoe-family predict must fetch + log the per-task gate softmax
        means, like the reference's predict() does by tensor name every
        batch (reference run_dnn.py:721-725,777-814)."""
        cfg = self._train_one(tmp_path, model_type="mmoe")
        results = predict(cfg, 4)
        r = next(iter(results.values()))
        gm = r["gate_mean"]
        assert gm.shape == (2, cfg.num_experts)
        # valid-weighted mean of softmax rows still sums to 1 per task
        np.testing.assert_allclose(gm.sum(-1), np.ones(2), rtol=1e-5)
        out_file = glob.glob(os.path.join(str(tmp_path), "*.test_result*"))
        out_file = [p for p in out_file if not p.endswith(".detail")]
        assert out_file
        text = open(out_file[0]).read()
        assert "gate_click_expert_0" in text
        assert "gate_order_expert_" in text

    def test_run_eval_collect_gates(self, tmp_path):
        cfg = make_demo_config(model_type="mmoe")
        model = build_model(cfg)
        params, mstate = model.init(jax.random.PRNGKey(0))
        vals, headers, p_clk, p_ord, gate_mean = run_eval(
            cfg, model, params, mstate, DEMO_DATA, batch_size=64,
            collect_gates=True)
        assert gate_mean.shape == (2, cfg.num_experts)
        np.testing.assert_allclose(gate_mean.sum(-1), np.ones(2), rtol=1e-5)

    def test_run_eval_padding_correctness(self, tmp_path):
        """Eval scores must cover exactly the real rows (no pad rows)."""
        cfg = self._train_one(tmp_path)
        model = build_model(cfg)
        params, mstate = model.init(jax.random.PRNGKey(0))
        vals, headers, p_clk, p_ord = run_eval(
            cfg, model, params, mstate, DEMO_DATA, batch_size=64)
        assert len(headers) == len(p_clk) == len(p_ord)
        # demo split has a known number of records; all headers non-empty
        assert all(h for h in headers)


class TestPackedTransfer:
    """device_batch pack modes round-trip exactly through
    unpack_device_batch (VERDICT r3 #3 relay-mitigation knobs)."""

    def _roundtrip(self, monkeypatch, env):
        import __graft_entry__ as g
        from jax.sharding import Mesh

        for k, v in env.items():
            monkeypatch.setenv(k, v)
        cfg = g._demo_config(sku_rows=4096, batch_size=64,
                             validate_step=10**9)
        tr = Trainer(cfg, mesh=Mesh(
            np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model")))
        raw = g.synthetic_batch(cfg, cfg.batch_size)
        dev = tr.device_batch(g._as_batch(raw))
        out = jax.jit(lambda b: Trainer.unpack_device_batch(
            b, tr._pack_layout))(dev)
        packed_keys = [k for k in dev if k.startswith("__packed_")]
        for k, v in raw.items():
            if cfg.unit_weights and k.endswith("__wts"):
                continue
            np.testing.assert_array_equal(
                np.asarray(out[k]), v, err_msg=f"{k} under {env}")
        return packed_keys

    def test_default_two_buffers(self, monkeypatch):
        keys = self._roundtrip(monkeypatch, {})
        assert sorted(keys) == ["__packed_f32", "__packed_i32"]

    def test_onebuf_bitcast(self, monkeypatch):
        keys = self._roundtrip(monkeypatch, {"DMT_PACK_ONEBUF": "1"})
        assert keys == ["__packed_f32"]

    def test_chunked(self, monkeypatch):
        keys = self._roundtrip(monkeypatch, {"DMT_PACK_CHUNK_MB": "0.2"})
        assert len(keys) > 2
        assert all("@" in k for k in keys)

    def test_onebuf_chunked(self, monkeypatch):
        keys = self._roundtrip(monkeypatch, {"DMT_PACK_ONEBUF": "1",
                                             "DMT_PACK_CHUNK_MB": "0.2"})
        assert len(keys) >= 2
        assert all(k.startswith("__packed_f32@") for k in keys)
