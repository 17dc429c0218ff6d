"""Config-path coverage: batch-norm training/eval, uncertainty loss
weighting, propensity-weighted loss — the reference's optional switches."""

import jax
import numpy as np
import pytest

from cikm2020_dmt_tpu.models.zoo import build_model
from cikm2020_dmt_tpu.train.loop import Trainer
from cikm2020_dmt_tpu.train.losses import multi_task_loss

from conftest import DEMO_DATA, needs_demo_data, make_demo_config


@needs_demo_data
class TestBatchNorm:
    def test_bn_state_updates_and_persists(self, tmp_path):
        cfg = make_demo_config(model_type="mlp", is_bn=True, batch_size=32,
                               validate_step=3, epoch_num=1,
                               output_path=str(tmp_path))
        trainer = Trainer(cfg)
        tstate = trainer.init_state()
        assert "out" in tstate["model_state"] or any(
            k.startswith("layer") for k in tstate["model_state"]), \
            "BN moving stats missing from model state"
        vals = trainer.train(data_path=DEMO_DATA, max_steps=3, log_every=100)
        assert np.isfinite(vals["loss"])
        restored = trainer.ckpt.restore(3)
        # moving stats must have moved off zero-init
        mm = restored["model_state"]["layer0"]["moving_mean"]
        assert float(np.abs(np.asarray(mm)).sum()) > 0

    def test_bn_eval_uses_moving_stats(self, tmp_path):
        cfg = make_demo_config(model_type="mlp", is_bn=True, batch_size=16)
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.data.pipeline import batch_stream
        batch = next(batch_stream(cfg, DEMO_DATA, 16, epochs=1))
        jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
        # eval twice -> deterministic, state unchanged
        y1, s1 = model.apply(params, state, jb, train=False)
        y2, s2 = model.apply(params, state, jb, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        for a, b in zip(jax.tree_util.tree_leaves(s1),
                        jax.tree_util.tree_leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # train updates the moving stats
        _, s3 = model.apply(params, state, jb, train=True,
                            rng=jax.random.PRNGKey(1))
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(s3),
                            jax.tree_util.tree_leaves(state)))
        assert changed


@needs_demo_data
class TestUncertaintyWeighting:
    def test_uncertainty_params_receive_gradient(self, tmp_path):
        cfg = make_demo_config(model_type="mmoe",
                               loss_weight_method="uncertainty",
                               batch_size=16)
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        assert "uncertainty" in params
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.data.pipeline import batch_stream
        batch = next(batch_stream(cfg, DEMO_DATA, 16, epochs=1))
        jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}

        def loss_fn(p):
            out, _ = model.apply(p, state, jb, train=True,
                                 rng=jax.random.PRNGKey(1))
            return multi_task_loss(cfg, out, jb["mask"], p["uncertainty"])

        grads = jax.grad(loss_fn)(params)
        assert float(np.abs(np.asarray(
            grads["uncertainty"]["click_weight"]))) > 0
        assert float(np.abs(np.asarray(
            grads["uncertainty"]["order_weight"]))) > 0

    def test_uncertainty_trains_end_to_end(self, tmp_path):
        cfg = make_demo_config(model_type="multi_task",
                               loss_weight_method="uncertainty",
                               batch_size=32, validate_step=3, epoch_num=1,
                               output_path=str(tmp_path))
        vals = Trainer(cfg).train(data_path=DEMO_DATA, max_steps=3,
                                  log_every=100)
        assert np.isfinite(vals["loss"])


@needs_demo_data
class TestPropensityWeightedLoss:
    def test_ips_weight_changes_loss(self):
        cfg = make_demo_config(model_type="mmoe", propensity_em=True)
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        import jax.numpy as jnp
        from cikm2020_dmt_tpu.data.pipeline import batch_stream
        batch = next(batch_stream(cfg, DEMO_DATA, 16, epochs=1))
        jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
        out, _ = model.apply(params, state, jb, train=False)
        base = float(multi_task_loss(cfg, out, jb["mask"]))
        weighted = float(multi_task_loss(
            cfg, out, jb["mask"],
            sample_weight=jnp.full((16,), 2.0)))
        np.testing.assert_allclose(weighted, 2 * base, rtol=1e-5)
