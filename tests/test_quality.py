"""Learning-signal quality tests: the full DMT architecture must learn on
the demo shards (streaming AUC above chance after a few dozen steps).

The paper-scale AUC parity targets live in BASELINE.md; the shared demo
sample is too small for those absolute numbers (README.md:35 of the
reference), so these tests check learning signal + trained-vs-init AUC
improvement, which is what is measurable here.
"""

import numpy as np
import pytest

from cikm2020_dmt_tpu.core.config import TransformerConfig
from cikm2020_dmt_tpu.train.evaluate import run_eval
from cikm2020_dmt_tpu.train.loop import Trainer
from cikm2020_dmt_tpu.models.zoo import build_model

from conftest import DEMO_DATA, needs_demo_data, make_demo_config

import jax


def _tiny_flagship(tmp_path, **overrides):
    """Flagship architecture shrunk for CPU speed: same composition
    (3 transformers + MMoE + bias net), smaller dims."""
    kw = dict(
        model_type="mmoe_transformer_unbias",
        hidden_units_bottom=(64, 32),
        hidden_units_task=(16,),
        hidden_units_bias=(16, 8),
        num_experts=2,
        transformer=TransformerConfig(
            d_model=80, d_ff=160, num_heads=4, num_blocks_encode=1,
            num_blocks_decode=1, maxlen_k=50, dropout_rate=0.1),
        batch_size=64,
        validate_step=30,
        epoch_num=8,
        output_path=str(tmp_path),
    )
    kw.update(overrides)
    return make_demo_config(**kw)


@needs_demo_data
class TestLearningSignal:
    def test_flagship_learns_and_beats_init(self, tmp_path):
        cfg = _tiny_flagship(tmp_path)
        model = build_model(cfg)
        params0, state0 = model.init(jax.random.PRNGKey(0))
        init_vals, _, _, _ = run_eval(cfg, model, params0, state0,
                                      DEMO_DATA, batch_size=256)
        trainer = Trainer(cfg, model=model)
        vals = trainer.train(data_path=DEMO_DATA, max_steps=30, log_every=100)
        # streaming train AUC above chance on both tasks
        assert vals["click_auc"] > 0.55, vals
        assert vals["order_auc"] > 0.52, vals
        assert np.isfinite(vals["loss"])
        restored = trainer.ckpt.restore(30)
        trained_vals, _, _, _ = run_eval(
            cfg, model, restored["params"], restored["model_state"],
            DEMO_DATA, batch_size=256)
        # trained model must beat the random-init model on eval click AUC
        # (train==eval split on the demo sample; this checks the whole
        # train->checkpoint->restore->eval loop moves AUC)
        assert trained_vals["click_auc"] > init_vals["click_auc"] + 0.05, (
            init_vals, trained_vals)


def _run_ladder_rung(rung: int, steps: int):
    """Import scripts/quality_ladder.py (not a package) and run one rung."""
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "scripts", "quality_ladder.py")
    spec = importlib.util.spec_from_file_location("quality_ladder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_rung(rung, os.path.join(os.path.dirname(__file__), "..",
                                           mod.RUNGS[rung]),
                        steps=steps, seed=42)


@needs_demo_data
class TestQualityLadder:
    """BASELINE.json config-ladder evidence (VERDICT r2 next-round #2):
    rungs 1-2 run in CI at reduced steps; the full 5-rung 185-step ladder
    is scripts/quality_ladder.py (results recorded in PARITY.md) plus the
    slow-marked full-chain test below."""

    def test_rung1_mlp_learns(self):
        row = _run_ladder_rung(1, steps=40)
        assert row["test_overall_auc"]["click"] > 0.60, row
        assert np.isfinite(row["train_streaming"]["loss"])

    def test_rung2_embed_mlp_learns_and_beats_rung1_floor(self):
        row = _run_ladder_rung(2, steps=40)
        # embeddings memorize the tiny demo sample fast: well above the
        # dense-only floor by 40 steps
        assert row["test_overall_auc"]["click"] > 0.80, row
        assert row["test_grouped_auc"]["2"] > 0.90, row

    @pytest.mark.slow
    def test_full_demo_chain_flagship(self):
        """Full 185-step flagship chain tracks the recorded artifact
        (PARITY.md: streaming test AUC click 1.0000 / order 0.9912).
        A regression that halves learning quality fails here."""
        row = _run_ladder_rung(5, steps=None)
        assert row["test_streaming"]["click_auc"] > 0.99, row
        assert row["test_streaming"]["order_auc"] > 0.95, row
        assert row["test_overall_auc"]["click"] > 0.95, row


class TestSummaryPlot:
    """cli.plot renders the JSONL summaries (the TensorBoard-role utility,
    reference run_dnn.py:243-256) to PNG + CSV."""

    def test_plot_writes_png_and_csv(self, tmp_path):
        import json
        from cikm2020_dmt_tpu.cli.plot import main
        sd = tmp_path / "summary"
        sd.mkdir()
        with open(sd / "train.jsonl", "w") as f:
            for s in (10, 20, 30):
                f.write(json.dumps({"step": s, "time": "t",
                                    "loss": 1.0 / s, "auc": s / 40}) + "\n")
        with open(sd / "validation.jsonl", "w") as f:
            f.write(json.dumps({"step": 30, "time": "t", "loss": 0.05}) + "\n")
        main(["--summary_dir", str(sd)])
        assert (sd / "summary.png").stat().st_size > 10_000
        csv_text = (sd / "summary.csv").read_text()
        assert csv_text.splitlines()[0] == "run,step,time,loss,auc"
        assert any(line.startswith("validation,30") for line
                   in csv_text.splitlines())
