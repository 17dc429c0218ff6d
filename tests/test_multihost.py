"""Multi-process (jax.distributed) validation — VERDICT r4 #2.

Runs ``scripts/multihost_smoke.py`` (2 REAL processes x 4 virtual CPU
devices, jax.distributed bring-up, global {data:4, model:2} mesh) as a
subprocess and asserts:

  1. the sharded train + Orbax save/restore/resume path completes
     (bit-exact resume is asserted inside the workers);
  2. the 3-step loss matches a single-process run of the identical
     global program (same mesh topology, same global batch) — i.e. the
     process boundary (the virtual "DCN" seam) is numerically
     transparent;
  3. ``fms_grad_bf16`` (bf16 gradient push for full-mesh tables,
     parallel/full_shard.py) survives the real 2-process all_to_all and
     lands within bf16-rounding distance of the f32 run.

Reference contract: /root/reference/DMT_code/run_dnn.py:148-207,906-914
(chief/worker role dispatch + TF_CONFIG towers); ours is jax.distributed
SPMD over a global mesh, so the thing to CI is cross-process numerical
equivalence rather than role wiring.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

SMOKE = os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "multihost_smoke.py")


def _run_smoke(fms_bf16: bool, nproc: int = 2) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
                        "XLA_FLAGS")}
    env["SMOKE_FMS_BF16"] = "1" if fms_bf16 else ""
    env["SMOKE_NPROC"] = str(nproc)
    out = subprocess.run(
        [sys.executable, SMOKE], env=env, timeout=600,
        capture_output=True, text=True)
    assert out.returncode == 0, (
        f"smoke exit {out.returncode}\n--- stdout\n{out.stdout[-3000:]}"
        f"\n--- stderr\n{out.stderr[-3000:]}")
    line = [l for l in out.stdout.splitlines()
            if l.startswith("MULTIHOST_OK ")]
    assert line, out.stdout[-3000:]
    return json.loads(line[0][len("MULTIHOST_OK "):])


@pytest.fixture(scope="module")
def smoke_f32():
    return _run_smoke(fms_bf16=False)


def test_multihost_smoke(smoke_f32):
    assert smoke_f32["processes"] == 2
    assert smoke_f32["devices"] == 8
    assert not smoke_f32["fms_grad_bf16"]
    assert np.isfinite(smoke_f32["loss"])
    assert np.isfinite(smoke_f32["resume_loss"])


def test_multihost_matches_single_process(smoke_f32):
    """The 2-process global mesh must compute the same step as one
    process over the same 8 devices: same config, same global batch
    (both smoke workers generate the identical seed-0 local half)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    from cikm2020_dmt_tpu.core.mesh import build_mesh
    from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
    from cikm2020_dmt_tpu.train.loop import Trainer

    cfg = g._demo_config(
        sku_rows=1024, batch_size=64, mesh_model=2, mesh_data=4,
        shard_rows_threshold=512, validate_step=10**9,
        dedup_rows_threshold=1000,
        hidden_units_bottom=(64, 32), hidden_units_task=(16,))
    mesh = build_mesh(cfg, jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    # the smoke's fixed seed-0 global batch (every worker regenerates it
    # and ships its slice; here one process owns all of it)
    gbatch = g.synthetic_batch(cfg, cfg.batch_size, seed=0)
    sh = NamedSharding(mesh, P("data"))
    dev_batch = {k: jax.device_put(np.asarray(v), sh)
                 for k, v in gbatch.items()}
    metrics = task_metrics_init()
    for i in range(3):
        tstate, metrics, loss = step_fn(
            tstate, metrics, dev_batch,
            jax.random.fold_in(jax.random.PRNGKey(0), i))
    # rtol only guards cross-process collective reduction-order noise;
    # in practice this has been observed bit-exact
    np.testing.assert_allclose(float(loss), smoke_f32["loss"], rtol=1e-4)


def test_multihost_4proc_topology_invariant(smoke_f32):
    """4 processes x 2 devices run the SAME global program as 2 x 4 —
    with only 2 local devices per process, every full-mesh all_to_all
    group crosses a process boundary (the multi-group DCN shape).  The
    loss must match the 2-process run."""
    r = _run_smoke(fms_bf16=False, nproc=4)
    assert r["processes"] == 4 and r["devices"] == 8
    np.testing.assert_allclose(r["loss"], smoke_f32["loss"], rtol=1e-4)


def test_multihost_fms_grad_bf16(smoke_f32):
    """bf16 gradient push across the real process boundary: completes,
    and perturbs the 3-step loss only at bf16-rounding scale."""
    r = _run_smoke(fms_bf16=True)
    assert r["fms_grad_bf16"]
    f32, b16 = smoke_f32["loss"], r["loss"]
    assert np.isfinite(b16)
    rel = abs(b16 - f32) / max(1.0, abs(f32))
    assert rel < 5e-2, f"bf16 push diverged: {b16} vs {f32} (rel {rel})"
