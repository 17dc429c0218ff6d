"""Multi-host smoke test: N processes x (8/N) virtual CPU devices.

Validates the jax.distributed bring-up + per-host input sharding + global
mesh training path without TPU pod hardware:

    python scripts/multihost_smoke.py            # launcher
    (spawns itself SMOKE_NPROC times with --process_id 0..N-1)

Each process builds the SAME global (data=4, model=2) mesh over all 8
devices and runs a few sharded train steps; process 0 prints the verdict.
SMOKE_NPROC (default 2; 4 puts only 2 devices on each process, so the
full-mesh all_to_all crosses process boundaries in every group — the
multi-group DCN shape).  The global program is identical for every
NPROC, so losses must agree across process topologies
(tests/test_multihost.py asserts this).
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = 12355
NPROC = int(os.environ.get("SMOKE_NPROC", "2"))
N_DEVICES = 8


def worker(process_id: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    per_proc = N_DEVICES // NPROC
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per_proc}").strip()
    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC, process_id=process_id)
    assert jax.process_count() == NPROC
    assert jax.device_count() == N_DEVICES, jax.device_count()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    from cikm2020_dmt_tpu.core.mesh import build_mesh
    from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
    from cikm2020_dmt_tpu.train.loop import Trainer

    cfg = g._demo_config(
        sku_rows=1024, batch_size=64, mesh_model=2, mesh_data=4,
        shard_rows_threshold=512, validate_step=10**9,
        dedup_rows_threshold=1000,  # lazy plan covers the row-split Sku
        hidden_units_bottom=(64, 32), hidden_units_task=(16,),
        # A/B hook for the DCN gradient-push compression
        # (tests/test_multihost.py validates the flag across a REAL
        # process boundary, per VERDICT r4 #2)
        fms_grad_bf16=os.environ.get("SMOKE_FMS_BF16", "") == "1")
    mesh = build_mesh(cfg)
    trainer = Trainer(cfg, mesh=mesh)
    # Sku (1024 rows, divisible by all 8 devices) must take the
    # full-mesh all_to_all flavor — the path whose gradient push crosses
    # the REAL process boundary here (and the one fms_grad_bf16 gates)
    assert any(t.full_mesh or t.sharded for t in trainer.lazy_plan), \
        "smoke should exercise a distributed lazy-Adam update"
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    # ONE fixed 64-row global batch regardless of process count: every
    # process regenerates it (seed 0) and supplies its own slice, so the
    # global program — and therefore the loss — is identical for any
    # SMOKE_NPROC (the cross-topology assertion in tests/test_multihost)
    batch = g.synthetic_batch(cfg, cfg.batch_size, seed=0)
    per = cfg.batch_size // NPROC
    lo = process_id * per

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put_global(arr):
        # build the globally-sharded array from this host's local slice
        sh = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(
            sh, np.asarray(arr)[lo:lo + per])

    dev_batch = {k: put_global(v) for k, v in batch.items()}
    metrics = task_metrics_init()
    loss = None
    for i in range(3):
        tstate, metrics, loss = step_fn(
            tstate, metrics, dev_batch, jax.random.fold_in(
                jax.random.PRNGKey(0), i))
    loss = float(loss)

    # -- save -> restore -> resume across both processes -----------------
    # Sharded jax.Arrays go straight into Orbax (each process writes its
    # addressable shards; process 0 writes the DONE marker after the commit
    # barrier), then every process restores full host arrays from a numpy
    # template and re-shards — the same path Trainer.train takes on resume.
    from cikm2020_dmt_tpu.core.checkpoint import CheckpointManager
    ckpt_dir = os.environ["SMOKE_CKPT_DIR"]

    def mark(msg):  # progress markers (both tasks) for hang debugging
        print(f"[smoke p{process_id}] {msg}", file=sys.stderr, flush=True)

    mark(f"3 steps done, loss={loss:.4f}")
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(3, tstate)
    mark("save done")
    # the DONE marker is chief-written AFTER the cross-process commit
    # barrier, so only the chief may assert it synchronously — a
    # non-chief checking immediately races the chief's marker write
    # (production evaluators POLL for markers, train/evaluate.validation)
    if process_id == 0:
        assert ckpt.has_step(3), "DONE marker missing after chief save"
    template = jax.tree_util.tree_map(np.asarray, trainer.init_state())
    mark("template built")
    restored = trainer.shard_state(ckpt.restore(3, template))
    mark("restore + reshard done")
    # continue one identical step from the live and the restored state:
    # losses must match exactly (CPU arithmetic is deterministic)
    rng4 = jax.random.fold_in(jax.random.PRNGKey(0), 3)
    _, _, loss_live = step_fn(tstate, task_metrics_init(), dev_batch, rng4)
    _, _, loss_res = step_fn(restored, task_metrics_init(), dev_batch, rng4)
    loss_live, loss_res = float(loss_live), float(loss_res)
    mark("resume steps done")

    if process_id == 0:
        assert loss == loss and abs(loss) < 1e6, f"bad loss {loss}"
        assert loss_live == loss_res, \
            f"resume mismatch: live {loss_live} vs restored {loss_res}"
        import json
        # full-precision machine-readable line so the pytest wrapper can
        # compare the multi-process loss against a single-process run
        print("MULTIHOST_OK " + json.dumps({
            "loss": loss, "resume_loss": loss_res,
            "fms_grad_bf16": cfg.fms_grad_bf16,
            "processes": jax.process_count(),
            "devices": jax.device_count()}))


def main() -> None:
    if "--process_id" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--process_id") + 1]))
        return
    import tempfile
    procs = []
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    # both processes save/restore through the same dir (multi-host jobs
    # assume a shared checkpoint filesystem)
    env.setdefault("SMOKE_CKPT_DIR", tempfile.mkdtemp(prefix="smoke_ckpt_"))
    for pid in range(NPROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process_id", str(pid)],
            env=env,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=None))
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes {codes}")


if __name__ == "__main__":
    main()
