"""One-off bench variants (same measurement loop as bench.py)."""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if "--rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

import __graft_entry__ as g
from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
from cikm2020_dmt_tpu.train.loop import Trainer
import dataclasses

BATCH = 4096
cfg = g._demo_config(sku_rows=5_000_000, batch_size=BATCH,
                     validate_step=10**9, compute_dtype="bfloat16")
if "--nopack" in sys.argv:
    cfg = dataclasses.replace(cfg, packed_transfer=False)
if "--dense" in sys.argv:
    cfg = dataclasses.replace(cfg, lazy_adam=False)
if "--noexact" in sys.argv:
    cfg = dataclasses.replace(cfg, dedup_exact_rows_max=0)
if "--noonehot" in sys.argv:
    cfg = dataclasses.replace(cfg, onehot_bwd_rows_max=0)
if "--nobf16grad" in sys.argv:
    cfg = dataclasses.replace(cfg, onehot_bwd_bf16=False)
if "--div16" in sys.argv:
    cfg = dataclasses.replace(cfg, dedup_budget_div=16)
trainer = Trainer(cfg)
tstate = trainer.shard_state(trainer.init_state())
step_fn = trainer._train_step()
batch = trainer.device_batch(g._as_batch(g.synthetic_batch(cfg, BATCH)))
metrics = task_metrics_init()
rng = jax.random.PRNGKey(0)
for i in range(3):
    tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                    jax.random.fold_in(rng, i))
jax.block_until_ready(loss)
t0 = time.perf_counter()
for i in range(20):
    tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                    jax.random.fold_in(rng, 3 + i))
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / 20
print(json.dumps({"variant": " ".join(sys.argv[1:]),
                  "ms_per_step": round(dt * 1000, 2),
                  "ex_per_s": round(BATCH / dt, 1)}))
