"""Dump the compiled flagship train-step HLO (one chip) to a file for
fusion-level inspection — which ops XLA fused into each scatter/gather,
whether table buffers alias in place, etc.

Usage: python scripts/dump_step_hlo.py [outfile]  (TPU; compile-cache warm)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import __graft_entry__ as g
from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
from cikm2020_dmt_tpu.train.loop import Trainer

BATCH = 4096


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    cfg = g._demo_config(sku_rows=5_000_000, batch_size=BATCH,
                         validate_step=10**9,
                         compute_dtype=os.environ.get("DMT_BENCH_DTYPE",
                                                      "bfloat16"))
    trainer = Trainer(cfg)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch = trainer.device_batch(g._as_batch(g.synthetic_batch(cfg, BATCH)))
    metrics = task_metrics_init()
    rng = jax.random.key(0, impl="rbg")
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        tstate, metrics, batch, rng)
    txt = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
