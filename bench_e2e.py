"""End-to-end training benchmark: real TFRecord data -> native parse ->
packed host->device transfer -> jitted train step, batch 4096.

Prints one JSON line (same shape as bench.py).  This measures the whole
chain the VERDICT round-2 item #3 targets: the host path must feed the
chip (46.8k+ ex/s device rate), so the metric is examples/s of sustained
training including input.  vs_baseline = ratio to the device-only rate
measured by bench.py in the same session (1.0 means the input pipeline
adds zero overhead).

Demo caveat: the JD demo split is ~550 examples, so epochs recycle the
same records (epochs=-1); parse cost per example is identical to a long
file, and the scan cache keeps re-reads free (as a production loop over
resident shards would be).
"""

from __future__ import annotations

import json
import os
import time

BATCH = 4096
WARM = 3
ITERS = 30
DEVICE_EPS = None  # filled from bench.py's latest run when available


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    from cikm2020_dmt_tpu.core.config import DMTConfig
    from cikm2020_dmt_tpu.data.pipeline import prefetch
    from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
    from cikm2020_dmt_tpu.train.loop import Trainer, make_input_stream

    # the demo schema (its features are what the demo TFRecords carry) at
    # the flagship batch size and dtype
    demo = dataclasses.replace(
        DMTConfig.from_ini("conf/dmt_demo.conf"), batch_size=BATCH,
        validate_step=10**9, compute_dtype="bfloat16")
    trainer = Trainer(demo)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    metrics = task_metrics_init()
    rng = jax.random.key(0, impl="rbg")

    stream = prefetch(make_input_stream(
        demo, demo.validation_data_path, BATCH, epochs=-1,
        shuffle=False, with_headers=False))

    it = trainer.device_prefetch(iter(stream))
    step = 0
    for batch, dev in it:
        tstate, metrics, loss = step_fn(tstate, metrics, dev,
                                        jax.random.fold_in(rng, step))
        step += 1
        if step == WARM:
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
        if step == WARM + ITERS:
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / ITERS
            break

    eps = BATCH / dt
    out = {
        "metric": "examples/sec, end-to-end training "
                  "(real data -> parse -> transfer -> step), batch 4096",
        "value": round(eps, 1),
        "unit": "examples/s",
    }
    if DEVICE_EPS:
        out["vs_baseline"] = round(eps / DEVICE_EPS, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
