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

    if os.environ.get("DMT_E2E_DETAIL", "0") == "1":
        # decomposition mode: serialize the chain on purpose and time each
        # leg per step (host parse/assemble, device_put dispatch+drain,
        # step dispatch+drain).  Pipelining is broken here by design —
        # the p50s say where the serial floor lives, not the e2e rate.
        src = iter(stream)
        t_data, t_putd, t_putb, t_stepd, t_stepb = [], [], [], [], []
        for i in range(WARM + ITERS):
            t0 = time.perf_counter()
            batch = next(src)
            t1 = time.perf_counter()
            dev = trainer.device_batch(batch)
            t2 = time.perf_counter()
            jax.block_until_ready(list(dev.values()))
            t3 = time.perf_counter()
            tstate, metrics, loss = step_fn(tstate, metrics, dev,
                                            jax.random.fold_in(rng, i))
            t4 = time.perf_counter()
            jax.block_until_ready((tstate, loss))
            t5 = time.perf_counter()
            if i >= WARM:
                t_data.append(t1 - t0); t_putd.append(t2 - t1)
                t_putb.append(t3 - t2); t_stepd.append(t4 - t3)
                t_stepb.append(t5 - t4)
        import numpy as _np
        for name, xs in (("host-parse", t_data), ("put-dispatch", t_putd),
                         ("put-drain", t_putb), ("step-dispatch", t_stepd),
                         ("step-drain", t_stepb)):
            xs = _np.asarray(xs) * 1e3
            print(f"# {name:13s} p50 {_np.percentile(xs, 50):8.2f} ms  "
                  f"p90 {_np.percentile(xs, 90):8.2f} ms  "
                  f"max {xs.max():8.2f} ms", flush=True)
        tot = (_np.asarray(t_data) + _np.asarray(t_putd) + _np.asarray(t_putb)
               + _np.asarray(t_stepd) + _np.asarray(t_stepb))
        dt = float(_np.median(tot))
        print(f"# serialized-chain median {dt * 1e3:.1f} ms/step = "
              f"{BATCH / dt:,.0f} ex/s (pipelined rate below)", flush=True)

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
