"""Data-pipeline benchmark: native parse throughput on the JD demo shards.

Prints one JSON line (same shape as bench.py) measuring the host-side path
alone: TFRecord scan -> proto decode -> vocab mapping -> padded batches.
Baseline = the pure-python assembler on the same records.
"""

from __future__ import annotations

import json
import time


def measure(stream_factory, batches: int = 60) -> float:
    n = 0
    it = stream_factory()
    next(it)  # warm
    t0 = time.perf_counter()
    for i, batch in enumerate(it):
        n += batch.size
        if i >= batches:
            break
    return n / (time.perf_counter() - t0)


def main() -> None:
    from cikm2020_dmt_tpu.core.config import DMTConfig
    from cikm2020_dmt_tpu.data.native import native_batch_stream
    from cikm2020_dmt_tpu.data.pipeline import batch_stream

    cfg = DMTConfig.from_ini("conf/dmt_demo.conf")
    path = cfg.validation_data_path

    # the train-path configuration: batch 4096, segment parse, no Python
    # header materialization (loop.py passes with_headers=False); the
    # stream builds its own assembler with cores split between stream
    # workers and the per-call parse pool
    native_eps = measure(
        lambda: native_batch_stream(cfg, path, 4096, epochs=-1,
                                    with_headers=False),
        batches=30)
    python_eps = measure(
        lambda: batch_stream(cfg, path, 256, epochs=-1), batches=4)

    print(json.dumps({
        "metric": "examples/sec, native host data path (parse+vocab+batch),"
                  " train config",
        "value": round(native_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(native_eps / python_eps, 2),
    }))


if __name__ == "__main__":
    main()
