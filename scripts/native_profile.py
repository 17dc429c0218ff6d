"""Decompose the native host data path: framing scan vs parse (1..N threads)
vs the full stream (workers + numpy alloc + propensity).

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/native_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from cikm2020_dmt_tpu.core.config import DMTConfig
from cikm2020_dmt_tpu.data.native import (NativeAssembler, native_batch_stream,
                                          scan_file)
from cikm2020_dmt_tpu.data.pipeline import expand_files


def main() -> None:
    cfg = DMTConfig.from_ini("conf/dmt_demo.conf")
    files = expand_files(cfg.validation_data_path)
    t0 = time.perf_counter()
    blobs = [scan_file(f) for f in files]
    scan_s = time.perf_counter() - t0
    nrec = sum(len(o) for _, o, _ in blobs)
    nbytes = sum(len(b) for b, _, _ in blobs)
    print(f"scan: {nrec} records, {nbytes/1e6:.1f} MB, {scan_s*1e3:.1f} ms "
          f"({nrec/scan_s:.0f} rec/s cold)")

    # repeat records up to a full 4096 batch for stable timing
    blob, offs, lens = blobs[0]
    reps = max(1, 4096 // len(offs) + 1)
    offs = np.concatenate([offs] * reps)[:4096]
    lens = np.concatenate([lens] * reps)[:4096]

    for nt in (1, 2, 4, 0):
        asm = NativeAssembler(cfg, num_threads=nt)
        # warm
        asm.assemble_records(blob, offs, lens, with_headers=False)
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            asm.assemble_records(blob, offs, lens, with_headers=False)
        dt = (time.perf_counter() - t0) / iters
        print(f"assemble_records nt={nt}: {dt*1e3:.2f} ms/batch(4096) "
              f"= {4096/dt:.0f} ex/s")

    # full stream at several worker counts
    for w in (1, 2, 4, 8):
        asm = NativeAssembler(cfg, num_threads=1)
        it = native_batch_stream(cfg, cfg.validation_data_path, 4096,
                                 epochs=-1, assembler=asm,
                                 with_headers=False, num_workers=w)
        next(it)
        n = 0
        t0 = time.perf_counter()
        for i, b in enumerate(it):
            n += b.size
            if i >= 30:
                break
        dt = time.perf_counter() - t0
        print(f"stream workers={w} (nt=1): {n/dt:.0f} ex/s")


if __name__ == "__main__":
    main()
