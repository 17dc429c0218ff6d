"""Sweep DMT_DMA_NSLOTS (in-flight row-DMA depth) on real TPU.

One process, all variants: update_rows reads the env var at TRACE time,
so setting os.environ between jit instantiations gives each variant its
own kernel without re-claiming the chip.  Shapes: Sku-scale table
(R=1.25M), U=36,352 touched rows, D=128 — production-REPRESENTATIVE
(same 32-bit dtype / 128-lane layout as the [2R,128] flat moment
write-back, which is R=2.5M with 2U rows/step; per-row DMA cost is
per-row, so depth conclusions transfer).

Prints one JSON line per (dtype, nslots) cell.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

R = 1_250_000
U = 36_352
D = 128


def bench_one(dt, nslots, rng):
    os.environ["DMT_DMA_NSLOTS"] = str(nslots)
    # update_rows reads DMT_DMA_NSLOTS at TRACE time; the fresh jax.jit
    # below forces a retrace per cell.  (A module-level-read flag would
    # NOT be swept this way -- the module import is cached -- that's the
    # r3 dead-flag artifact class.)
    from cikm2020_dmt_tpu.ops.scatter_rows import update_rows

    nreal = int(U * 0.4)
    ids = np.concatenate([
        np.sort(rng.permutation(R)[:nreal]),
        R + np.arange(U - nreal)]).astype(np.int32)
    rows = rng.normal(size=(U, D)).astype(dt)
    table = rng.normal(size=(R, D)).astype(dt)
    want = np.asarray(table).copy()
    want[ids[:nreal]] = np.asarray(rows)[:nreal]

    f = jax.jit(update_rows, donate_argnums=(0,))
    out = f(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows))
    ok = np.array_equal(np.asarray(out), want)
    uids_j, rows_j = jnp.asarray(ids), jnp.asarray(rows)
    out = f(out, uids_j, rows_j)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(out, uids_j, rows_j)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 50 * 1e3
    name = "f32" if dt == np.float32 else "bf16"
    print(json.dumps({"dtype": name, "nslots": nslots,
                      "correct": bool(ok), "ms": round(ms, 3)}),
          flush=True)
    del out


def main():
    print("backend:", jax.default_backend(), flush=True)
    for nslots in (4, 8, 16, 32):
        for dt in (np.float32, jnp.bfloat16):
            try:
                bench_one(dt, nslots, np.random.default_rng(1))
            except Exception as e:  # noqa: BLE001
                print(f"nslots={nslots} {dt} FAILED: {e!r}"[:300],
                      flush=True)


if __name__ == "__main__":
    main()
