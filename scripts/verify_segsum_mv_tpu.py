"""Focused on-chip follow-up to verify_update_rows_tpu.py.

Two open questions from the round-2 verify run:
  1. sorted_segment_sum_rows printed correct=False at atol/rtol=1e-4
     against an f32 np.add.at oracle — is that a real mis-sum or just
     MXU one-hot-dot accumulation order at long Zipf runs (the CPU test
     needed an f64 oracle + order tolerance for exactly this,
     tests/test_pallas_ops.py)?  Print error magnitudes vs an f64 oracle.
  2. update_rows at D=256 (the lane-concat Adam-moment write-back shape
     behind DMT_DMA_MV) never got its on-chip correctness check — the
     verify run timed out before reaching it.
"""

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

from cikm2020_dmt_tpu.ops.scatter_rows import (sorted_segment_sum_rows,
                                               update_rows)

R = 1_250_000
U = 36_352


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    # --- 1. segsum error magnitude vs f64 oracle ---
    N, d = 290_816, 128
    num_out = U + 1
    draws = np.minimum(rng.zipf(1.3, N) - 1, num_out - 1)
    seg = np.sort(draws).astype(np.int32)
    seg = np.minimum(np.cumsum(np.diff(seg, prepend=seg[0]) > 0),
                     num_out - 1).astype(np.int32)
    gs = rng.normal(size=(N, d)).astype(np.float32)
    want64 = np.zeros((num_out, d), np.float64)
    np.add.at(want64, seg, gs.astype(np.float64))
    # per-run |g| sum bounds the legitimate f32 accumulation error
    mag = np.zeros((num_out, d), np.float64)
    np.add.at(mag, seg, np.abs(gs, dtype=np.float64))
    f = jax.jit(lambda g, s: sorted_segment_sum_rows(g, s, num_out))
    gj, sj = jnp.asarray(gs), jnp.asarray(seg)
    out = np.asarray(f(gj, sj))[:num_out].astype(np.float64)
    # XLA segment_sum on the same chip, same dtype, for comparison
    f2 = jax.jit(lambda g, s: jax.ops.segment_sum(g, s, num_segments=num_out))
    out_xla = np.asarray(f2(gj, sj)).astype(np.float64)
    for name, o in (("pallas", out), ("xla", out_xla)):
        err = np.abs(o - want64)
        rel = (err / np.maximum(mag, 1e-6)).max()
        print(f"segsum {name}: max abs err {err.max():.3e}  "
              f"max err/sum|g| {rel:.3e}", flush=True)
    if np.allclose(out, want64, atol=np.maximum(mag * 1e-5, 1e-4)):
        jax.block_until_ready(f(gj, sj))
        t0 = time.perf_counter()
        outs = [f(gj, sj) for _ in range(20)]
        jax.block_until_ready(outs)
        print(f"segsum pallas: {(time.perf_counter()-t0)/20*1e3:.3f} ms",
              flush=True)

    # --- 2. update_rows D=256 (DMT_DMA_MV write-back shape) ---
    for d2 in (256,):
        nreal = int(U * 0.4)
        ids = np.concatenate([
            np.sort(rng.permutation(R)[:nreal]),
            R + np.arange(U - nreal)]).astype(np.int32)
        rows = rng.normal(size=(U, d2)).astype(np.float32)
        table = rng.normal(size=(R, d2)).astype(np.float32)
        want = table.copy()
        want[ids[:nreal]] = rows[:nreal]
        fu = jax.jit(update_rows, donate_argnums=(0,))
        out_u = np.asarray(fu(jnp.asarray(table), jnp.asarray(ids),
                              jnp.asarray(rows)))
        ok = np.array_equal(out_u, want)
        print(f"update_rows D={d2}: correct={ok}", flush=True)
        if ok:
            tj = jnp.asarray(want)
            uj, rj = jnp.asarray(ids), jnp.asarray(rows)
            tj = fu(tj, uj, rj)
            jax.block_until_ready(tj)
            t0 = time.perf_counter()
            for _ in range(20):
                tj = fu(tj, uj, rj)
            jax.block_until_ready(tj)
            print(f"update_rows D={d2}: "
                  f"{(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
