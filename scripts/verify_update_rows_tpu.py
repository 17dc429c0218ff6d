"""Real-TPU correctness + timing for the shipped row-DMA kernels:

  - update_rows at D=128/256, f32 AND bf16 (bf16 big tables are the
    production default; bf16 routes through the int32 bitcast view —
    Mosaic rejects single-row slices of 16-bit HBM memrefs)
  - sorted_segment_sum_rows at the lazy-backward shape, f32 and bf16
    inputs (f32 accumulation), vs XLA segment_sum, incl. the composite
    DMT_DMA_BWD pipeline (XLA take reorder + streaming segsum)

Each section is independently try/except'd so one compile failure does
not mask the rest.  r4 history: the per-row DMA *gather* twin measured
11.7 ms vs 2.0 ms XLA take at N=291k and was pruned; single-row DMA out
of tiled VMEM (write_rows / the fused Adam kernel) does not compile on
hardware at all.
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


def section(name):
    def deco(fn):
        def run(*a, **k):
            try:
                fn(*a, **k)
            except Exception as e:  # noqa: BLE001 - keep going
                print(f"{name} FAILED: {e!r}"[:500], flush=True)
        return run
    return deco


@section("segsum")
def check_segsum(rng):
    N, d = 290_816, 128
    num_out = U + 1
    draws = np.minimum(rng.zipf(1.3, N) - 1, num_out - 1)
    seg = np.sort(draws).astype(np.int32)
    seg = np.minimum(np.cumsum(np.diff(seg, prepend=seg[0]) > 0),
                     num_out - 1).astype(np.int32)
    gs = rng.normal(size=(N, d)).astype(np.float32)
    want64 = np.zeros((num_out, d), np.float64)
    np.add.at(want64, seg, gs.astype(np.float64))
    # f32 summation-order noise over 100k+-element Zipf runs is real:
    # compare against float64 with a scale-aware tolerance
    scale = np.maximum(np.abs(want64), 1.0)
    for dt in (np.float32, jnp.bfloat16):
        name = "f32" if dt == np.float32 else "bf16"
        gs_t = gs.astype(dt)
        if dt == jnp.bfloat16:
            w = np.zeros((num_out, d), np.float64)
            np.add.at(w, seg, np.asarray(gs_t, np.float64))
        else:
            w = want64
        f = jax.jit(lambda g, s: sorted_segment_sum_rows(g, s, num_out))
        gj, sj = jnp.asarray(gs_t), jnp.asarray(seg)
        out = np.asarray(f(gj, sj), np.float64)
        err = np.max(np.abs(out - w) / np.maximum(np.abs(w), 1.0))
        ok = err < 1e-3
        print(f"segsum {name}: correct={ok} (max rel err {err:.2e})",
              flush=True)
        if ok:
            jax.block_until_ready(f(gj, sj))
            t0 = time.perf_counter()
            outs = [f(gj, sj) for _ in range(20)]
            jax.block_until_ready(outs)
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"segsum {name}: {ms:.3f} ms", flush=True)
    del scale
    # XLA baseline + the composite DMA_BWD pipeline (reorder + segsum)
    gj = jnp.asarray(gs.astype(jnp.bfloat16))
    sj = jnp.asarray(seg)
    order = jnp.asarray(rng.permutation(N).astype(np.int32))
    f2 = jax.jit(lambda g, s: jax.ops.segment_sum(
        g.astype(jnp.float32), s, num_segments=num_out))
    jax.block_until_ready(f2(gj, sj))
    t0 = time.perf_counter()
    outs = [f2(gj, sj) for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"segsum xla segment_sum (bf16 in, f32 accum): "
          f"{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms", flush=True)
    f3 = jax.jit(lambda g, o, s: sorted_segment_sum_rows(
        jnp.take(g, o, axis=0), s, num_out))
    jax.block_until_ready(f3(gj, order, sj))
    t0 = time.perf_counter()
    outs = [f3(gj, order, sj) for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"segsum composite (take reorder + stream) bf16: "
          f"{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms", flush=True)


@section("update_rows")
def check_update(rng):
    for dt, d in ((np.float32, 128), (np.float32, 256),
                  (jnp.bfloat16, 128), (jnp.bfloat16, 256)):
        name = "f32" if dt == np.float32 else "bf16"
        try:
            nreal = int(U * 0.4)
            ids = np.concatenate([
                np.sort(rng.permutation(R)[:nreal]),
                R + np.arange(U - nreal)]).astype(np.int32)
            rows = rng.normal(size=(U, d)).astype(dt)
            table = rng.normal(size=(R, d)).astype(dt)
            want = np.asarray(table).copy()
            want[ids[:nreal]] = np.asarray(rows)[:nreal]

            f = jax.jit(update_rows, donate_argnums=(0,))
            out = f(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows))
            out_np = np.asarray(out)
            ok = np.array_equal(out_np, want)
            print(f"update {name} D={d}: correct={ok}", flush=True)
            if not ok:
                bad = np.argwhere((out_np != want).any(axis=1))[:5].ravel()
                print("  first bad rows:", bad.tolist(), flush=True)
                continue
            uids_j = jnp.asarray(ids)
            rows_j = jnp.asarray(rows)
            out = f(out, uids_j, rows_j)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(50):
                out = f(out, uids_j, rows_j)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 50 * 1e3
            print(f"update {name} D={d}: update_rows {ms:.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"update {name} D={d} FAILED: {e!r}"[:400], flush=True)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    check_segsum(rng)
    check_update(np.random.default_rng(1))


if __name__ == "__main__":
    main()
