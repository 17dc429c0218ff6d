"""Real-TPU correctness + timing check for ops.scatter_rows.update_rows
at D=128 and D=256 (the lazy-Adam write-back shapes)."""

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

from cikm2020_dmt_tpu.ops.scatter_rows import (gather_rows,
                                               sorted_segment_sum_rows,
                                               update_rows)

R = 1_250_000
U = 36_352


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    # --- sorted_segment_sum_rows at the lazy-backward shape ---
    N, d = 290_816, 128
    num_out = U + 1
    # Zipfian run sizes capped at num_out-1 like the real seg_ext
    draws = np.minimum(rng.zipf(1.3, N) - 1, num_out - 1)
    seg = np.sort(draws).astype(np.int32)
    seg = np.minimum(np.cumsum(np.diff(seg, prepend=seg[0]) > 0),
                     num_out - 1).astype(np.int32)
    gs = rng.normal(size=(N, d)).astype(np.float32)
    want = np.zeros((num_out, d), np.float32)
    np.add.at(want, seg, gs)
    for chunk in (256, 512):
        f = jax.jit(lambda g, s, c=chunk: sorted_segment_sum_rows(
            g, s, num_out, chunk=c))
        gj, sj = jnp.asarray(gs), jnp.asarray(seg)
        out = np.asarray(f(gj, sj))
        ok = np.allclose(out, want, rtol=1e-4, atol=1e-4)
        print(f"segsum chunk={chunk}: correct={ok}", flush=True)
        if ok:
            jax.block_until_ready(f(gj, sj))
            t0 = time.perf_counter()
            outs = [f(gj, sj) for _ in range(20)]
            jax.block_until_ready(outs)
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"segsum chunk={chunk}: {ms:.3f} ms", flush=True)
    f2 = jax.jit(lambda g, s: jax.ops.segment_sum(g, s, num_segments=num_out))
    gj, sj = jnp.asarray(gs), jnp.asarray(seg)
    jax.block_until_ready(f2(gj, sj))
    t0 = time.perf_counter()
    outs = [f2(gj, sj) for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"segsum xla segment_sum: "
          f"{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms", flush=True)
    # --- gather_rows at take_rows_sparse shape: [U+1, D] source, N ids ---
    N = 290_816
    for d in (128,):
        src = rng.normal(size=(U + 1, d)).astype(np.float32)
        pos = rng.integers(0, U + 1, N).astype(np.int32)
        want = src[pos]
        g = jax.jit(gather_rows)
        sj, pj = jnp.asarray(src), jnp.asarray(pos)
        out = np.asarray(g(sj, pj))
        ok = np.array_equal(out, want)
        print(f"grid-gather N={N} D={d}: correct={ok}", flush=True)
        jax.block_until_ready(g(sj, pj))
        t0 = time.perf_counter()
        outs = [g(sj, pj) for _ in range(20)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"grid-gather N={N} D={d}: gather_rows {ms:.3f} ms", flush=True)

        f2 = jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip"))
        jax.block_until_ready(f2(sj, pj))
        t0 = time.perf_counter()
        outs = [f2(sj, pj) for _ in range(20)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"grid-gather N={N} D={d}: xla take  {ms:.3f} ms", flush=True)
    # --- gather_rows ---
    for d in (128, 256):
        nreal = int(U * 0.4)
        ids = np.concatenate([
            np.sort(rng.permutation(R)[:nreal]),
            R + np.arange(U - nreal)]).astype(np.int32)
        table = rng.normal(size=(R, d)).astype(np.float32)
        want = table[np.minimum(ids, R - 1)]
        g = jax.jit(gather_rows)
        tj, ij = jnp.asarray(table), jnp.asarray(ids)
        out = np.asarray(g(tj, ij))
        ok = np.array_equal(out, want)
        print(f"gather D={d}: correct={ok}", flush=True)
        if ok:
            jax.block_until_ready(g(tj, ij))
            t0 = time.perf_counter()
            outs = [g(tj, ij) for _ in range(50)]
            jax.block_until_ready(outs)
            ms = (time.perf_counter() - t0) / 50 * 1e3
            print(f"gather D={d}: gather_rows {ms:.3f} ms", flush=True)
    for d in (128, 256):
        nreal = int(U * 0.4)
        ids = np.concatenate([
            np.sort(rng.permutation(R)[:nreal]),
            R + np.arange(U - nreal)]).astype(np.int32)
        rows = rng.normal(size=(U, d)).astype(np.float32)
        table = rng.normal(size=(R, d)).astype(np.float32)

        want = table.copy()
        want[ids[:nreal]] = rows[:nreal]

        f = jax.jit(update_rows, donate_argnums=(0,))
        out = f(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows))
        out_np = np.asarray(out)
        ok = np.array_equal(out_np, want)
        print(f"D={d}: correct={ok}", flush=True)
        if not ok:
            bad = np.argwhere((out_np != want).any(axis=1))[:5].ravel()
            print("  first bad rows:", bad.tolist(), flush=True)
            continue

        # timing: chain donated calls so aliasing applies
        uids_j = jnp.asarray(ids)
        rows_j = jnp.asarray(rows)
        out = f(out, uids_j, rows_j)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(out, uids_j, rows_j)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 50 * 1e3
        print(f"D={d}: update_rows {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
