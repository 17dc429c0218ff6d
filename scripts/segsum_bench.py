"""Measure segmented-reduction strategies for the lazy-Adam backward.

The cotangent reduction (291k sorted [*,128] f32 rows -> per-unique-id
sums, ~36k uniques) is the lazy path's dominant backward op.  Candidates:
  A. jax.ops.segment_sum (scatter-add) into accumulators of varying size
     — tests the round-1 "VMEM-resident accumulator is 25x faster" law.
  B. sorted-order permute-gather + segmented associative_scan + last-of-run
     extraction (scatter-free, exact).
Chained-dependency timing (acc feeds the next iteration) defeats DCE;
block_until_ready + warmup defeats async skew.

Usage (TPU): python scripts/segsum_bench.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 291_000
D = 128
ITERS = 20


def time_fn(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    zipf = (rng.zipf(1.3, N) * 2654435761 % 1_250_000).astype(np.int32)

    for U in (8192, 16384, 18432, 32768, 65536):
        seg_np = np.sort(zipf % U).astype(np.int32)
        seg_sorted = jnp.asarray(seg_np)
        seg_unsorted = jnp.asarray(rng.permutation(seg_np))

        @jax.jit
        def scatter_chain(g, seg):
            def body(acc, _):
                acc = acc + jax.ops.segment_sum(
                    g + acc[0, :1], seg, num_segments=U)
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.zeros((U, D), jnp.float32),
                                  None, length=ITERS)
            return acc

        ms_sorted = time_fn(scatter_chain, g, seg_sorted)
        ms_unsorted = time_fn(scatter_chain, g, seg_unsorted)
        print(f"RESULT A segsum U={U:6d}  sorted {ms_sorted:7.2f} ms"
              f"  unsorted {ms_unsorted:7.2f} ms"
              f"  ({ms_sorted/N*1e6:.3f} us/row)")

    # B: permute + segmented scan + last-of-run gather
    U = 36352
    seg_np = np.sort(zipf % U).astype(np.int32)
    seg = jnp.asarray(seg_np)
    order = jnp.asarray(rng.permutation(N).astype(np.int32))

    @jax.jit
    def scan_chain(g, order, seg):
        first = jnp.concatenate(
            [jnp.ones((1,), bool), seg[1:] != seg[:-1]])
        # last-of-run positions via the sort-compaction trick
        last = jnp.concatenate([seg[1:] != seg[:-1],
                                jnp.ones((1,), bool)])
        pos_last = jnp.sort(jnp.where(last, jnp.arange(N, dtype=jnp.int32),
                                      jnp.int32(N)))[:U]

        def body(acc, _):
            gs = jnp.take(g + acc[0, :1], order, axis=0)

            def combine(a, b):
                av, af = a
                bv, bf = b
                return (bv + av * (1.0 - bf), jnp.maximum(af, bf))

            vals, _ = jax.lax.associative_scan(
                combine, (gs, first.astype(jnp.float32)[:, None]))
            runs = jnp.take(vals, jnp.minimum(pos_last, N - 1), axis=0)
            return acc + runs, None

        acc, _ = jax.lax.scan(body, jnp.zeros((U, D), jnp.float32),
                              None, length=ITERS)
        return acc

    ms = time_fn(scan_chain, g, order, seg)
    print(f"RESULT B permute+scan U={U}  {ms:7.2f} ms")

    # C: permute-gather alone (to separate its cost)
    @jax.jit
    def permute_chain(g, order):
        def body(acc, _):
            return jnp.take(g + acc[:1], order, axis=0), None
        acc, _ = jax.lax.scan(body, g, None, length=ITERS)
        return acc
    print(f"RESULT C permute-gather [N,128] {time_fn(permute_chain, g, order):7.2f} ms")


if __name__ == "__main__":
    main()
