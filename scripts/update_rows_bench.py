"""Microbench: lazy-Adam write-back scatter under REAL step conditions.

The flagship step's write-back scatters cost ~6.1 ms/step (device trace)
while a naive isolated scatter measures ~21 us.  This bench isolates which
condition triggers XLA's slow path by sweeping:

  - table shape: [1.25M, 128] (packed Sku) and [1.25M, 256] (fused mv)
  - ids: all-in-bounds vs real lazy uids (unique prefix + OOB sentinel
    tail `R + iota`, mode="drop")
  - fraction of real (in-bounds) ids: ~40% like a real batch

Chained iterations (donated table feeds the next call) so nothing is
DCE'd and in-place aliasing applies, matching the train step.

Usage (real TPU, one process): python scripts/update_rows_bench.py
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

R = 1_250_000
U = 36_352          # flagship budget (N=290816, div=8)
ITERS = 50


def bench(fn, table, *args):
    f = jax.jit(fn, donate_argnums=(0,))
    out = f(table, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(out, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def xla_set(t, u, r):
    return t.at[u].set(r, mode="drop", indices_are_sorted=True,
                       unique_indices=True)


def main():
    from cikm2020_dmt_tpu.ops.scatter_rows import update_rows
    rng = np.random.default_rng(0)
    for d in (128, 256):
        rows = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
        sentinel_ids = np.concatenate([
            np.sort(rng.permutation(R)[: int(U * 0.4)]),
            R + np.arange(U - int(U * 0.4))])
        for tag, ids in (
            ("inbounds ", np.sort(rng.permutation(R)[:U])),
            ("sentinel ", sentinel_ids),
        ):
            uids = jnp.asarray(ids.astype(np.int32))
            table = jnp.zeros((R, d), jnp.float32)
            ms = bench(xla_set, table, uids, rows)
            print(f"D={d:4d} U={U} {tag} xla.set {ms:8.3f} ms")
        uids = jnp.asarray(sentinel_ids.astype(np.int32))
        table = jnp.zeros((R, d), jnp.float32)
        ms = bench(update_rows, table, uids, rows)
        print(f"D={d:4d} U={U} sentinel  pallas update_rows {ms:8.3f} ms")


def main2():
    """Replicate the real step's two-use pattern: gather touched rows,
    Adam-ish math, scatter back (donated, sorted unique + sentinel)."""
    rng = np.random.default_rng(0)
    for d in (128, 256):
        g_rows = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
        ids = np.concatenate([
            np.sort(rng.permutation(R)[: int(U * 0.4)]),
            R + np.arange(U - int(U * 0.4))]).astype(np.int32)
        uids = jnp.asarray(ids)

        def step(t, u, g):
            safe = jnp.minimum(u, R - 1)
            rows = jnp.take(t, safe, axis=0, indices_are_sorted=True)
            new = 0.9 * rows + 0.1 * g            # adam-ish
            t = t.at[u].set(new, mode="drop", indices_are_sorted=True,
                            unique_indices=True)
            return t, jnp.sum(new)

        f = jax.jit(step, donate_argnums=(0,))
        table = jnp.zeros((R, d), jnp.float32)
        out, s = f(table, uids, g_rows)
        jax.block_until_ready((out, s))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, s = f(out, uids, g_rows)
        jax.block_until_ready((out, s))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"D={d:4d} U={U} gather+math+scatter chain {ms:8.3f} ms")


if __name__ == "__main__":
    if os.environ.get("URB_MODE") == "chain":
        main2()
    else:
        main()
