"""Surgical TPU probe for the round-4 mv-layout regression (87.7k new
default vs 90.4k lane-concat at the same flags).

Times, standalone at the Sku shape (R=1.25M packed rows, U=36352,
D=128), each layout's gather + write-back pieces, and dumps whether the
[2, R, D] <-> [2R, D] merge-reshape around the DMA kernel materializes
copies in the optimized HLO (it should be a bitcast: R % 8 == 0 keeps
the v block tile-aligned).

Layouts:
  lane  — [R, 256] lane-concat (r2-r3): one 256-lane take + XLA scatter
  stack — [2, R, 128] row-stacked (r4): axis-1 take + reshape + DMA
  flat  — [2R, 128] flat row-stacked (candidate): concat-ids take + DMA
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

from cikm2020_dmt_tpu.ops.scatter_rows import update_rows

R, U, D = 1_250_000, 36_352, 128


def bench(name, f, *args, donate=()):
    jf = jax.jit(f, donate_argnums=donate)
    out = jf(*args)
    jax.block_until_ready(out)
    # donated args need fresh buffers per call: rotate two states
    if donate:
        state = out if isinstance(out, jnp.ndarray) else out[0]
        t0 = time.perf_counter()
        for _ in range(20):
            state = jf(state, *args[1:])
            state = state if isinstance(state, jnp.ndarray) else state[0]
        jax.block_until_ready(state)
    else:
        t0 = time.perf_counter()
        outs = [jf(*args) for _ in range(20)]
        jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return jf


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    nreal = int(U * 0.8)
    uids = np.concatenate([np.sort(rng.permutation(R)[:nreal]),
                           R + np.arange(U - nreal)]).astype(np.int32)
    uids_j = jnp.asarray(uids)
    rows_u = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    rows_2u = jnp.concatenate([rows_u, rows_u])
    rows_s = jnp.stack([rows_u, rows_u])

    lane = jnp.zeros((R, 2 * D), jnp.float32)
    stack = jnp.zeros((2, R, D), jnp.float32)
    flat = jnp.zeros((2 * R, D), jnp.float32)
    rows_lane = jnp.concatenate([rows_u, rows_u], axis=1)

    safe = jnp.minimum(uids_j, R - 1)
    real = uids_j < R
    twoR = jnp.int32(2 * R)
    ids2 = jnp.concatenate([jnp.where(real, uids_j, twoR),
                            jnp.where(real, uids_j + R, twoR)])
    ids2_read = jnp.concatenate([safe, safe + R])

    # gathers
    bench("take lane  [U,256] <- [R,256]",
          lambda t, s: jnp.take(t, s, axis=0, indices_are_sorted=True),
          lane, safe)
    bench("take stack [2,U,D] <- [2,R,D] axis=1",
          lambda t, s: jnp.take(t, s, axis=1, indices_are_sorted=True),
          stack, safe)
    bench("take flat  [2U,D] <- [2R,D]",
          lambda t, s: jnp.take(t, s, axis=0, indices_are_sorted=True),
          flat, ids2_read)

    # write-backs (in-place; donated)
    bench("scatter lane [R,256]",
          lambda t, i, r: t.at[i].set(r, mode="drop",
                                      indices_are_sorted=True,
                                      unique_indices=True),
          lane, uids_j, rows_lane, donate=(0,))
    bench("scatter stack [2,R,D] .at[:,ids]",
          lambda t, i, r: t.at[:, i].set(r, mode="drop",
                                         indices_are_sorted=True,
                                         unique_indices=True),
          stack, uids_j, rows_s, donate=(0,))
    import jax as _jax
    f_stack = _jax.jit(lambda t, i, r: update_rows(
        t.reshape(2 * R, D), i, r).reshape(2, R, D), donate_argnums=(0,))
    txt = f_stack.lower(_jax.ShapeDtypeStruct((2, R, D), jnp.float32),
                        ids2, rows_2u).compile().as_text()
    bench("dma stack (reshape + update_rows + reshape)",
          lambda t, i, r: update_rows(
              t.reshape(2 * R, D), i, r).reshape(2, R, D),
          stack, ids2, rows_2u, donate=(0,))
    ncopy = txt.count(" copy(")
    nbit = txt.count(" bitcast(")
    big = [ln.strip()[:120] for ln in txt.splitlines()
           if " copy(" in ln and "f32[2500000" in ln.replace(",128]", "")
           or (" copy(" in ln and "1250000" in ln)]
    print(f"dma stack HLO: {ncopy} copy ops, {nbit} bitcasts; "
          f"full-size copies: {len(big)}", flush=True)
    for ln in big[:4]:
        print("   ", ln, flush=True)
    bench("dma flat (update_rows only)",
          lambda t, i, r: update_rows(t, i, r),
          flat, ids2, rows_2u, donate=(0,))
    bench("dma lane-era single [R,128] (reference point)",
          lambda t, i, r: update_rows(t, i, r),
          jnp.zeros((R, D), jnp.float32), uids_j, rows_u, donate=(0,))


if __name__ == "__main__":
    main()
