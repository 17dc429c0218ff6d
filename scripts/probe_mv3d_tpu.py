"""Hw probe: per-row DMA into a 3-D [2, R, 128] f32 HBM memref via
double leading-dim indexing (out.at[j, rid]) — if Mosaic accepts it, the
mv write-back can alias the [2, R, D] moment param directly and the
1.28 GB copy the r4 trace shows (reshape breaks the alias chain,
'tstate..mv' copy op = 3.90 ms/step) disappears without a layout change.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def _kernel(ids_ref, rows_hbm, table_hbm, out_hbm, *, chunk, num_rows,
            nslots=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)

    def body(sem_w):
        def issue(i, _):
            v = ids_ref[0, 0, i]

            @pl.when(i >= nslots)
            def _():
                pv = ids_ref[0, 0, i - nslots]

                @pl.when(pv < 2 * num_rows)
                def _():
                    pj = jnp.where(pv >= num_rows, 1, 0)
                    pltpu.make_async_copy(
                        rows_hbm.at[step * chunk + i - nslots],
                        out_hbm.at[pj, pv - pj * num_rows],
                        sem_w.at[i % nslots]).wait()

            @pl.when(v < 2 * num_rows)
            def _():
                j = jnp.where(v >= num_rows, 1, 0)
                pltpu.make_async_copy(
                    rows_hbm.at[step * chunk + i],
                    out_hbm.at[j, v - j * num_rows],
                    sem_w.at[i % nslots]).start()
            return 0

        jax.lax.fori_loop(0, chunk, issue, 0)

        def drain(k, _):
            i = chunk - nslots + k
            v = ids_ref[0, 0, i]

            @pl.when(v < 2 * num_rows)
            def _():
                j = jnp.where(v >= num_rows, 1, 0)
                pltpu.make_async_copy(
                    rows_hbm.at[step * chunk + i],
                    out_hbm.at[j, v - j * num_rows],
                    sem_w.at[i % nslots]).wait()
            return 0

        jax.lax.fori_loop(0, nslots, drain, 0)

    pl.run_scoped(body, sem_w=pltpu.SemaphoreType.DMA((nslots,)))


def update_rows_3d(table, ids, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = rows.shape
    _, num_rows, _ = table.shape
    ids = jnp.where(ids < 0, jnp.int32(2 * num_rows), ids.astype(jnp.int32))
    chunk = 512
    npad = ((n + chunk - 1) // chunk) * chunk
    if npad != n:
        ids = jnp.pad(ids, (0, npad - n), constant_values=2 * num_rows)
        rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
    ids = ids.reshape(npad // chunk, 1, chunk)
    kernel = functools.partial(_kernel, chunk=chunk, num_rows=num_rows)
    return pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, rows, table)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    R, U, D = 1_250_000, 36_352, 128
    nreal = int(U * 0.8)
    uids = np.concatenate([np.sort(rng.permutation(R)[:nreal]),
                           R + np.arange(U - nreal)]).astype(np.int64)
    # flat [0, 2R) ids: m part = uid, v part = uid + R; sentinels >= 2R
    idm = np.where(uids < R, uids, 2 * R)
    idv = np.where(uids < R, uids + R, 2 * R)
    ids2 = jnp.asarray(np.concatenate([idm, idv]).astype(np.int32))
    rows = rng.normal(size=(2 * U, D)).astype(np.float32)
    table = rng.normal(size=(2, R, D)).astype(np.float32)
    want = table.copy()
    want[0, uids[:nreal]] = rows[:U][:nreal]
    want[1, uids[:nreal]] = rows[U:][:nreal]

    try:
        jf = jax.jit(update_rows_3d, donate_argnums=(0,))
        out = jf(jnp.asarray(table), ids2, jnp.asarray(rows))
        out_np = np.asarray(out)
        ok = np.array_equal(out_np, want)
        print(f"update3d f32 [2,R,128]: correct={ok}", flush=True)
        if ok:
            txt = jf.lower(jax.ShapeDtypeStruct((2, R, D), jnp.float32),
                           ids2, jnp.asarray(rows)).compile().as_text()
            big = sum(1 for ln in txt.splitlines()
                      if " copy(" in ln and "1250000" in ln)
            print(f"update3d HLO full-size copies: {big}", flush=True)
            state = out
            rows_j = jnp.asarray(rows)
            t0 = time.perf_counter()
            for _ in range(50):
                state = jf(state, ids2, rows_j)
            jax.block_until_ready(state)
            ms = (time.perf_counter() - t0) / 50 * 1e3
            print(f"update3d: {ms:.3f} ms (2U={2*U} rows)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"update3d FAILED: {e!r}"[:600], flush=True)


if __name__ == "__main__":
    main()
