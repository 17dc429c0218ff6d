"""Real-TPU correctness + timing check for ops.scatter_rows.update_rows
at D=128 and D=256 (the lazy-Adam write-back shapes), in f32 AND bf16
(bf16 big tables are the production default since r3 — the r3 ladder's
"DMA opt-ins neutral" was a dead-flag artifact of the old f32-only
gates), plus gather_rows / sorted_segment_sum_rows at the lazy-backward
shapes in both dtypes and a write_rows (VMEM-source row DMA) compile
check for the fused-Adam kernel design."""

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
    for dt, chunks in ((np.float32, (256, 512)), (jnp.bfloat16, (256,))):
        gs_t = gs.astype(dt)
        if dt == jnp.bfloat16:
            # oracle in f32 over the ROUNDED bf16 inputs (the kernel's
            # f32 accumulation of bf16 rows is exact)
            want_t = np.zeros((num_out, d), np.float32)
            np.add.at(want_t, seg, np.asarray(gs_t, np.float32))
        else:
            want_t = want
        for chunk in chunks:
            f = jax.jit(lambda g, s, c=chunk: sorted_segment_sum_rows(
                g, s, num_out, chunk=c))
            gj, sj = jnp.asarray(gs_t), jnp.asarray(seg)
            out = np.asarray(f(gj, sj))
            tol = 1e-4 if dt == np.float32 else 1e-2
            ok = np.allclose(out, want_t, rtol=tol, atol=tol)
            name = "f32" if dt == np.float32 else "bf16"
            print(f"segsum {name} chunk={chunk}: correct={ok}", flush=True)
            if ok:
                jax.block_until_ready(f(gj, sj))
                t0 = time.perf_counter()
                outs = [f(gj, sj) for _ in range(20)]
                jax.block_until_ready(outs)
                ms = (time.perf_counter() - t0) / 20 * 1e3
                print(f"segsum {name} chunk={chunk}: {ms:.3f} ms",
                      flush=True)
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
    for dt in (np.float32, jnp.bfloat16):
        d = 128
        name = "f32" if dt == np.float32 else "bf16"
        src = rng.normal(size=(U + 1, d)).astype(dt)
        pos = rng.integers(0, U + 1, N).astype(np.int32)
        want = np.asarray(src)[pos]
        g = jax.jit(gather_rows)
        sj, pj = jnp.asarray(src), jnp.asarray(pos)
        out = np.asarray(g(sj, pj))
        ok = np.array_equal(out, want)
        print(f"grid-gather {name} N={N} D={d}: correct={ok}", flush=True)
        jax.block_until_ready(g(sj, pj))
        t0 = time.perf_counter()
        outs = [g(sj, pj) for _ in range(20)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"grid-gather {name} N={N} D={d}: gather_rows {ms:.3f} ms",
              flush=True)

        f2 = jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip"))
        jax.block_until_ready(f2(sj, pj))
        t0 = time.perf_counter()
        outs = [f2(sj, pj) for _ in range(20)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"grid-gather {name} N={N} D={d}: xla take  {ms:.3f} ms",
              flush=True)
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
    for dt, d in ((np.float32, 128), (np.float32, 256),
                  (jnp.bfloat16, 128), (jnp.bfloat16, 256)):
        name = "f32" if dt == np.float32 else "bf16"
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
        print(f"update {name} D={d}: update_rows {ms:.3f} ms", flush=True)

    # --- fused Adam update (math + dual write-back in one kernel) ---
    from cikm2020_dmt_tpu.ops.scatter_rows import adam_update_rows
    from cikm2020_dmt_tpu.train.lazy import _adam_rows_math
    for dt in (np.float32, jnp.bfloat16):
        name = "f32" if dt == np.float32 else "bf16"
        d = 128
        nreal = int(U * 0.4)
        ids = np.concatenate([
            np.sort(rng.permutation(R)[:nreal]),
            R + np.arange(U - nreal)]).astype(np.int32)
        table = jnp.asarray(rng.normal(size=(R, d)).astype(dt))
        mv = jnp.asarray(np.abs(rng.normal(size=(R, 2 * d))
                                ).astype(np.float32))
        rows = jnp.take(table, jnp.minimum(jnp.asarray(ids), R - 1), axis=0)
        g = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
        mvu = jnp.take(mv, jnp.minimum(jnp.asarray(ids), R - 1), axis=0)
        lr, count = jnp.float32(0.01), jnp.int32(7)
        b1, b2, eps = 0.9, 0.999, 1e-8
        p_new, mv_new = jax.jit(lambda r, gg, m: _adam_rows_math(
            r, gg, m, lr, count, b1, b2, eps, table.dtype))(rows, g, mvu)
        want_t = np.asarray(table).copy()
        want_t[ids[:nreal]] = np.asarray(p_new)[:nreal]
        want_mv = np.asarray(mv).copy()
        want_mv[ids[:nreal]] = np.asarray(mv_new)[:nreal]
        try:
            f = jax.jit(lambda t, m, i, r, gg, mm: adam_update_rows(
                t, m, i, r, gg, mm, lr, count, b1, b2, eps),
                donate_argnums=(0, 1))
            got_t, got_mv = f(table, mv, jnp.asarray(ids), rows, g, mvu)
            ok_t = np.allclose(np.asarray(got_t, np.float32),
                               want_t.astype(np.float32), rtol=2e-6,
                               atol=2e-6)
            ok_mv = np.allclose(np.asarray(got_mv), want_mv, rtol=2e-6,
                                atol=2e-6)
            print(f"adam_fused {name}: table={ok_t} mv={ok_mv}", flush=True)
            gt, gm = f(got_t, got_mv, jnp.asarray(ids), rows, g, mvu)
            jax.block_until_ready((gt, gm))
            t0 = time.perf_counter()
            for _ in range(50):
                gt, gm = f(gt, gm, jnp.asarray(ids), rows, g, mvu)
            jax.block_until_ready((gt, gm))
            ms = (time.perf_counter() - t0) / 50 * 1e3
            print(f"adam_fused {name}: {ms:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - report compile failure
            print(f"adam_fused {name} FAILED: {e!r}"[:400], flush=True)

    # --- write_rows: VMEM-source single-row DMA (the fused-Adam kernel
    #     design needs this to compile on hardware; interpret-mode-only
    #     so far) ---
    from cikm2020_dmt_tpu.ops.scatter_rows import write_rows
    Rw, dw, nw = 100_000, 128, 4096
    ids = np.sort(rng.permutation(Rw)[:nw]).astype(np.int32)
    rows = rng.normal(size=(nw, dw)).astype(np.float32)
    want = np.zeros((Rw, dw), np.float32)
    want[ids] = rows
    try:
        out = np.asarray(jax.jit(
            lambda i, r: write_rows(i, r, Rw))(jnp.asarray(ids),
                                               jnp.asarray(rows)))
        print(f"write_rows (VMEM-source row DMA): "
              f"correct={np.array_equal(out, want)}", flush=True)
    except Exception as e:  # noqa: BLE001 - report compile failure
        print(f"write_rows FAILED to compile/run on hw: {e!r}"[:400],
              flush=True)


if __name__ == "__main__":
    main()
