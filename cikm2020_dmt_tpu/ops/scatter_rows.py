"""Row-granular HBM DMA kernels + scatter-free dedup gathers: the fast
paths for embedding reads/writes on TPU.

Device traces show XLA's scatter-add processes ~0.13us per update row
regardless of table size, layout, sortedness or dtype — serialized
read-modify-write; inside the full step the memory-space-assignment pass
makes the in-place row scatter another ~5 ms pathology.  The kernels
here replace those with per-row async HBM DMA (``update_rows``,
``adam write-back``) and a streaming MXU segment-sum
(``sorted_segment_sum_rows``); the custom-VJP gathers
(``take_rows_sparse*``, ``take_onehot``, ``dedup_take*``) keep the
GRADIENT side scatter-free by construction.

Graveyard (round-4 prune of measured-dead paths, VERDICT r3 #5; see
PARITY.md negative results): ``gather_rows`` per-row DMA read (11.7 ms
vs 2.0 ms XLA take at the N=291k grid shape — DMA issue rate loses to
XLA's pipelined gather), ``write_rows``/``scatter_add_rows`` (single-row
DMA out of tiled VMEM is illegal on Mosaic — never compiled on hw),
``tiled_scatter_add`` (no production user), and the HBM-staged fused
Adam kernel ``adam_update_rows`` (byte-identical to XLA-math + two
``update_rows`` once Mosaic forces the HBM staging hop; two-stage ships
instead), and a kb-lane-block kernel moving each 256-lane row as two
[1, 128] DMAs at lane offsets 0/128 (interpret-correct, but Mosaic
rejects lane-offset row slices of >128-lane memrefs on hw — r4 probe).

Hardware law (v5e, Mosaic; scripts/verify_update_rows_tpu.py): per-row
HBM DMA compiles ONLY for 32-bit dtypes at exactly 128 lanes.  bf16
memrefs carry (2,1) sublane packing ("Slice shape along dimension 0
must be aligned to tiling (8)") and no free int32 view exists (a
jax-level bitcast is row-major logical -> full-table relayout, 42 ms
at Sku size); 256-lane rows fail the slice-width check both as whole
rows and as two lane-offset [1, 128] slices (r4 probes).  Wide 32-bit
rows therefore go through a row-stacked [k*R, 128] layout instead
(see train/lazy.lazy_adam_rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _update_rows_kernel(ids_ref, rows_hbm, table_hbm, out_hbm, *,
                        chunk: int, num_rows: int, nslots: int = 8):
    """In-place row overwrite: per id, one HBM->HBM row DMA from the update
    block straight into the table (aliased in/out) — no VMEM staging, no
    scatter emitter.  Out-of-range ids (the lazy-Adam sentinel tail,
    >= num_rows) are skipped: same semantics as
    ``.at[ids].set(rows, mode="drop")`` for unique ids.

    ids arrive via a (1, chunk) SMEM BlockSpec (Pallas pipelines the
    fetch); rows/table are PINNED to HBM because Mosaic cannot slice
    single sublanes out of tiled VMEM, while HBM row slices are free.
    (``pl.ANY`` is not enough: the compiler places sub-threshold operands
    in VMEM — the bf16-table write-back failed exactly this way on v5e,
    "Slice shape along dimension 0 must be aligned to tiling (8)";
    the r2-era f32 D=128 case only compiled because its 18.6 MB update
    block exceeded the placement threshold.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)

    def body(sem_w):
        def issue(i, _):
            row_id = ids_ref[0, 0, i]

            # free the slot: wait for its previous DMA (if it was started)
            @pl.when(i >= nslots)
            def _():
                prev = ids_ref[0, 0, i - nslots]

                @pl.when(prev < num_rows)
                def _():
                    pltpu.make_async_copy(
                        rows_hbm.at[step * chunk + i - nslots],
                        out_hbm.at[prev],
                        sem_w.at[i % nslots]).wait()

            @pl.when(row_id < num_rows)
            def _():
                pltpu.make_async_copy(
                    rows_hbm.at[step * chunk + i],
                    out_hbm.at[row_id],
                    sem_w.at[i % nslots]).start()
            return 0

        jax.lax.fori_loop(0, chunk, issue, 0)

        def drain(k, _):
            i = chunk - nslots + k
            rid = ids_ref[0, 0, i]

            @pl.when(rid < num_rows)
            def _():
                pltpu.make_async_copy(
                    rows_hbm.at[step * chunk + i],
                    out_hbm.at[rid],
                    sem_w.at[i % nslots]).wait()
            return 0

        jax.lax.fori_loop(0, nslots, drain, 0)

    pl.run_scoped(body, sem_w=pltpu.SemaphoreType.DMA((nslots,)))


def update_rows(table: jnp.ndarray, ids: jnp.ndarray, rows: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """``table.at[ids].set(rows, mode="drop")`` for UNIQUE ids as a Pallas
    row-DMA kernel: the table stays in place (aliased in/out, donatable)
    and only the touched rows move — no full-table traffic, no scatter
    emitter.  Lane count must be a 128 multiple (the packed-table layout
    guarantees it for the lazy-Adam write-back).

    HARDWARE LAW (measured r4, v5e Mosaic): compiles ONLY for 32-bit
    dtypes at exactly 128 lanes.  16-bit HBM memrefs pack SUBLANE pairs
    into 32-bit words ((2,1) tiling), so single rows are not sliceable
    and no free int32 view exists (a jax-level bitcast is row-major
    logical -> full-table relayout, measured 42 ms at Sku size); 256-lane
    rows fail Mosaic's slice-width check outright.  bf16 tables
    therefore keep the XLA scatter — or store f32 with a bf16 union grid
    (cfg.grid_bf16), which keeps the bandwidth win where the bytes are
    (the [N, D] grid) and regains this kernel for the write-back."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = rows.shape
    num_rows = table.shape[0]
    assert table.shape[1] == d and d == 128 \
        and table.dtype.itemsize == 4, (table.shape, rows.shape)
    # mode="drop" parity: negative ids must be dropped too, not DMA'd to a
    # negative row offset — fold them into the >= num_rows skip guard
    ids = jnp.where(ids < 0, jnp.int32(num_rows), ids.astype(jnp.int32))
    chunk = 512
    npad = ((n + chunk - 1) // chunk) * chunk
    if npad != n:
        ids = jnp.pad(ids, (0, npad - n), constant_values=num_rows)
        rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
    # 3-D [nchunks, 1, chunk] so the SMEM block's trailing two dims equal
    # the array dims (Pallas TPU block-shape constraint)
    ids = ids.reshape(npad // chunk, 1, chunk)

    # DMT_DMA_NSLOTS: in-flight row-DMA depth (A/B; 8 = shipped default,
    # measured vs 16/32 standalone in verify_update_rows_tpu.py)
    import os
    nslots = int(os.environ.get("DMT_DMA_NSLOTS", "8"))
    kernel = functools.partial(_update_rows_kernel, chunk=chunk,
                               num_rows=num_rows, nslots=nslots)

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
        interpret=interpret,
    )(ids, rows, table)


def _sorted_segsum_kernel(seg_smem, seg_vmem, g_ref, zero_ref, out_hbm,
                          loc_ref, carry_ref, cseg_ref, sem,
                          *, chunk: int, nsteps: int):
    """One sequential grid step = one chunk of the SORTED cotangent stream.

    Per chunk: local run sums via a one-hot MXU matmul over the chunk's
    relative run ids (dense runs -> rel in [0, chunk)); the previous
    chunk's trailing (possibly incomplete) run carries over in VMEM
    scratch and merges into local row 0 when it continues; one [chunk, D]
    block DMA writes rows [s0, s0+chunk) of the output.  Later chunks
    overwrite earlier chunks' incomplete trailing rows (grid steps are
    sequential on TPU and each DMA waits its predecessor), so every run's
    FINAL write is the complete sum from the chunk where it ends.  loc is
    double-buffered so the matmul of chunk n overlaps the DMA of n-1."""
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    slot = jax.lax.rem(n, 2)

    @pl.when(n == 0)
    def _():
        cseg_ref[0] = -1

    s0 = seg_smem[0, 0, 0]
    last_rel = seg_smem[0, 0, chunk - 1] - s0

    rel = seg_vmem[0, 0, :] - s0                          # [chunk] int32
    g = g_ref[:]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
          == rel[None, :]).astype(g.dtype)                # oh[k, c]
    # f32 operands need HIGHEST precision: the default MXU f32 dot rounds
    # operands to bf16, measured max err/sum|g| 3.9e-3 on v5e (vs 2e-7 for
    # XLA segment_sum, scripts/verify_segsum_mv_tpu.py) — gradient sums
    # can't wear that.  bf16 operands keep DEFAULT (the native single-pass
    # bf16 MXU path): 0/1 one-hots are exact in bf16 and the dot
    # accumulates the bf16 cotangent rows EXACTLY into f32 — better than
    # any host-side f32 cast could do.
    prec = (jax.lax.Precision.HIGHEST if g.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    local = jax.lax.dot_general(
        oh, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(loc_ref.dtype)
    loc_ref[slot] = local

    # trailing-run sum via masked VPU reduction (no dynamic sublane read).
    # Compare the [chunk, 1] int32 reshape against the scalar — Mosaic
    # rejects reshaping the i1 mask itself (minor-dim insertion is
    # 32-bit-only on v5e).  dtype=f32 keeps bf16 inputs accumulating in
    # f32 (carry/loc scratch are f32 regardless of the input dtype).
    tail = jnp.sum(jnp.where(rel[:, None] == last_rel, g, 0.0),
                   axis=0, dtype=jnp.float32).astype(carry_ref.dtype)  # [d]
    cont = cseg_ref[0] == s0
    # if the whole chunk is still the carried run, the old carry must also
    # roll forward (it is merged into loc row 0 below, which stays partial)
    carry_fwd = jnp.where(cont & (last_rel == 0), carry_ref[0, :], 0.0)

    @pl.when(cont)
    def _():
        loc_ref[slot, 0, :] += carry_ref[0, :]

    carry_ref[0, :] = tail + carry_fwd
    cseg_ref[0] = s0 + last_rel

    # write AFTER the previous chunk's (potentially overlapping) write;
    # seg_smem row layout is [1, 1, chunk+1]: this chunk's segs plus the
    # PREVIOUS chunk's s0 at the tail (only the byte count matters for the
    # wait, but keep the descriptor exact)
    @pl.when(n > 0)
    def _():
        pltpu.make_async_copy(
            loc_ref.at[1 - slot],
            out_hbm.at[pl.ds(seg_smem[0, 0, chunk], chunk)],
            sem.at[1 - slot]).wait()
    pltpu.make_async_copy(loc_ref.at[slot], out_hbm.at[pl.ds(s0, chunk)],
                          sem.at[slot]).start()

    @pl.when(n == nsteps - 1)
    def _():
        pltpu.make_async_copy(loc_ref.at[slot], out_hbm.at[pl.ds(s0, chunk)],
                              sem.at[slot]).wait()


def sorted_segment_sum_rows(g_sorted: jnp.ndarray, seg: jnp.ndarray,
                            num_out: int, chunk: int = 256,
                            interpret: bool = False) -> jnp.ndarray:
    """``segment_sum(g_sorted, seg, num_segments=num_out)`` for a
    NONDECREASING, DENSE ``seg`` (every value in [0, seg[-1]] occurs) as a
    streaming Pallas kernel — no serialized scatter-add anywhere.

    Replaces the lazy-Adam backward's XLA segment_sum (train/lazy.py),
    which device traces put at ~4.2 ms/step for N=291k rows against a
    ~0.4 ms bandwidth floor: XLA lowers it to a per-row read-modify-write
    scatter.  Here each run's sum is built on the MXU (chunked one-hot
    dot), runs that straddle chunk boundaries carry over in VMEM, and
    output rows stream out as [chunk, D] block DMAs.  Cost scales as
    N*chunk*D MXU FLOPs + 2 passes of HBM bandwidth.

    Accumulation (loc/carry scratch AND the output) is ALWAYS f32 — bf16
    cotangents (bf16-table grids, the production default) sum exactly on
    the bf16->f32 MXU path; the caller casts the [num_out, D] result back
    if it needs the input dtype.

    Requires D % 128 == 0.  Slots never named by ``seg`` stay zero."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = g_sorted.shape
    assert d % 128 == 0, g_sorted.shape
    npad = ((n + chunk - 1) // chunk) * chunk
    if npad != n:
        g_sorted = jnp.pad(g_sorted, ((0, npad - n), (0, 0)))
        seg = jnp.pad(seg, (0, npad - n), mode="edge")
    nsteps = npad // chunk
    seg = seg.astype(jnp.int32)
    # SMEM layout [nsteps, 1, chunk+1]: chunk segs + PREV chunk's s0 (the
    # wait-side DMA must re-derive the previous destination offset)
    prev_s0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               seg[:-chunk:chunk] if nsteps > 1
                               else jnp.zeros((0,), jnp.int32)])
    seg_smem = jnp.concatenate(
        [seg.reshape(nsteps, chunk), prev_s0[:, None]], axis=1)
    seg_smem = seg_smem.reshape(nsteps, 1, chunk + 1)
    seg_vmem = seg.reshape(nsteps, 1, chunk)
    # output over-allocated by one chunk: the last block write spans
    # [s0_last, s0_last + chunk); zeros-alias pre-clears slots no chunk
    # covers (budget > unique runs)
    zeros = jnp.zeros((num_out + chunk, d), jnp.float32)

    kernel = functools.partial(_sorted_segsum_kernel, chunk=chunk,
                               nsteps=nsteps)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk + 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
            pl.BlockSpec((chunk, d), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((num_out + chunk, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), jnp.float32),
            pltpu.VMEM((8, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg_smem, seg_vmem, g_sorted, zeros)
    return out[:num_out]


# ---------------------------------------------------------------------------
# Dedup-gradient gather: custom VJP whose backward sorts + segment-sums the
# cotangent rows so the (serialized, 0.13us/row) scatter only touches the
# UNIQUE ids.  Real ranking batches are heavily Zipfian (measured 19.7x
# duplication for sku ids on the JD demo at batch 4096), so the unique
# count is a small fraction of the update count.
# ---------------------------------------------------------------------------


def _dedup_grad_table(ids_flat: jnp.ndarray, g_flat: jnp.ndarray,
                      num_rows: int, budget: int) -> jnp.ndarray:
    """Dense [num_rows, D] gradient via sort+segment-sum+budgeted scatter;
    falls back to the plain full scatter when unique ids exceed ``budget``
    (both branches compile; the fast one runs when real data dedups)."""
    n = ids_flat.shape[0]
    d = g_flat.shape[-1]
    order = jnp.argsort(ids_flat)
    sids = ids_flat[order]
    sg = g_flat[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first) - 1
    nuniq = seg[-1] + 1
    summed = jax.ops.segment_sum(sg, seg, num_segments=n)       # run-indexed
    run_ids = jax.ops.segment_max(sids, seg, num_segments=n)
    valid = jnp.arange(n) < nuniq
    run_ids = jnp.where(valid, run_ids, num_rows)               # trash row

    def fast(_):
        # mode="drop": sentinel ids (== num_rows) fall off the edge, so no
        # trash row and no [R+1]->[R] slice copy of the 640MB buffer
        return jnp.zeros((num_rows, d), g_flat.dtype).at[
            run_ids[:budget]].add(summed[:budget], mode="drop")

    def slow(_):
        return jnp.zeros((num_rows, d), g_flat.dtype).at[ids_flat].add(g_flat)

    return jax.lax.cond(nuniq <= budget, fast, slow, None)


# ---------------------------------------------------------------------------
# Scatter-free dedup gather: forward is a plain row gather; backward routes
# the cotangent with segment-sum + GATHERS only (no serialized scatter at
# all).  Used by the sharded sequence path, where the caller has already
# sorted the ids: it supplies the sort order, the run index per sorted
# element, and the inverse bucket->run map, all precomputed as pure gather
# arithmetic.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_dedup(num_unique: int, rows: jnp.ndarray, final_idx: jnp.ndarray,
                 order: jnp.ndarray, seg: jnp.ndarray,
                 slot_to_run: jnp.ndarray) -> jnp.ndarray:
    """rows[final_idx] whose backward is segment-sum + gather.

    - ``final_idx`` [N]: row index per output element
    - ``order`` [N]: permutation sorting the original elements by id
    - ``seg`` [N]: run index (0..num_unique) per SORTED element; elements of
      one run share one final_idx value
    - ``slot_to_run`` [len(rows)]: run index feeding each row slot, or
      ``num_unique`` for slots fed by no run (cotangent 0)
    """
    return jnp.take(rows, final_idx, axis=0, mode="clip")


def _gather_dedup_fwd(num_unique, rows, final_idx, order, seg, slot_to_run):
    out = jnp.take(rows, final_idx, axis=0, mode="clip")
    return out, (order, seg, slot_to_run)


def _gather_dedup_bwd(num_unique, res, g):
    order, seg, slot_to_run = res
    d = g.shape[-1]
    gs = g.reshape(-1, d)[order]
    run_sums = jax.ops.segment_sum(gs, seg, num_segments=num_unique)
    run_sums = jnp.concatenate(
        [run_sums, jnp.zeros((1, d), run_sums.dtype)], axis=0)
    g_rows = jnp.take(run_sums, slot_to_run, axis=0)
    return g_rows, None, None, None, None


gather_dedup.defvjp(_gather_dedup_fwd, _gather_dedup_bwd)


@jax.custom_vjp
def take_rows_sparse(rows_ext: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """``rows_ext[pos]`` whose backward is ONE segment-sum into the
    [num_slots, D] cotangent (num_slots = len(rows_ext)).

    Intended for the lazy-Adam union lookup (train/lazy.py): ``pos`` maps
    every union element to its unique-row slot, so the cotangent
    accumulator is budget-sized (fits VMEM for the default budget) rather
    than table-sized, and out-of-range slots are impossible by
    construction.  The forward is a plain XLA row gather (the per-row DMA
    kernel variant measured 5.8x SLOWER at the N=291k grid shape —
    pruned, see module docstring)."""
    return jnp.take(rows_ext, pos, axis=0, mode="clip")


def _take_rows_sparse_fwd(rows_ext, pos):
    return take_rows_sparse(rows_ext, pos), (pos, rows_ext.shape[0])


def _take_rows_sparse_bwd(res, g):
    pos, num_slots = res
    d = g.shape[-1]
    # bf16 grids accumulate in f32 (one rounding at the end); no-op for f32
    g_rows = jax.ops.segment_sum(
        g.reshape(-1, d).astype(jnp.float32), pos.reshape(-1),
        num_segments=num_slots).astype(g.dtype)
    return g_rows, None


take_rows_sparse.defvjp(_take_rows_sparse_fwd, _take_rows_sparse_bwd)


def _dma_bwd_wanted(d: int) -> bool:
    # default ON since r4: under the cycling-batch bench the composite
    # backward (XLA take reorder + streaming segsum) measures 90.4k vs
    # 84.9k ex/s with the in-step segment_sum (the r3 "neutral" verdict
    # compared against a fixed reused batch).  DMT_DMA_BWD=0 restores
    # the segment_sum backward.
    import os
    return (os.environ.get("DMT_DMA_BWD", "1") == "1"
            and jax.default_backend() == "tpu" and d % 128 == 0)


@jax.custom_vjp
def take_rows_sparse_sorted(rows_ext: jnp.ndarray, pos: jnp.ndarray,
                            order: jnp.ndarray,
                            seg_sorted: jnp.ndarray) -> jnp.ndarray:
    """``take_rows_sparse`` variant for callers that already hold the sort
    structure (train/lazy.collect): ``order`` is the permutation sorting
    the N elements by id, ``seg_sorted`` the nondecreasing dense run index
    per SORTED element (capped at num_slots-1 for budget overflow), with
    pos[order[r]] == seg_sorted[r].

    Backward on TPU (DMT_DMA_BWD=1): reorder the cotangent rows with an
    XLA take over ``order`` (standalone: 2.0 ms; the per-row DMA gather
    lost 5.8x and was pruned), then reduce contiguous runs with the
    streaming sorted_segment_sum_rows kernel (2.2 ms vs XLA segment_sum's
    5.5 ms standalone at the N=291k lazy-backward shape).  Elsewhere the
    plain segment_sum backward runs."""
    return take_rows_sparse(rows_ext, pos)


def _take_rows_sparse_sorted_fwd(rows_ext, pos, order, seg_sorted):
    out = take_rows_sparse(rows_ext, pos)
    return out, (pos, order, seg_sorted, rows_ext.shape[0])


def _take_rows_sparse_sorted_bwd(res, g):
    pos, order, seg_sorted, num_slots = res
    d = g.shape[-1]
    gf = g.reshape(-1, d)
    if _dma_bwd_wanted(d) and gf.dtype in (jnp.float32, jnp.bfloat16):
        # reorder the cotangent rows into id-sorted order, then stream
        # contiguous runs; the kernel accumulates f32 and returns f32
        # (exact for bf16 cotangents), rounded once to the grid dtype
        g_sorted = jnp.take(gf, order, axis=0)
        g_rows = sorted_segment_sum_rows(
            g_sorted, seg_sorted, num_slots).astype(gf.dtype)
    else:
        # bf16 grids accumulate in f32 (one rounding at the end)
        g_rows = jax.ops.segment_sum(
            gf.astype(jnp.float32), pos.reshape(-1),
            num_segments=num_slots).astype(gf.dtype)
    return g_rows, None, None, None


take_rows_sparse_sorted.defvjp(_take_rows_sparse_sorted_fwd,
                               _take_rows_sparse_sorted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_onehot(table: jnp.ndarray, ids: jnp.ndarray,
                bf16_grad: bool = False) -> jnp.ndarray:
    """``jnp.take(table, ids, axis=0, mode="clip")`` whose backward is a
    one-hot matmul on the MXU instead of a serialized scatter-add.

    For SMALL tables the cotangent accumulation
    ``zeros([R, D]).at[ids].add(g)`` serializes per row even with a
    VMEM-resident accumulator; the same reduction as
    ``onehot(ids)[N, R]^T @ g[N, D]`` rides the systolic array, and XLA
    fuses the iota-compare one-hot generation into the dot operand (no
    [N, R] materialization in HBM).  Measured on TPU v5e at the flagship
    id volume (N=290k, R=2048, D=16): 0.24 vs 2.77 ms — 11.6x faster.
    Only sensible when R is small (FLOPs scale with N*R*D).

    The FORWARD also rides the MXU when the table is bf16:
    ``onehot(ids) @ table`` selects rows exactly (0/1 weights are exact in
    bf16, f32 accumulation) and beats the row gather at the same id
    volume.  f32 tables keep the gather — the f32 MXU rate makes the
    matmul a wash there.

    ``bf16_grad=True`` (static) rounds an f32 cotangent to bf16 before the
    backward dot so it runs at the bf16 MXU rate (the f32 dot lowers to a
    3-pass bf16 decomposition, ~4x slower).  Accumulation stays f32; only
    the per-element cotangents lose mantissa — the same compression bf16
    gradient all-reduces apply.  Flag-gated via cfg.onehot_bwd_bf16, only
    engaged when the model already computes in bf16."""
    if table.dtype == jnp.bfloat16:
        num_rows, d = table.shape
        idf = jnp.clip(ids.reshape(-1).astype(jnp.int32), 0, num_rows - 1)
        oh = (idf[:, None] == jnp.arange(num_rows, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(oh, table, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.astype(table.dtype).reshape(*ids.shape, d)
    return jnp.take(table, ids, axis=0, mode="clip")


def _take_onehot_fwd(table, ids, bf16_grad):
    # fwd receives all args in primal order (only bwd gets nondiff first);
    # residuals must be JAX types: a 0-dim array carries the table dtype
    return take_onehot(table, ids, bf16_grad), (ids, table.shape[0],
                                                jnp.zeros((), table.dtype))


def _take_onehot_bwd(bf16_grad, res, g):
    ids, num_rows, dt_probe = res
    tdtype = dt_probe.dtype
    d = g.shape[-1]
    idf = jnp.clip(ids.reshape(-1).astype(jnp.int32), 0, num_rows - 1)
    gf = g.reshape(-1, d)
    if bf16_grad and gf.dtype == jnp.float32:
        gf = gf.astype(jnp.bfloat16)
    oh = (idf[:, None]
          == jnp.arange(num_rows, dtype=jnp.int32)[None, :]).astype(gf.dtype)
    # f32 cotangents must request HIGHEST explicitly: JAX's DEFAULT TPU
    # matmul precision is a single bf16 pass (measured ~4e-3 relative
    # rounding on v5e, scripts/verify_segsum_mv_tpu.py), not the 3-pass
    # decomposition this path budgets for.  bf16 cotangents keep DEFAULT.
    prec = (jax.lax.Precision.HIGHEST if gf.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dtable = jax.lax.dot_general(oh, gf, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
    return dtable.astype(tdtype), None


take_onehot.defvjp(_take_onehot_fwd, _take_onehot_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dedup_take(table: jnp.ndarray, ids: jnp.ndarray,
               budget_div: int = 4,
               vjp_reduce_axes: tuple = ()) -> jnp.ndarray:
    """jnp.take(table, ids, axis=0) with a dedup-scatter backward.

    ``vjp_reduce_axes``: mesh axis names to psum the table cotangent over
    — REQUIRED when called inside a shard_map body whose table arg is
    invariant along some axis (e.g. the row-sharded pooled lookup: the
    table shard is invariant over the data axis, but each data shard
    computes a partial gradient; custom-VJP outputs must carry the
    primal's varying axes, so the bwd reduces explicitly where plain-op
    transposes would have had shard_map insert the psum)."""
    return jnp.take(table, ids, axis=0, mode="clip")


# ---------------------------------------------------------------------------
# Exact-dedup gather for SMALL tables: ids live in [0, num_rows) with
# num_rows small, so the unique count is <= min(N, num_rows) by pigeonhole
# — the dedup backward needs NO overflow cond and NO budget heuristic.
# sort + segment-sum + a scatter of at most num_rows unique rows replaces
# the N-row serialized scatter-add (0.127us/row): for the 2048-row
# Brand/Shopid/Cid3 tables one seq site drops from ~287k scattered rows to
# <=2048.
# ---------------------------------------------------------------------------


def _exact_grad_table(ids_flat: jnp.ndarray, g_flat: jnp.ndarray,
                      num_rows: int) -> jnp.ndarray:
    n = ids_flat.shape[0]
    d = g_flat.shape[-1]
    budget = min(n, num_rows)                      # static; never overflows
    order = jnp.argsort(ids_flat)
    # match the forward's mode="clip" routing for out-of-range ids
    sids = jnp.clip(ids_flat[order], 0, num_rows - 1)
    sg = g_flat[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = (jnp.cumsum(first) - 1).astype(jnp.int32)
    # run-indexed sums land compacted in [budget, d] directly
    summed = jax.ops.segment_sum(sg, seg, num_segments=budget)
    # run -> id via sort compaction (NO searchsorted — it lowers to a
    # vmapped binary-search while-loop, measured +24ms/step): distinct ids
    # ascend, so sorting first-of-run ids with a big sentinel puts run r's
    # id at slot r; sentinel rows are dropped by the scatter
    rids = jnp.sort(jnp.where(first, sids, jnp.int32(num_rows)))[:budget]
    return jnp.zeros((num_rows, d), g_flat.dtype).at[rids].add(
        summed, mode="drop")


@jax.custom_vjp
def dedup_take_exact(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """jnp.take(table, ids, axis=0, mode="clip") whose backward scatters at
    most ``min(ids.size, len(table))`` unique rows — exact (no budget, no
    cond fallback); intended for small tables where num_rows bounds the
    unique count tightly."""
    return jnp.take(table, ids, axis=0, mode="clip")


def _dedup_take_exact_fwd(table, ids):
    return dedup_take_exact(table, ids), (ids, table.shape)


def _dedup_take_exact_bwd(res, g):
    ids, shape = res
    dtable = _exact_grad_table(ids.reshape(-1).astype(jnp.int32),
                               g.reshape(-1, shape[1]), shape[0])
    return dtable, None


dedup_take_exact.defvjp(_dedup_take_exact_fwd, _dedup_take_exact_bwd)


def _dedup_take_fwd(table, ids, budget_div, vjp_reduce_axes):
    return dedup_take(table, ids, budget_div, vjp_reduce_axes), \
        (ids, table.shape)


def _dedup_take_bwd(budget_div, vjp_reduce_axes, res, g):
    ids, shape = res
    ids_flat = ids.reshape(-1)
    g_flat = g.reshape(-1, shape[1])
    budget = max(256, ids_flat.shape[0] // budget_div)
    dtable = _dedup_grad_table(ids_flat, g_flat, shape[0], budget)
    if vjp_reduce_axes:
        dtable = jax.lax.psum(dtable, vjp_reduce_axes)
    return dtable, None


dedup_take.defvjp(_dedup_take_fwd, _dedup_take_bwd)
