"""Lazy (sparse row-wise) Adam for large embedding tables.

Device traces of the flagship step (scripts/trace_step.py, TPU v5e,
batch 4096, 5M-row packed Sku table) showed the dense embedding-gradient
path costing ~35 ms/step: ~21 ms materializing the dense [R, 128] gradient
(budgeted dedup scatter + overflow conditionals + zeros broadcast) and
~17 ms of dense Adam (param add + m/v decay fusions = ~1.9 GB of HBM
traffic) — all to update ~15-30k touched rows.

Row-sparse replacement, designed around two measured TPU laws:
XLA ``sort`` is cheap (~2.4 ms for all of a step's sorts) while
``searchsorted`` and per-element scalar gathers are catastrophic (a
vmapped binary-search while-loop, ~80 ms/step in the first cut of this
module).  Everything here is therefore built from sorts, slices, cumsums
and row gathers only:

    1. BEFORE the loss, concatenate the batch's id union across every
       embedding spec sharing the table (known per-feature offsets),
       argsort it ONCE.  Run index r of the sorted union <-> slot r of
       the unique-id vector ``uids`` (compacted with one more sort, no
       searchsorted).  The per-element slot map ``pos`` is the run index
       carried back through the inverse permutation (argsort of the
       permutation).  Budget overflow (unique > N/div) maps to slot U.
    2. Differentiate w.r.t. ``rows = table[uids]``: the whole union is
       gathered in ONE ``take_rows_sparse(rows_ext, pos)`` whose backward
       is a single ``segment_sum`` into the [U+1, D] cotangent — no
       serialized big-table scatter anywhere in the gradient.  Each
       engine lookup just SLICES its range out of the union grid
       (sites are identified by id() of the batch id-array, which the
       model passes through to the engine untouched).
    3. Adam on the [U, D] row block, then three unique-row scatters
       write param/m/v back (``mode="drop"`` swallows sentinel slots).

Semantics are LazyAdam (tf.contrib.opt.LazyAdamOptimizer): rows untouched
by a step keep stale moments (no decay).  This deviates from the
reference's dense TF1 AdamOptimizer (inference_mlp.py:264-280) — a
documented, flag-gated deviation (``lazy_adam = false`` restores dense
Adam).  Bias correction uses the global step count, matching
optax.scale_by_adam.

Budget overflow (never observed on Zipfian ranking traffic at div=8,
measured 19.7x duplication): overflowed ids skip their gradient for that
one step.  Their FORWARD value stays exact by default
(cfg.lazy_overflow_exact): a lax.cond-gated fallback gathers the true
table rows for the missed elements, so no-overflow steps pay nothing and
overflow steps pay one [N, Dphys] gather.  With the flag off, overflowed
ids read the zero row (degrade like OOV for that step).

Measured (TPU v5e, flagship step, batch 4096): 78.6 -> 68.6 ms/step
(52.1k -> 59.7k ex/s) vs the dense dedup-scatter + dense-Adam path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.config import DMTConfig
from ..ops.scatter_rows import take_rows_sparse_sorted


@dataclass(frozen=True)
class LazyTableSpec:
    """Static plan for one lazily-updated table."""
    name: str                             # params["emb"] / engine key
    fields: tuple[tuple[str, int], ...]   # (feature, id_size)
    pack: int                             # logical rows per physical row
    dim: int                              # logical embedding dim
    sharded: bool = False                 # row-split over the model axis
    full_mesh: bool = False               # row-split over data x model
    #   (parallel/full_shard.py: per-data-shard unions + all_to_all row
    #   and gradient exchange; takes precedence over ``sharded``)


@dataclass
class LazyCollection:
    """Traced per-step artifacts computed BEFORE the loss."""
    uids: jnp.ndarray       # [U] ascending unique PHYS ids, sentinel rphys
    pos: jnp.ndarray        # [N] slot per union element (U = miss/overflow)
    rows: jnp.ndarray       # [U, Dphys] gathered rows (pre-update values)
    offsets: dict           # id(ids_array) -> (offset, numel)
    rphys: int
    overflow: jnp.ndarray = None  # scalar: unique ids beyond the U budget
    order: jnp.ndarray = None     # [N] element index per sorted position
    seg_sorted: jnp.ndarray = None  # [N] capped run id per sorted position
    phys: jnp.ndarray = None      # [N] clipped phys id per union element


@dataclass
class LazyOverlay:
    """What the engine consults per lookup: the union grid + site map.

    ``shards > 1`` (full-mesh tables): the grid is DATA-SHARD-MAJOR
    ([data * n_local, Dphys], P(data)) and ``offsets`` are per-shard
    local — ``overlay_take`` slices per shard through a [data, n_local,
    Dphys] view (local reshapes under GSPMD: every dim division is
    shard-aligned)."""
    grid: jnp.ndarray       # [N, Dphys] differentiable union lookup
    offsets: dict           # id(ids_array) -> (offset, numel)
    pack: int
    dim: int
    shards: int = 1         # data-shard count of the grid layout
    shard_len: int = 0      # n_local (grid rows per shard)


def build_lazy_plan(cfg: DMTConfig, mesh, engine) -> tuple[LazyTableSpec, ...]:
    """Tables eligible for lazy Adam under this config/mesh.

    Gates: flag on, optimizer adam (the row update implements Adam math),
    no model-axis sharding of the tables (row-split tables update through
    the dense shard_map path; a sharded lazy update is future work), no
    embedding L2 (wnd_wd differentiates table leaves directly), and no
    ts features on the table (ts ids are re-bucketized inside the model,
    so the engine sees a different array than the batch's).

    Pure DATA-parallel meshes (model axis == 1) are eligible: the math is
    the single-chip math on the global batch, GSPMD inserts the data-axis
    collectives, and the gradient all-reduce shrinks from the full dense
    [R, D] table cotangent to the [U, D] touched-row block — ~R/U x fewer
    bytes over ICI per big table (scripts/collective_bytes.py --data).

    Row-split tables (model axis > 1, ``spec.sharded``): the union rows
    are exchanged ONCE per step (masked local gather + model-axis psum of
    [U, Dphys], parallel/embedding_shard.shard_take_rows) and every
    lookup site slices the replicated grid — amortizing the collective
    across the table's sites, where the dense shard_map path pays one
    collective per lookup.  The Adam update is fully LOCAL: each shard
    gathers its own moments and drop-scatters only the rows it owns
    (lazy_adam_rows_sharded) — no collective on the update side."""
    from ..core.mesh import DATA_AXIS, MODEL_AXIS
    if not (cfg.lazy_adam and cfg.optimizer.lower() == "adam"
            and cfg.wnd_wd <= 1e-5):
        return ()
    M = 1 if mesh is None else mesh.shape.get(MODEL_AXIS, 1)
    n_dev = M if mesh is None else M * mesh.shape.get(DATA_AXIS, 1)
    from ..parallel.full_shard import fms_table_rows
    fms = fms_table_rows(cfg, n_dev) if mesh is not None else {}
    ts_feats = frozenset(cfg.attention_ts)
    by_table: dict[str, list] = {}
    for spec in cfg.embeddings:
        by_table.setdefault(spec.table, []).append(spec)
    out = []
    for tname, specs in by_table.items():
        if max(s.id_size for s in specs) < cfg.dedup_rows_threshold:
            continue
        if any(s.feature in ts_feats for s in specs):
            continue
        meta = engine._meta.get(tname)
        pack = meta[2] if meta is not None else 1
        # physical (packed) rows decide sharding — must agree with
        # core.mesh.param_shardings, which looks at the array shape
        rphys = -(-max(s.id_size for s in specs) // pack)
        # full-mesh sharding takes precedence (parallel/full_shard.py:
        # per-chip-batch-bound all_to_all traffic); a non-divisible /
        # small table on a model mesh stays replicated (matching
        # param_shardings' fallback) and takes the plain path: its grads
        # psum over every mesh axis automatically
        full_mesh = tname in fms
        sharded = (not full_mesh and M > 1
                   and rphys >= cfg.shard_rows_threshold
                   and rphys % M == 0)
        out.append(LazyTableSpec(
            tname, tuple((s.feature, s.id_size) for s in specs),
            pack, specs[0].dim, sharded, full_mesh))
    return tuple(out)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def collect(spec: LazyTableSpec, batch: dict, table: jnp.ndarray,
            budget_div: int, mesh=None) -> LazyCollection:
    """Sort the table's id union once; derive uids / per-element slots /
    gathered rows — sorts, cumsums, slices and row gathers only.

    ``spec.sharded`` (row-split table over the model axis): the [U] union
    rows are exchanged here, once, via masked gather + psum
    (parallel/embedding_shard.shard_take_rows) instead of a plain take —
    every downstream lookup site then slices the replicated grid."""
    from ..data.pipeline import IDS

    rphys = table.shape[0]
    parts, offsets, off = [], {}, 0
    for feature, _ in spec.fields:
        arr = batch[feature + IDS]
        flat = arr.reshape(-1).astype(jnp.int32)
        offsets[id(arr)] = (off, flat.shape[0])
        off += flat.shape[0]
        parts.append(flat)
    allids = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    p = spec.pack
    phys = allids // p if p > 1 else allids
    phys = jnp.clip(phys, 0, rphys - 1)        # mirror mode="clip" forwards
    n = phys.shape[0]
    U = _round8(max(256, n // max(1, budget_div)))

    # two-operand sorts replace argsort + N-element permutation gathers
    # (device traces put one [N] int gather at ~5 ms/step): sorting
    # (phys, iota) yields the sorted ids AND the permutation in one sort;
    # sorting (order, seg_ext) applies the INVERSE permutation to seg_ext
    # (slot r of the result is the seg of the element whose sort position
    # is r... i.e. seg_ext routed back to original element order).
    iota = jax.lax.iota(jnp.int32, n)
    s, order = jax.lax.sort((phys, iota), num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    seg = (jnp.cumsum(first) - 1).astype(jnp.int32)      # run id, sorted
    # compact: distinct values ascend, so sorting first-of-run values with
    # a big sentinel puts exactly the unique ids (ascending) up front
    uids = jnp.sort(jnp.where(first, s, jnp.int32(rphys)))[:U]
    # de-duplicate the sentinel tail (all rphys) so uids is strictly
    # ascending AND unique: the write-back scatters can then carry
    # indices_are_sorted + unique_indices, which XLA's TPU scatter
    # emitter needs to skip conflict serialization.  rphys+k stays out of
    # range, so mode="drop" semantics are unchanged.
    uids = jnp.where(uids >= rphys,
                     rphys + jax.lax.iota(jnp.int32, U), uids)
    seg_ext = jnp.where(seg < U, seg, jnp.int32(U))      # overflow -> miss
    _, pos = jax.lax.sort((order, seg_ext), num_keys=1)  # [N] slot per elem
    if spec.sharded:
        from ..parallel.embedding_shard import shard_take_rows
        rows = shard_take_rows(mesh, table, jnp.minimum(uids, rphys - 1))
    else:
        rows = jnp.take(table, jnp.minimum(uids, rphys - 1), axis=0,
                        indices_are_sorted=True)
    # overflow visibility: unique ids beyond the budget read the zero row
    # and take no gradient this step — count them so production runs can
    # tune dedup_budget_div down from the conservative default safely
    nuniq = jnp.sum(first.astype(jnp.int32))
    overflow = jnp.maximum(nuniq - jnp.int32(U), 0)
    return LazyCollection(uids, pos, rows, offsets, rphys, overflow,
                          order, seg_ext, phys)


def make_overlay(spec: LazyTableSpec, col: LazyCollection,
                 rows_diff: jnp.ndarray,
                 table: jnp.ndarray = None, mesh=None) -> LazyOverlay:
    """Build the engine overlay INSIDE the differentiated function:
    ``rows_diff`` is the diff leaf; the union grid is one sparse-backward
    gather shared by every site.

    With ``table`` set (cfg.lazy_overflow_exact), budget-overflowed
    elements read their TRUE table rows (stop-gradient) instead of the
    zero row, so the forward pass stays exact under overflow and only the
    gradient is skipped for that step.  The [N, Dphys] fallback gather
    (~0.127us/row scatter-law cost) sits under a ``lax.cond`` on the
    overflow counter: steady-state no-overflow steps never execute it."""
    if spec.full_mesh:
        # per-data-shard grid build (all local math; the rows were
        # fetched by collect_fms's all_to_all exchange).  The
        # lazy_overflow_exact fallback is not available here — budget-
        # overflowed elements read zeros and the counter reports them
        # (documented deviation; raise dedup_budget_div's denominator or
        # DMT_FMS_CAP_MULT if it fires)
        from ..core.mesh import DATA_AXIS
        from ..parallel.full_shard import overlay_grid_fms
        d_sz = mesh.shape[DATA_AXIS]
        grid = overlay_grid_fms(mesh, rows_diff, col)
        n_local = grid.shape[0] // d_sz
        return LazyOverlay(grid, col.offsets, spec.pack, spec.dim,
                           shards=d_sz, shard_len=n_local)
    rows_ext = jnp.concatenate(
        [rows_diff, jnp.zeros((1, rows_diff.shape[1]), rows_diff.dtype)])
    grid = take_rows_sparse_sorted(rows_ext, col.pos, col.order,
                                   col.seg_sorted)       # [N, Dphys]
    if table is not None:
        U = rows_diff.shape[0]
        miss = (col.pos >= jnp.int32(U))[:, None]

        def _exact(g):
            if spec.sharded:
                # [N, Dphys] exchange of the missed elements' true rows,
                # data-sharded on N — only inside the overflow branch
                from ..parallel.embedding_shard import shard_take_rows
                fb = shard_take_rows(mesh, jax.lax.stop_gradient(table),
                                     col.phys, idx_data_sharded=True)
            else:
                fb = jnp.take(jax.lax.stop_gradient(table), col.phys,
                              axis=0)
            # grid_bf16: f32 tables + bf16 grid — keep the grid dtype
            # (promotion would silently upcast the whole [N, Dp] grid)
            return jnp.where(miss, fb.astype(g.dtype), g)

        grid = jax.lax.cond(col.overflow > 0, _exact, lambda g: g, grid)
    return LazyOverlay(grid, col.offsets, spec.pack, spec.dim)


def overlay_take(ov: LazyOverlay, ids: jnp.ndarray) -> jnp.ndarray:
    """Engine lookup through the overlay: slice this site's range out of
    the union grid (the id-array's identity locates it)."""
    site = ov.offsets.get(id(ids))
    if site is None:
        raise RuntimeError(
            "lazy-Adam overlay: lookup ids are not a batch id-array this "
            "plan collected; exclude the table from lazy_adam or route "
            "the lookup through the batch array unchanged")
    off, numel = site
    if ov.shards > 1:
        # shard-major grid: slice each data shard's local range, then
        # stitch back to batch-major (batch is data-shard-major too)
        dp = ov.grid.shape[-1]
        g3 = ov.grid.reshape(ov.shards, ov.shard_len, dp)
        seg = jax.lax.slice_in_dim(g3, off, off + numel, axis=1)
        grid = seg.reshape(*ids.shape, dp)
    else:
        flat = jax.lax.slice_in_dim(ov.grid, off, off + numel, axis=0)
        grid = flat.reshape(*ids.shape, ov.grid.shape[-1])
    if ov.pack > 1:
        from ..nn.embedding import select_packed
        slot = ids - (ids // ov.pack) * ov.pack
        return select_packed(grid, slot, ov.pack, ov.dim)
    return grid


def _adam_rows_math(rows, g_rows, mvu, lr, count,
                    b1: float, b2: float, eps: float, out_dtype):
    """Shared LazyAdam row math: (p_new, mv_new) for the [U]-row block.

    bf16 tables (cfg.table_bf16_threshold) store rows/grads in bf16; the
    update computes in f32 against the f32 moments and rounds once to
    the table dtype on write-back.  Bias correction uses the global
    post-increment ``count`` (optax.scale_by_adam parity).

    ``mvu`` is the [2, U, D] row-stacked moment block (m = mvu[0],
    v = mvu[1]; see the Trainer.init_state layout note)."""
    mu, vu = mvu[0], mvu[1]
    g32 = g_rows.astype(jnp.float32)
    m_new = b1 * mu + (1.0 - b1) * g32
    v_new = b2 * vu + (1.0 - b2) * (g32 * g32)
    c = count.astype(jnp.float32)
    mhat = m_new / (1.0 - jnp.power(b1, c))
    vhat = v_new / (1.0 - jnp.power(b2, c))
    p_new = (rows.astype(jnp.float32)
             - lr * mhat / (jnp.sqrt(vhat) + eps)).astype(out_dtype)
    return p_new, jnp.stack([m_new, v_new])


def lazy_adam_rows_sharded(mesh, table: jnp.ndarray, mv: jnp.ndarray,
                           uids: jnp.ndarray, rows: jnp.ndarray,
                           g_rows: jnp.ndarray, count: jnp.ndarray,
                           schedule: Callable, b1: float = 0.9,
                           b2: float = 0.999, eps: float = 1e-8):
    """LazyAdam step for a table row-split over the model axis.

    The union inputs (uids / rows / g_rows) are replicated; the update is
    fully LOCAL per shard — each shard gathers its own moment rows,
    computes the row math (replicated compute over [U, D] is VPU-cheap),
    and drop-scatters only the rows it owns.  No model-axis collective:
    the one exchange already happened in ``collect``."""
    from jax.sharding import PartitionSpec as P

    from ..core.mesh import MODEL_AXIS
    M = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // M
    lr = schedule(count - 1)

    def local(tshard, mvshard, uids_l, rows_l, g_l, lr_l, count_l):
        m = jax.lax.axis_index(MODEL_AXIS)
        rel = uids_l - m * rows_per_shard
        inb = (rel >= 0) & (rel < rows_per_shard)
        safe = jnp.where(inb, rel, 0)
        mvu = jnp.take(mvshard, safe, axis=1)
        p_new, mv_new = _adam_rows_math(rows_l, g_l, mvu, lr_l, count_l,
                                        b1, b2, eps, tshard.dtype)
        # out-of-shard (and sentinel) slots map to row R_shard -> dropped
        tgt = jnp.where(inb, rel, rows_per_shard)
        tshard = tshard.at[tgt].set(p_new, mode="drop")
        mvshard = mvshard.at[:, tgt].set(mv_new, mode="drop")
        return tshard, mvshard

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(None, MODEL_AXIS, None),
                  P(), P(), P(), P(), P()),
        out_specs=(P(MODEL_AXIS, None), P(None, MODEL_AXIS, None)),
    )(table, mv, uids, rows, g_rows, lr, count)


def lazy_adam_rows(table: jnp.ndarray, mv: jnp.ndarray,
                   uids: jnp.ndarray, rows: jnp.ndarray,
                   g_rows: jnp.ndarray, count: jnp.ndarray,
                   schedule: Callable, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8):
    """One LazyAdam step on the touched rows; returns (table, mv) with
    the [U]-row blocks rewritten (sentinel slots dropped).

    Matches optax.scale_by_adam + scale_by_learning_rate math exactly for
    the touched rows: m/v decay + bias correction by the global ``count``.

    ``mv`` holds both Adam moments ROW-stacked FLAT, [2R, Dphys] with
    m = rows [0, R) and v = rows [R, 2R).  History: r2 lane-concatenated
    them ([R, 2D], one 256-lane gather/scatter instead of two 128-lane
    ones — a ~0.25 ms win over separate leaves when both go through
    XLA's scatter, measured 4.08 ms/step in the r4 trace).  r4 flipped
    to row-stacking because the per-row HBM DMA write-back kernel
    (ops/scatter_rows.update_rows) is 128-lane-only on this Mosaic
    (whole-row AND lane-offset slices of a 256-lane memref both fail
    the slice-width check; 3-D indexed row DMA compiles but issues
    12-25x slower — r4 probes), and FLAT because the aliased pallas
    operand must BE the donated param: with a [2, R, D] leaf and a
    merge-reshape in between, XLA copies all 1.28 GB first (measured
    3.90 ms/step as a bare 'tstate..mv' copy op in the r4 trace).  The
    in-step DMA write-back at 2U rows is 1.87 ms.
    """
    # optax.scale_by_schedule evaluates the schedule at the PRE-increment
    # count (0-based step), while ``count`` here is the post-increment
    # update number (bias correction needs it 1-based): without the -1 the
    # lazy tables would cross piecewise-constant LR boundaries one step
    # before the dense params (and before tf.train.piecewise_constant)
    import os
    lr = schedule(count - 1)
    rphys = table.shape[0]
    U = uids.shape[0]
    safe = jnp.minimum(uids, rphys - 1)
    # one gather for both moment blocks: [safe; safe+R] is globally
    # ascending (every m row < R <= every v row); the [2U, D] -> [2, U, D]
    # leading-dim split is layout-free (U % 8 == 0)
    mvu = jnp.take(mv, jnp.concatenate([safe, safe + rphys]), axis=0,
                   indices_are_sorted=True).reshape(2, U, -1)
    # (A fully-fused math+write-back kernel — VERDICT r3 #2a — was built
    # and interpret-verified, but Mosaic rejects row DMA out of tiled
    # VMEM, and once the chunk stages through HBM scratch the kernel is
    # byte-identical to this two-stage path; pruned, see
    # ops/scatter_rows.py graveyard note.)
    p_new, mv_new = _adam_rows_math(rows, g_rows, mvu, lr, count,
                                    b1, b2, eps, table.dtype)
    # Write-back: on TPU, the TABLE rows go through the Pallas per-row
    # HBM->HBM DMA kernel (ops/scatter_rows.update_rows, in-place via
    # input_output_aliases) when its hardware law allows — 32-bit dtype
    # at exactly 128 lanes (f32 packed big tables; bf16 tables and the
    # 256-lane moments CANNOT per-row DMA on this Mosaic, see the
    # update_rows docstring).  XLA's scatter is NOT intrinsically slow —
    # isolated it runs in ~40us — but inside the full step the
    # memory-space-assignment pass stages the update rows in VMEM and
    # the kCustom scatter emitter degrades to ~5.4 ms/step (device
    # traces r1-r4); the DMA kernel measures 1.5 ms standalone at the
    # same U and is immune to MSA's operand placement.  NOTE: the r3
    # ladder's "DMA opt-ins neutral" result was a dead-flag artifact —
    # the old f32-only gate disabled this path entirely under bf16
    # tables, so those A/Bs measured noise.  DMT_DMA_WB=0 restores the
    # XLA scatter.
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu and table.shape[1] == 128 and table.dtype.itemsize == 4
            and os.environ.get("DMT_DMA_WB", "1") == "1"):
        from ..ops.scatter_rows import update_rows
        table = update_rows(table, uids, p_new)
    else:
        # uids is strictly ascending + unique (sentinel tail de-duplicated
        # in collect), so the scatters can skip conflict serialization
        table = table.at[uids].set(p_new, mode="drop",
                                   indices_are_sorted=True,
                                   unique_indices=True)
    # Moments: both row-stacked blocks ride the same 128-lane DMA kernel
    # as ONE call (2U rows, 1.87 ms in-step) — replacing the 4.08 ms XLA
    # scatter of the old lane-concat layout (r4 trace).  m-part sentinel
    # ids must remap OUT of [0, 2R): a raw rphys+k sentinel would land
    # in the v block.  DMT_DMA_MV2=0 restores the XLA scatter.
    rows2 = mv_new.reshape(2 * U, -1)
    real = uids < rphys
    if (on_tpu and mv.shape[1] == 128 and mv.dtype.itemsize == 4
            and os.environ.get("DMT_DMA_MV2", "1") == "1"):
        from ..ops.scatter_rows import update_rows
        twoR = jnp.int32(2 * rphys)
        ids2 = jnp.concatenate([jnp.where(real, uids, twoR),
                                jnp.where(real, uids + rphys, twoR)])
        mv = update_rows(mv, ids2, rows2)
    else:
        # unique sentinel remaps (out of range -> dropped); halves are
        # individually ascending but the concat is not, so no sorted hint
        senm = 2 * rphys + jax.lax.iota(jnp.int32, U)
        ids2 = jnp.concatenate([jnp.where(real, uids, senm),
                                jnp.where(real, uids + rphys, senm + U)])
        mv = mv.at[ids2].set(rows2, mode="drop", unique_indices=True)
    return table, mv
