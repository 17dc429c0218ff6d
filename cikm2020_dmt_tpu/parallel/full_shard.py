"""Full-mesh table sharding: rows split over EVERY device, all_to_all
request/response lookups.

Why: the round-2 design row-splits big tables over the model axis only
and builds the lazy-Adam id union over the GLOBAL batch at the jit level.
Measured on virtual meshes (scripts/scaling_analysis.py), its data-axis
traffic grows ~linearly with the number of data rows (global union sort,
[U_global, D] row exchange, grid permutes), so weak-scaling efficiency
collapses past ~8 chips.  This module is the scalable design SURVEY §2.3
names as the BASELINE north star ("all-to-all / ragged_all_to_all of
looked-up rows"), the same shape production DLRM systems use:

  - a table's rows are sharded over the FLAT (data x model) device axis
    (device k = data_idx * model_size + model_idx owns rows
    [k*R/N, (k+1)*R/N));
  - each DATA row dedups its OWN batch's ids locally (U_local ~
    per-chip-batch / dedup_budget_div — independent of mesh size);
  - unique ids are bucketed by owner and exchanged with ONE all_to_all;
    owners gather their rows and answer with a second all_to_all;
  - the backward pushes [U_local, D] gradient row-blocks to owners the
    same way; each owner sorts + segment-sums the contributions it
    receives and applies LazyAdam locally to its own rows — no dense
    table gradient, no global union, no update-side psum.

Per-chip traffic is therefore O(per-chip batch x D) — FLAT in mesh size —
which is what the >=85% multi-host scaling-efficiency target needs
(results/scaling_analysis_r3.json records the growth law this replaces).

Overflow semantics (documented deviation knobs, same spirit as
train/lazy.py): if any device's unique count exceeds its budget U or any
(requester, owner) bucket exceeds capacity C, the FORWARD falls back to
an exact all_gather+psum fetch (every step pays nothing unless the cond
fires), while the UPDATE always uses the capacity-C buckets — grads of
over-capacity rows are skipped for that step and counted in the
``lazy_overflow`` train-state counter.

Reference parity: this replaces TF1's CPU-pinned giant tables
(reference model/net/base.py:83, run_dnn.py:45-80 in-graph towers) —
the reference has no multi-host story at all for its 5M-row Sku table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import DMTConfig
from ..core.mesh import DATA_AXIS, MODEL_AXIS

AXES = (DATA_AXIS, MODEL_AXIS)


def mesh_devices(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]


def fms_table_rows(cfg: DMTConfig, n_dev: int) -> dict[str, int]:
    """table name -> PHYSICAL row count for every table that shards over
    the full mesh.  Must stay in lockstep with core.mesh.param_shardings
    (which shards by leaf shape) and train/lazy.build_lazy_plan (which
    plans the update) — all three consult this function.

    Gates mirror the lazy plan (full-mesh tables are always lazy-managed:
    their update path IS the all_to_all grad push): lazy adam on, plain
    adam, no embedding L2 into the tables, no ts features (re-bucketized
    ids), size above both thresholds, rows divisible by the device count.
    """
    if not (cfg.full_mesh_tables and cfg.lazy_adam
            and cfg.optimizer.lower() == "adam" and cfg.wnd_wd <= 1e-5
            and n_dev > 1):
        return {}
    from ..nn.embedding import pack_factor
    ts_feats = frozenset(cfg.attention_ts)
    by_table: dict[str, list] = {}
    for spec in cfg.embeddings:
        by_table.setdefault(spec.table, []).append(spec)
    out: dict[str, int] = {}
    for tname, specs in by_table.items():
        rows = max(s.id_size for s in specs)
        if rows < cfg.dedup_rows_threshold:
            continue
        if any(s.feature in ts_feats for s in specs):
            continue
        first = specs[0]
        p = (pack_factor(first.dim)
             if cfg.packed_tables and first.id_size >= cfg.pack_rows_threshold
             else 1)
        rphys = -(-rows // p)
        if rphys >= cfg.shard_rows_threshold and rphys % n_dev == 0:
            out[tname] = rphys
    return out


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _dedup_sorted(phys: jnp.ndarray, U: int, rphys: int):
    """Local sort-based dedup (the collect() math, per device): returns
    (uids [U] strictly-ascending unique w/ rphys+iota sentinel tail,
    pos [n] slot per element (U = overflow), order, seg_sorted,
    overflow scalar)."""
    n = phys.shape[0]
    iota = jax.lax.iota(jnp.int32, n)
    s, order = jax.lax.sort((phys, iota), num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    seg = (jnp.cumsum(first) - 1).astype(jnp.int32)
    uids = jnp.sort(jnp.where(first, s, jnp.int32(rphys)))[:U]
    uids = jnp.where(uids >= rphys, rphys + jax.lax.iota(jnp.int32, U), uids)
    seg_ext = jnp.where(seg < U, seg, jnp.int32(U))
    _, pos = jax.lax.sort((order, seg_ext), num_keys=1)
    nuniq = jnp.sum(first.astype(jnp.int32))
    overflow = jnp.maximum(nuniq - jnp.int32(U), 0)
    return uids, pos, order, seg_ext, overflow


def _owner_layout(uids: jnp.ndarray, U: int, C: int, n_dev: int,
                  rows_per_dev: int, rphys: int):
    """Bucket the sorted unique ids by owning device.

    Returns (bucketed [n_dev*C] ids with rphys no-request sentinel,
    bslot [U] bucket position per unique slot (n_dev*C = unbucketed),
    counts [n_dev], capacity_drop scalar)."""
    # owner segments are contiguous because uids is sorted; n_dev+1-query
    # searchsorted is safe (see the repo searchsorted law, train/lazy.py)
    bounds = jnp.searchsorted(
        uids, (jnp.arange(n_dev + 1, dtype=jnp.int32)
               * rows_per_dev)).astype(jnp.int32)
    counts = jnp.diff(bounds)
    j = jnp.arange(n_dev * C, dtype=jnp.int32)
    o = j // C
    r = j - o * C
    src = bounds[o] + r
    valid = r < jnp.minimum(counts[o], C)
    bucketed = jnp.where(valid, jnp.take(uids, jnp.minimum(src, U - 1)),
                         jnp.int32(rphys))
    o_u = jnp.minimum(uids // rows_per_dev, jnp.int32(n_dev))
    rank = jnp.arange(U, dtype=jnp.int32) - bounds[jnp.minimum(o_u, n_dev - 1)]
    in_bucket = (o_u < n_dev) & (rank < C)
    bslot = jnp.where(in_bucket, jnp.minimum(o_u, n_dev - 1) * C + rank,
                      jnp.int32(n_dev * C))
    capacity_drop = jnp.sum(jnp.maximum(counts - C, 0))
    return bucketed, bslot, counts, capacity_drop


def capacity(U: int, n_dev: int) -> int:
    """Per-(requester, owner) bucket capacity: 2x the uniform share plus
    slack for skewed ownership (hot Zipf rows cluster in id space when the
    vocab is frequency-ordered).  Overflow falls back / skips grads and is
    counted — raise via DMT_FMS_CAP_MULT if the counter fires in
    production."""
    import os
    mult = float(os.environ.get("DMT_FMS_CAP_MULT", "2.0"))
    return min(U, _round8(int(mult * U / n_dev) + 128))


def collect_fms(spec, batch: dict, table: jnp.ndarray, mesh: Mesh,
                budget_div: int):
    """Per-data-shard union + all_to_all row fetch for a full-mesh table.

    Returns a train/lazy.LazyCollection whose arrays are jit-level but
    DATA-SHARD-MAJOR: uids/rows are [data*U(, Dp)] with P(data), pos/
    order/seg are [data*n_l] with P(data), offsets hold LOCAL per-shard
    (offset, numel).  ``ok`` (all-devices predicate) rides in .overflow's
    companion; overflow is the summed per-device count.
    """
    from ..data.pipeline import IDS
    from ..train.lazy import LazyCollection

    d_sz = mesh.shape[DATA_AXIS]
    m_sz = mesh.shape[MODEL_AXIS]
    n_dev = d_sz * m_sz
    rphys = table.shape[0]
    rows_per_dev = rphys // n_dev
    p = spec.pack

    arrs, offsets, off = [], {}, 0
    for feature, _ in spec.fields:
        arr = batch[feature + IDS]
        numel_l = arr.shape[0] // d_sz
        for dim in arr.shape[1:]:
            numel_l *= dim
        offsets[id(arr)] = (off, numel_l)     # LOCAL per-shard offsets
        off += numel_l
        arrs.append(arr)
    n_l = off
    U = _round8(max(256, n_l // max(1, budget_div)))
    C = capacity(U, n_dev)

    def body(tshard, *site_arrays):
        flat = jnp.concatenate(
            [a.reshape(-1).astype(jnp.int32) for a in site_arrays])
        phys = flat // p if p > 1 else flat
        phys = jnp.clip(phys, 0, rphys - 1)
        uids, pos, order, seg, overflow = _dedup_sorted(phys, U, rphys)
        sliced = m_sz > 1 and U % m_sz == 0
        if sliced:
            mrank = jax.lax.axis_index(MODEL_AXIS)
            Um = U // m_sz
            Cm = capacity(Um, n_dev)
            # slice (q, j) of reshape(U//m, m) == uids[q*m + j]
            uids_j = jax.lax.dynamic_index_in_dim(
                uids.reshape(Um, m_sz), mrank, axis=1, keepdims=False)
            bktj, bslotj, _, cap_drop = _owner_layout(
                uids_j, Um, Cm, n_dev, rows_per_dev, rphys)
        else:
            bucketed, bslot, counts, cap_drop = _owner_layout(
                uids, U, C, n_dev, rows_per_dev, rphys)
        me = (jax.lax.axis_index(DATA_AXIS) * m_sz
              + jax.lax.axis_index(MODEL_AXIS))
        my_lo = me * rows_per_dev
        bad = jnp.maximum(overflow, cap_drop)
        nbad = jax.lax.psum(jnp.minimum(bad, 1), AXES)

        def fast(_):
            # Model-peer request sharding: every model peer of a data
            # shard holds IDENTICAL uids (the batch is P(data)-sharded),
            # so a naive exchange ships each data row's requests and
            # responses m_sz times over the wire.  Instead peer j
            # requests only the strided slice uids[j::m_sz] (strided
            # keeps each slice's owner distribution uniform — a
            # contiguous slice would concentrate on few owners and blow
            # the bucket capacity) with m_sz-fold smaller buffers, and
            # the [U, Dp] row grid reassembles with ONE model-axis psum
            # (ICI).  DCN-crossing request/response all_to_all bytes
            # drop ~m_sz-fold (4x at the production 2d m=4 mesh); on a
            # single-host ICI mesh the a2a-vs-psum trade is neutral.
            if sliced:
                req = jax.lax.all_to_all(
                    bktj.reshape(n_dev, Cm), AXES, 0, 0, tiled=True)
                rel = req.reshape(-1) - my_lo
                inb = (rel >= 0) & (rel < rows_per_dev)
                rows = jnp.take(tshard, jnp.where(inb, rel, 0), axis=0,
                                mode="clip")
                rows = jnp.where(inb[:, None], rows, 0)
                resp = jax.lax.all_to_all(
                    rows.reshape(n_dev, Cm, -1), AXES, 0, 0, tiled=True)
                resp_flat = jnp.concatenate(
                    [resp.reshape(n_dev * Cm, -1),
                     jnp.zeros((1, tshard.shape[1]), tshard.dtype)])
                rows_j = jnp.take(resp_flat, jnp.minimum(bslotj, n_dev * Cm),
                                  axis=0)                     # [U/m, Dp]
                grid3 = jax.lax.dynamic_update_slice_in_dim(
                    jnp.zeros((Um, m_sz, tshard.shape[1]), tshard.dtype),
                    rows_j[:, None, :], mrank, axis=1)
                return jax.lax.psum(grid3, MODEL_AXIS).reshape(U, -1)
            req = jax.lax.all_to_all(
                bucketed.reshape(n_dev, C), AXES, 0, 0, tiled=True)
            rel = req.reshape(-1) - my_lo
            inb = (rel >= 0) & (rel < rows_per_dev)
            rows = jnp.take(tshard, jnp.where(inb, rel, 0), axis=0,
                            mode="clip")
            rows = jnp.where(inb[:, None], rows, 0)
            resp = jax.lax.all_to_all(
                rows.reshape(n_dev, C, -1), AXES, 0, 0, tiled=True)
            resp_flat = jnp.concatenate(
                [resp.reshape(n_dev * C, -1),
                 jnp.zeros((1, tshard.shape[1]), tshard.dtype)])
            return jnp.take(resp_flat, jnp.minimum(bslot, n_dev * C),
                            axis=0)

        def slow(_):
            # exact fallback: serve every device's unique list (psum is
            # correct because out-of-shard contributions are zero)
            ag = jax.lax.all_gather(uids, AXES, tiled=False)  # [n_dev, U]
            agf = ag.reshape(-1)
            rel = agf - my_lo
            inb = (rel >= 0) & (rel < rows_per_dev)
            rows = jnp.take(tshard, jnp.where(inb, rel, 0), axis=0,
                            mode="clip")
            rows = jnp.where(inb[:, None], rows, 0)
            rows = jax.lax.psum(rows.reshape(n_dev, U, -1), AXES)
            return jax.lax.dynamic_index_in_dim(rows, me, axis=0,
                                                keepdims=False)

        rows_u = jax.lax.cond(nbad == 0, fast, slow, None)
        return (uids, rows_u, pos, order, seg,
                (overflow + cap_drop).reshape(1))

    site_specs = tuple(P(DATA_AXIS) if a.ndim == 1 else P(DATA_AXIS, None)
                       for a in arrs)
    uids, rows, pos, order, seg, overflow = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXES, None),) + site_specs,
        out_specs=(P(DATA_AXIS), P(DATA_AXIS, None), P(DATA_AXIS),
                   P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )(table, *arrs)
    return LazyCollection(uids, pos, rows, offsets, rphys,
                          jnp.sum(overflow), order, seg, None)


def overlay_grid_fms(mesh: Mesh, rows_diff: jnp.ndarray, col) -> jnp.ndarray:
    """Differentiable union grid, built per data shard: grid row i of
    shard d is the row for that shard's i-th union element.  The backward
    is the per-shard segment-sum of take_rows_sparse_sorted — entirely
    local (no collective: rows_diff is data-varying)."""
    from ..ops.scatter_rows import take_rows_sparse_sorted

    def body(rows_l, pos_l, order_l, seg_l):
        rows_ext = jnp.concatenate(
            [rows_l, jnp.zeros((1, rows_l.shape[1]), rows_l.dtype)])
        return take_rows_sparse_sorted(rows_ext, pos_l, order_l, seg_l)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )(rows_diff, col.pos, col.order, col.seg_sorted)


def fms_adam_update(mesh: Mesh, table: jnp.ndarray, mv: jnp.ndarray,
                    uids: jnp.ndarray, g_rows: jnp.ndarray,
                    count: jnp.ndarray, schedule, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8,
                    grad_bf16: bool = False):
    """LazyAdam for a full-mesh table: push [U_local, D] grad blocks to
    their owning devices with one all_to_all, segment-sum the received
    contributions, update owned rows locally.  Rows touched by several
    data shards get ONE Adam step on the summed gradient — identical to
    the global-union semantics (train/lazy.lazy_adam_rows).

    Model peers hold identical replicas of their data row's grads, so
    (like the collect-side request sharding) peer j pushes only the
    strided slice uids[j::m_sz] with m_sz-fold smaller buffers — the
    DCN-crossing push bytes are paid once per data row, spread evenly
    over the host's NICs.  Capacity-dropped rows skip their gradient for
    the step (counted upstream in collect)."""
    from ..train.lazy import _adam_rows_math

    d_sz = mesh.shape[DATA_AXIS]
    m_sz = mesh.shape[MODEL_AXIS]
    n_dev = d_sz * m_sz
    rphys = table.shape[0]
    rows_per_dev = rphys // n_dev
    U = uids.shape[0] // d_sz
    sliced = m_sz > 1 and U % m_sz == 0
    Um = U // m_sz if sliced else U
    C = capacity(Um, n_dev)
    NC = n_dev * C
    lr = schedule(count - 1)

    def body(tshard, mvshard, uids_l, g_l, lr_l, count_l):
        me = (jax.lax.axis_index(DATA_AXIS) * m_sz
              + jax.lax.axis_index(MODEL_AXIS))
        my_lo = me * rows_per_dev
        if sliced:
            mrank = jax.lax.axis_index(MODEL_AXIS)
            uids_s = jax.lax.dynamic_index_in_dim(
                uids_l.reshape(Um, m_sz), mrank, axis=1, keepdims=False)
            g_s = jax.lax.dynamic_index_in_dim(
                g_l.reshape(Um, m_sz, -1), mrank, axis=1, keepdims=False)
            dup = jnp.bool_(False)
        else:
            uids_s, g_s = uids_l, g_l
            # one grad copy per data row: model peers > 0 send no-requests
            dup = jax.lax.axis_index(MODEL_AXIS) > 0
        bucketed, bslot, counts, _ = _owner_layout(
            uids_s, Um, C, n_dev, rows_per_dev, rphys)
        bucketed = jnp.where(dup, jnp.int32(rphys), bucketed)
        # bucket slot (o, r) holds unique index bounds[o] + r (the
        # _owner_layout construction), so its grad row is
        # g_s[bounds[o] + r] — direct arithmetic, no per-element search
        bounds = jnp.searchsorted(
            uids_s, (jnp.arange(n_dev + 1, dtype=jnp.int32)
                     * rows_per_dev)).astype(jnp.int32)
        j = jnp.arange(NC, dtype=jnp.int32)
        o = j // C
        r = j - o * C
        src = jnp.minimum(bounds[o] + r, Um - 1)
        valid = (r < jnp.minimum(counts[o], C)) & ~dup
        g_send = jnp.where(valid[:, None], jnp.take(g_s, src, axis=0), 0)
        if grad_bf16:
            # cfg.fms_grad_bf16: halve the DCN-dominant push bytes; the
            # receive side still accumulates in f32 (segment_sum below)
            g_send = g_send.astype(jnp.bfloat16)

        req_ids = jax.lax.all_to_all(
            bucketed.reshape(n_dev, C), AXES, 0, 0, tiled=True).reshape(-1)
        req_g = jax.lax.all_to_all(
            g_send.reshape(n_dev, C, -1), AXES, 0, 0,
            tiled=True).reshape(NC, -1)

        rel = req_ids - my_lo
        inb = (rel >= 0) & (rel < rows_per_dev)
        key = jnp.where(inb, rel, jnp.int32(rows_per_dev))
        iota = jax.lax.iota(jnp.int32, NC)
        skey, sidx = jax.lax.sort((key, iota), num_keys=1)
        g_sorted = jnp.take(req_g, sidx, axis=0)
        first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        seg = (jnp.cumsum(first) - 1).astype(jnp.int32)
        # f32 accumulation even for bf16-pushed grads (grad_bf16)
        gsum = jax.ops.segment_sum(g_sorted.astype(jnp.float32), seg,
                                   num_segments=NC)
        uniq_rel = jnp.sort(jnp.where(first, skey, jnp.int32(rows_per_dev)))
        # strictly-unique sentinel tail (scatter hint requirement)
        uniq_rel = jnp.where(uniq_rel >= rows_per_dev,
                             rows_per_dev + jax.lax.iota(jnp.int32, NC),
                             uniq_rel)
        safe = jnp.minimum(uniq_rel, rows_per_dev - 1)
        rows_cur = jnp.take(tshard, safe, axis=0,
                            indices_are_sorted=True)
        mv_cur = jnp.take(mvshard, safe, axis=1, indices_are_sorted=True)
        p_new, mv_new = _adam_rows_math(rows_cur, gsum, mv_cur, lr_l,
                                        count_l, b1, b2, eps, tshard.dtype)
        tshard = tshard.at[uniq_rel].set(
            p_new, mode="drop", indices_are_sorted=True, unique_indices=True)
        mvshard = mvshard.at[:, uniq_rel].set(
            mv_new, mode="drop", indices_are_sorted=True, unique_indices=True)
        return tshard, mvshard

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXES, None), P(None, AXES, None), P(DATA_AXIS),
                  P(DATA_AXIS, None), P(), P()),
        out_specs=(P(AXES, None), P(None, AXES, None)),
        check_vma=False,
    )(table, mv, uids, g_rows, lr, count)
