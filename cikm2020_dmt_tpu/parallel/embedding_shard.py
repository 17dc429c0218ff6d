"""Row-sharded embedding engine: explicit shard_map lookups over the model
mesh axis.

The reference keeps its giant id tables (Sku 5M x 32, Shopid 230K x 16,
Brand 190K x 16) on host RAM and pays PCIe per step
(reference model/net/base.py:83 /cpu:0 pinning).  TPU-native design: rows
split over the ``model`` mesh axis; each lookup is

    local masked gather  ->  psum over the model axis

expressed with ``shard_map`` so XLA never all-gathers the table (GSPMD's
default strategy for an unconstrained gather on a sharded operand).  The
pooled path pools *before* the psum, so the collective moves [B, D] bytes
instead of [B, L, D].

The backward pass is automatic: grad of psum is identity per shard, and the
local gather transposes to a scatter-add into the local row range — i.e.
each shard accumulates gradient only for its own rows, which is exactly the
sharded-update we want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import DMTConfig
from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..nn.embedding import pooled_lookup, presence_mask, seq_lookup  # noqa: reused by engines


def should_shard_table(cfg: DMTConfig, mesh: Mesh, rows: int) -> bool:
    """Single source of truth for the row-sharding policy; must agree with
    core.mesh.param_shardings."""
    m = mesh.shape[MODEL_AXIS]
    return m > 1 and rows >= cfg.shard_rows_threshold and rows % m == 0


class EmbeddingEngine:
    """Replicated-table engine: plain gathers (single chip / small tables).

    With a config, gathers on large tables route through ``dedup_take``
    (ops/scatter_rows): identical forward, but the backward sorts +
    segment-sums the cotangent so the serialized TPU scatter-add only
    touches unique rows — a large win on Zipfian ranking traffic
    (measured 19.7x sku duplication per 4096-batch on the JD demo).
    """

    def __init__(self, cfg: DMTConfig | None = None):
        self.cfg = cfg
        # Lazy-Adam overlay, set by the Trainer DURING TRACING of the train
        # step only: table name -> LazyOverlay(uids, rows, ...).  Lookups
        # for an overlaid table route through the gathered unique rows so
        # the gradient stays row-sparse (train/lazy.py).
        self.overlay: dict = {}
        # table name -> (logical_rows, dim, pack_factor) when packing is on
        self._meta: dict[str, tuple[int, int, int]] = {}
        if cfg is not None and cfg.packed_tables:
            from ..nn.embedding import pack_factor
            # bias-net tables are DISTINCT from same-named main tables
            # (different dims — reference variable-scoping effect), so they
            # get a namespaced key; bias_net_apply passes "bias:<table>"
            thr = cfg.pack_rows_threshold
            for spec in cfg.embeddings:
                p = pack_factor(spec.dim) if spec.id_size >= thr else 1
                self._meta.setdefault(spec.table,
                                      (spec.id_size, spec.dim, p))
            for spec in cfg.embeddings_bias:
                p = pack_factor(spec.dim) if spec.id_size >= thr else 1
                self._meta.setdefault("bias:" + spec.table,
                                      (spec.id_size, spec.dim, p))

    def _take_raw(self, table, ids, logical_rows, allow_exact=True,
                  vjp_reduce_axes=()):
        cfg = self.cfg
        if cfg is not None and cfg.dedup_grads:
            if logical_rows >= cfg.dedup_rows_threshold:
                from ..ops.scatter_rows import dedup_take
                return dedup_take(table, ids, cfg.dedup_budget_div,
                                  vjp_reduce_axes)
            if allow_exact and table.shape[0] <= cfg.onehot_bwd_rows_max:
                # not inside shard_map bodies: the custom VJP's cotangent
                # carries different varying-axes typing than the primal
                from ..ops.scatter_rows import take_onehot
                return take_onehot(table, ids,
                                   cfg.onehot_bwd_bf16
                                   and cfg.compute_dtype == "bfloat16")
            if allow_exact and table.shape[0] <= cfg.dedup_exact_rows_max:
                # not inside shard_map bodies (same caveat as above)
                from ..ops.scatter_rows import dedup_take_exact
                return dedup_take_exact(table, ids)
        return jnp.take(table, ids, axis=0, mode="clip")

    def _take(self, name, table, ids):
        ov = self.overlay.get(name)
        if ov is not None:
            from ..train.lazy import overlay_take
            return overlay_take(ov, ids)
        quant = isinstance(table, dict) and "q" in table
        rows_arr = table["q"] if quant else table
        meta = self._meta.get(name)
        if meta is None or meta[2] == 1:
            if quant:
                return self._take_quant(table, ids)
            return self._take_raw(table, ids, rows_arr.shape[0])
        rows, dim, p = meta
        from ..nn.embedding import select_packed
        phys = ids // p
        slot = ids - phys * p
        grid128 = (self._take_quant(table, phys) if quant
                   else self._take_raw(table, phys, rows))
        return select_packed(grid128, slot, p, dim)

    @staticmethod
    def _take_quant(table: dict, ids):
        """Serving-time int8 table {q: int8 [R, D], scale: f32 [R, 1]}:
        gather the quantized rows + per-row scales, dequantize AFTER the
        gather — D + 4 bytes of HBM traffic per row instead of 4D
        (serve/export.quantize_tables).  Forward-only (no custom-VJP
        dedup paths; serving never differentiates)."""
        q = jnp.take(table["q"], ids, axis=0, mode="clip")
        scale = jnp.take(table["scale"], ids, axis=0, mode="clip")
        return q.astype(scale.dtype) * scale

    def pooled(self, name: str, table, ids, wts, lens, combiner="mean"):
        from ..nn.embedding import pooled_from_grid
        return pooled_from_grid(self._take(name, table, ids), wts, lens,
                                combiner)

    def seq(self, name: str, table, ids, zero_pad: bool):
        emb = self._take(name, table, ids)
        if zero_pad:
            emb = jnp.where((ids > 0)[..., None], emb, 0.0)
        return emb


DENSE_ENGINE = EmbeddingEngine()


def shard_take_rows(mesh: Mesh, table, idx, idx_data_sharded: bool = False):
    """Rows of a row-sharded table for explicit indices: masked local
    gather + psum over the model axis.  Out-of-range indices (including
    the lazy-Adam sentinel ids >= R) return the zero row.

    ``idx_data_sharded=False``: ``idx`` is replicated ([U] unique ids for
    the lazy-Adam union, train/lazy.collect) and the result is replicated.
    ``True``: ``idx`` leading axis is split over the data axis (the
    [N]-element overflow fallback) and the result is data-sharded."""
    M = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // M

    def local(tshard, idx_l):
        m = jax.lax.axis_index(MODEL_AXIS)
        rel = idx_l - m * rows_per_shard
        inb = (rel >= 0) & (rel < rows_per_shard)
        rows = jnp.take(tshard, jnp.where(inb, rel, 0), axis=0, mode="clip")
        rows = jnp.where(inb[..., None], rows, 0)
        return jax.lax.psum(rows, MODEL_AXIS)

    ispec = P(DATA_AXIS) if idx_data_sharded else P()
    ospec = P(DATA_AXIS, None) if idx_data_sharded else P(None, None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(MODEL_AXIS, None), ispec),
                         out_specs=ospec)(table, idx)


class ShardedEmbeddingEngine(EmbeddingEngine):
    """Dispatches large tables to shard_map lookups, small ones to the
    replicated path.  Lazy-Adam overlays take priority: an overlaid
    table's lookups slice the union grid at the jit level (the rows were
    already exchanged once in train/lazy.collect), so they must NOT
    re-enter the shard_map lookup path."""

    def __init__(self, cfg: DMTConfig, mesh: Mesh):
        super().__init__(cfg)
        self.mesh = mesh

    def _sharded(self, table) -> bool:
        if isinstance(table, dict):
            return False  # int8 serving tables stay replicated
        return should_shard_table(self.cfg, self.mesh, table.shape[0])

    # -- pooled ---------------------------------------------------------
    def _phys(self, name: str, ids):
        """Logical ids -> (phys ids, slot, p, dim) under packing."""
        meta = self._meta.get(name)
        if meta is None or meta[2] == 1:
            return ids, None, 1, None
        rows, dim, p = meta
        phys = ids // p
        return phys, ids - phys * p, p, dim

    def pooled(self, name: str, table, ids, wts, lens, combiner="mean"):
        if name in self.overlay or not self._sharded(table):
            return super().pooled(name, table, ids, wts, lens, combiner)
        rows_per_shard = table.shape[0] // self.mesh.shape[MODEL_AXIS]
        phys, slot, p, dim = self._phys(name, ids)

        logical_rows = table.shape[0]

        def local(table_shard, ids_l, slot_l, wts_l, lens_l):
            shard = jax.lax.axis_index(MODEL_AXIS)
            lo = shard * rows_per_shard
            rel = ids_l - lo
            in_shard = (rel >= 0) & (rel < rows_per_shard)
            # dedup-gradient gather for the big tables (same policy as the
            # single-chip engine): the backward sorts + segment-sums the
            # cotangent so the serialized scatter-add only touches unique
            # local rows.  vjp_reduce_axes: the table shard is invariant
            # over the data axis, so the custom bwd must hand back the
            # data-psum'd cotangent itself (shard_map custom-VJP typing)
            emb = self._take_raw(table_shard, jnp.where(in_shard, rel, 0),
                                 logical_rows, allow_exact=False,
                                 vjp_reduce_axes=(DATA_AXIS,))
            if p > 1:
                from ..nn.embedding import select_packed
                emb = select_packed(emb, slot_l, p, dim)
            emb = jnp.where(in_shard[..., None], emb, 0.0)     # [b, L, D]
            mask = presence_mask(wts_l, lens_l)
            w = (wts_l * mask).astype(emb.dtype)
            weighted = jnp.einsum("bl,bld->bd", w, emb)
            weighted = jax.lax.psum(weighted, MODEL_AXIS)      # [b, D] only
            if combiner == "sum":
                return weighted
            denom = jnp.sum(w, axis=-1, keepdims=True)
            return jnp.where(denom > 0,
                             weighted / jnp.maximum(denom, 1e-12), 0.0)

        slot_arg = slot if slot is not None else jnp.zeros_like(phys)
        return jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None),
                      P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS, None),
        )(table, phys, slot_arg, wts, lens)

    # -- per-position (sequence) ---------------------------------------
    def seq(self, name: str, table, ids, zero_pad: bool):
        """Sequence lookup on a row-sharded table.

        Default path (``cfg.shard_seq_exchange``): dedup the [b, L] ids,
        bucket the unique ids by owning shard, each shard gathers the
        unique rows it owns, ONE all_gather of [M*C, D] unique rows over
        the model axis, then a local inverse-map gather back to [b, L, D]
        — the BASELINE north-star "exchange looked-up rows" design.  The
        collective moves ~2*(bL/dedup_budget_div)*D bytes instead of the
        full-grid psum's bL*D (a ~dedup_budget_div/2 x reduction; real
        ranking traffic dedups ~19.7x per 4096-batch, so the budget
        holds).  The backward is scatter-free on the grid side
        (ops/scatter_rows.gather_dedup: segment-sum + gathers); only the
        C unique owned rows scatter into the table shard cotangent.

        Budget overflow (unique ids > bL/div, or one shard owning > C
        uniques) falls back to the full-grid psum via lax.cond — the
        predicate is uniform across the model axis because the ids are
        replicated along it, so every shard takes the same branch.
        """
        if name in self.overlay or not self._sharded(table):
            return super().seq(name, table, ids, zero_pad)
        M = self.mesh.shape[MODEL_AXIS]
        data = max(1, self.mesh.shape[DATA_AXIS])
        rows_per_shard = table.shape[0] // M
        phys, slot, p, dim = self._phys(name, ids)
        slot_arg = slot if slot is not None else jnp.zeros_like(phys)

        B, L = ids.shape
        bl = (B // data) * L
        div = max(1, self.cfg.dedup_budget_div)
        U = min(bl, max(256, -(-bl // div)))
        C = -(-2 * U // M)
        C = min(U, ((C + 7) // 8) * 8)
        use_exchange = self.cfg.shard_seq_exchange

        def grid_psum(table_shard, ids_l, slot_l, orig_l):
            shard = jax.lax.axis_index(MODEL_AXIS)
            lo = shard * rows_per_shard
            rel = ids_l - lo
            in_shard = (rel >= 0) & (rel < rows_per_shard)
            if zero_pad:
                in_shard = in_shard & (orig_l > 0)
            emb = jnp.take(table_shard, jnp.where(in_shard, rel, 0), axis=0,
                           mode="clip")
            if p > 1:
                from ..nn.embedding import select_packed
                emb = select_packed(emb, slot_l, p, dim)
            emb = jnp.where(in_shard[..., None], emb, 0.0)
            return jax.lax.psum(emb, MODEL_AXIS)               # [b, L, D]

        def local(table_shard, ids_l, slot_l, orig_l):
            if not use_exchange:
                return grid_psum(table_shard, ids_l, slot_l, orig_l)
            from ..ops.scatter_rows import gather_dedup

            m_idx = jax.lax.axis_index(MODEL_AXIS)
            bshape = ids_l.shape
            flat = ids_l.reshape(-1).astype(jnp.int32)          # [bl]
            n = flat.shape[0]
            R = jnp.int32(M * rows_per_shard)                   # sentinel
            # negative ids -> sentinel: they then sort to the tail, the
            # keep mask zeros them, and o_u/rank arithmetic stays in
            # range — matching grid_psum's in_shard masking (a raw -1
            # would otherwise clip to bucket row 0 and return owner 0's
            # first unique row)
            flat = jnp.where(flat < 0, R, flat)

            order = jnp.argsort(flat)
            s = flat[order]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), s[1:] != s[:-1]])
            seg = (jnp.cumsum(first) - 1).astype(jnp.int32)     # run per elem
            nuniq = seg[-1] + 1
            inv = jnp.zeros((n,), jnp.int32).at[order].set(seg)
            # sorted unique ids compacted into [U] (overflow runs dropped —
            # only reachable when pred is False and the psum branch runs)
            uids = jnp.full((U,), R, jnp.int32).at[
                jnp.where(first, seg, U)].set(
                    jnp.minimum(s, R), mode="drop")
            # searchsorted is safe HERE (and only here): M+1 queries over a
            # [U] sorted array — the vmapped binary-search while-loop it
            # lowers to runs M+1 times, not per-element.  The repo-wide ban
            # (train/lazy.py:12) is on [N]-query searchsorted over big
            # arrays; do NOT copy this call into a per-element path.
            bounds = jnp.searchsorted(
                uids, (jnp.arange(M + 1, dtype=jnp.int32)
                       * rows_per_shard)).astype(jnp.int32)
            counts = jnp.diff(bounds)                           # per owner
            pred = (nuniq <= U) & (counts.max(initial=0) <= C)

            def fast(_):
                # bucket layout [M, C] built with pure gather arithmetic
                j = jnp.arange(M * C, dtype=jnp.int32)
                o = j // C
                r = j - o * C
                src = bounds[o] + r                   # unique slot per row
                valid = r < counts[o]
                bucketed = jnp.where(
                    valid, jnp.take(uids, jnp.minimum(src, U - 1)), R)
                slot_to_run = jnp.where(valid, src, U)
                # serve my bucket: gather the unique rows this shard owns
                my_ids = jax.lax.dynamic_slice(bucketed, (m_idx * C,), (C,))
                rel = my_ids - m_idx * rows_per_shard
                inb = (rel >= 0) & (rel < rows_per_shard)
                rows = jnp.take(table_shard, jnp.where(inb, rel, 0),
                                axis=0, mode="clip")
                rows = jnp.where(inb[:, None], rows, 0)
                allrows = jax.lax.all_gather(
                    rows, MODEL_AXIS, axis=0, tiled=True)      # [M*C, D]
                # inverse map: unique slot -> bucket row
                o_u = jnp.minimum(uids // rows_per_shard, M)
                rank = (jnp.arange(U, dtype=jnp.int32)
                        - bounds[jnp.minimum(o_u, M - 1)])
                bslot = jnp.where(o_u >= M, 0,
                                  jnp.minimum(o_u, M - 1) * C + rank)
                final_idx = jnp.take(bslot, inv)
                emb = gather_dedup(U, allrows, final_idx, order, seg,
                                   slot_to_run).reshape(*bshape, -1)
                if p > 1:
                    from ..nn.embedding import select_packed
                    emb = select_packed(emb, slot_l, p, dim)
                keep = (flat < R).reshape(bshape)   # oversized ids -> 0,
                if zero_pad:                        # matching grid_psum
                    keep = keep & (orig_l > 0)
                return jnp.where(keep[..., None], emb, 0.0)

            return jax.lax.cond(
                pred, fast,
                lambda _: grid_psum(table_shard, ids_l, slot_l, orig_l),
                None)

        # check_vma=False: the fast branch ends in an all_gather (output
        # numerically identical on every model shard) while the psum branch
        # is typed invariant — jax's varying-axes checker can't unify the
        # two cond branches, but both are model-invariant by construction
        # (the ids are replicated along the model axis).
        return jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None),
                      P(DATA_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None, None),
            check_vma=False,
        )(table, phys, slot_arg, ids)


def make_engine(cfg: DMTConfig, mesh: Mesh | None) -> EmbeddingEngine:
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        return ShardedEmbeddingEngine(cfg, mesh)
    return EmbeddingEngine(cfg)
