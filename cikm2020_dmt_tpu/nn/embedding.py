"""Embedding engine: shared tables, pooled lookups, sequence lookups.

Replaces ``tf.nn.embedding_lookup_sparse`` over CPU-pinned variables
(reference model/net/base.py:81-134) with gathers over device-resident
tables.  Tables are plain arrays in the param tree; the sharded (row-split
over the "model" mesh axis) lookup path lives in parallel/embedding_shard.py
and reuses these same pure functions per shard.

Semantics notes vs the reference:

- Tables are shared by *table name within a collection*: the reference's
  variable scoping puts the main tables under ``DnnModel/embedding_trans/``
  and the bias-net tables at ``DnnModel/`` root, so ``Cid2`` (dim 8, main)
  and ``Cid2`` (dim 5, bias) are distinct variables — hence two collections.
- ``zero_pad``: the reference *prepends* a frozen zero row, shifting
  sequence-path indices off by one from the pooled path (SURVEY.md §2.4.7).
  We implement the intent instead: sequence lookups of index 0
  ('unknow'/padding) return zeros; pooled lookups use the trainable row 0.
- Mean pooling divides by the sum of *present* weights, exactly like
  ``embedding_lookup_sparse(combiner="mean")``; empty rows give zeros.
- Timestamp features are log2-bucketed on-device from the raw delta:
  ``bucket = clip(floor(log2(ts)) + 1, 0, table_rows - 1)`` — the
  reference's *intended* semantics (its shipped code vocab-maps the raw
  timestamp first, which degenerates to bucket 0 for all real deltas,
  SURVEY.md §2.4.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import EmbeddingSpec
from .layers import Params, glorot_uniform


def table_init(rng, rows: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    return glorot_uniform()(rng, (rows, dim), dtype)


def pack_factor(dim: int) -> int:
    """How many logical rows share one 128-lane physical row.

    TPU gathers/scatters process whole (8,128) tiles: a 32-wide f32 row
    wastes 3/4 of each transaction.  Packing ``p = 128 // dim`` logical
    rows per physical row measured 15x faster gathers and 6.7x faster
    scatter-adds at identical byte volume (see memory notes)."""
    if 0 < dim < 128 and 128 % dim == 0:
        return 128 // dim
    return 1


def packed_rows(rows: int, dim: int) -> int:
    p = pack_factor(dim)
    return -(-rows // p)


def pack_table(logical: jnp.ndarray) -> jnp.ndarray:
    """[R, d] -> [ceil(R/p), p*d] (row-major regrouping; per-logical-row
    values unchanged, so initialization statistics are identical)."""
    R, d = logical.shape
    p = pack_factor(d)
    if p == 1:
        return logical
    Rp = packed_rows(R, d) * p
    if Rp != R:
        logical = jnp.pad(logical, ((0, Rp - R), (0, 0)))
    return logical.reshape(Rp // p, p * d)


def unpack_table(packed: jnp.ndarray, rows: int, dim: int) -> jnp.ndarray:
    """Inverse of pack_table (a free reshape + slice)."""
    p = pack_factor(dim)
    if p == 1:
        return packed
    return packed.reshape(-1, dim)[:rows]


def collection_init(rng, specs: tuple[EmbeddingSpec, ...], dtype=jnp.float32,
                    packed: bool = False,
                    pack_rows_threshold: int = 0,
                    bf16_rows_threshold: int = 0) -> Params:
    """One table per distinct table name (shared across features).

    ``bf16_rows_threshold`` > 0 stores tables with at least that many
    logical rows in bfloat16 (cfg.table_bf16_threshold): the train step
    is HBM-bound on row gathers, so halving the big tables' bytes halves
    their traffic; update math stays f32 (train/lazy.py)."""
    tables: Params = {}
    names = []
    for spec in specs:
        if spec.table not in tables:
            tables[spec.table] = (spec.id_size, spec.dim)
            names.append(spec.table)
    keys = jax.random.split(rng, max(1, len(names)))
    out: Params = {}
    for i, name in enumerate(names):
        rows, dim = tables[name]
        tdtype = (jnp.bfloat16
                  if 0 < bf16_rows_threshold <= rows else dtype)
        t = table_init(keys[i], rows, dim, tdtype)
        if packed and rows >= pack_rows_threshold:
            t = pack_table(t)
        out[name] = t
    return out


def select_packed(grid128: jnp.ndarray, slot: jnp.ndarray, p: int,
                  dim: int) -> jnp.ndarray:
    """[..., p*d] physical rows + [...] slot -> [..., d] logical rows via a
    one-hot contraction (VPU; avoids per-element dynamic slicing).

    Default is p static lane-slices + masked sum; DMT_PACK_SELECT=einsum
    restores the r2-r3 one-hot einsum (same math).  Rationale: the
    einsum's [..., p, d] reshape of the [N, 128] gather output forces an
    XLA relayout copy pair ({0,1} gather layout -> {1,0,3,2} einsum
    operand, ~1.2 ms/step each way in the r4 traces at the Sku shape);
    lane-slices consume the gather output in its native layout —
    measured 42.2 -> 39.8 ms/step device-op sum on the flagship
    (results/bench_ladder_r4.json)."""
    import os
    if os.environ.get("DMT_PACK_SELECT", "slice") == "slice":
        out = None
        for q in range(p):
            blk = jax.lax.slice_in_dim(grid128, q * dim, (q + 1) * dim,
                                       axis=-1)
            sel = jnp.where((slot == q)[..., None], blk,
                            jnp.zeros((), grid128.dtype))
            out = sel if out is None else out + sel
        return out
    grid = grid128.reshape(*grid128.shape[:-1], p, dim)
    onehot = (slot[..., None]
              == jax.lax.broadcasted_iota(jnp.int32, (*slot.shape, p),
                                          slot.ndim)).astype(grid.dtype)
    return jnp.einsum("...pd,...p->...d", grid, onehot)


def presence_mask(wts: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """[B, L] float mask of present positions from the length vector."""
    L = wts.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, wts.shape, wts.ndim - 1)
    return (pos < lens[..., None]).astype(wts.dtype)


def pooled_lookup(table: jnp.ndarray, ids: jnp.ndarray, wts: jnp.ndarray,
                  lens: jnp.ndarray, combiner: str = "mean") -> jnp.ndarray:
    """Weighted pool over present ids: [B, L] -> [B, D].

    mean: sum_j w_j * E[id_j] / sum_j w_j   (lookup_sparse "mean")
    sum:  sum_j w_j * E[id_j]               (lookup_sparse "sum")
    """
    mask = presence_mask(wts, lens)
    w = wts * mask
    # mode="clip": out-of-range ids clamp (TPU hardware behavior) instead
    # of jnp's default NaN-fill on CPU — keeps lookups total and backends
    # consistent; in-range ids are guaranteed by the vocab layer
    emb = jnp.take(table, ids, axis=0, mode="clip")       # [B, L, D]
    weighted = jnp.einsum("bl,bld->bd", w.astype(emb.dtype), emb)
    if combiner == "sum":
        return weighted
    denom = jnp.sum(w, axis=-1, keepdims=True).astype(emb.dtype)
    return jnp.where(denom > 0, weighted / jnp.maximum(denom, 1e-12), 0.0)


def pooled_from_grid(grid: jnp.ndarray, wts: jnp.ndarray,
                     lens: jnp.ndarray, combiner: str = "mean") -> jnp.ndarray:
    """Weighted pool over an already-gathered embedding grid [B, L, D].

    Identical math to pooled_lookup, minus the gather — used to reuse the
    sequence-path gathers for the pooled combiner so each big-table row is
    fetched (and back-propagated) once per step instead of twice.
    """
    mask = presence_mask(wts, lens)
    w = wts * mask
    weighted = jnp.einsum("bl,bld->bd", w.astype(grid.dtype), grid)
    if combiner == "sum":
        return weighted
    denom = jnp.sum(w, axis=-1, keepdims=True).astype(grid.dtype)
    return jnp.where(denom > 0, weighted / jnp.maximum(denom, 1e-12), 0.0)


def seq_lookup(table: jnp.ndarray, ids: jnp.ndarray, zero_pad: bool) -> jnp.ndarray:
    """Per-position lookup [B, L] -> [B, L, D]; zero_pad zeroes index-0 rows
    (padding / 'unknow') as in the reference transformer path
    (transformer.py:69-73 with base.py:87-89)."""
    emb = jnp.take(table, ids, axis=0, mode="clip")
    if zero_pad:
        emb = jnp.where((ids > 0)[..., None], emb, 0.0)
    return emb


def ts_bucketize(raw_ts: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Raw time-delta -> log2 bucket in [0, num_buckets-1].

    bucket 0 is reserved for ts<=0 / padding; deltas of 2^k land in
    bucket k+1 (clipped), cf. reference transformer.py:87-91.
    """
    safe = jnp.maximum(raw_ts, 1).astype(jnp.float32)
    bucket = jnp.floor(jnp.log2(safe)).astype(jnp.int32) + 1
    bucket = jnp.where(raw_ts <= 0, 0, bucket)
    return jnp.clip(bucket, 0, num_buckets - 1)
