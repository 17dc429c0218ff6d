"""Training runtime: jitted train step over the device mesh + chief loop.

TPU-native replacement for the reference's multi-tower session loop
(reference run_dnn.py:111-388): one jit-compiled train step with sharding
annotations instead of N cloned subgraphs; gradient all-reduce over the
mesh's data axis is inserted by XLA GSPMD (the reference's in-graph
``average_gradients`` sync point, run_dnn.py:45-80,203).

Checkpoint cadence, DONE markers, stdout metric lines, and result-file
appends preserve the reference's chief/evaluator filesystem protocol.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import CheckpointManager
from ..core.config import DMTConfig
from ..core.logging import (SummaryWriter, Throughput, log_line,
                            log_to_file)
from ..core.mesh import batch_sharding, build_mesh, param_shardings, replicated
from ..data.pipeline import Batch, batch_stream, prefetch
from ..data.schema import FeatureSchema
from ..metrics.streaming import (task_metrics_init, task_metrics_update,
                                 task_metrics_values)
from ..models.zoo import BaseModel, build_model
from .losses import (l2_regularization, multi_task_loss,
                     multi_task_unbias_loss, scores_from_logits,
                     single_task_loss, single_task_unbias_loss)
from .optim import make_optimizer

def make_input_stream(cfg, path_spec, batch_size, **kw):
    """Native C++ pipeline when the toolchain can build it, else the pure
    python fallback (identical batches, tests/test_native.py)."""
    try:
        from ..data.native import load_library, native_batch_stream
        load_library()  # eager: generator bodies defer errors otherwise
        return native_batch_stream(cfg, path_spec, batch_size, **kw)
    except Exception as e:  # g++ missing / build failure
        log_line(f"native data path unavailable ({e!r}); python fallback")
        kw.pop("with_headers", None)  # native-only knob
        return batch_stream(cfg, path_spec, batch_size, **kw)


def make_loss_fn(cfg: DMTConfig, model: BaseModel):
    """Loss dispatch by model family (reference run_dnn.py:155-175)."""

    def loss_fn(params, mstate, batch, rng):
        out, new_state = model.apply(params, mstate, batch, train=True, rng=rng)
        uncertainty = params.get("uncertainty") if isinstance(params, dict) else None
        if cfg.is_unbias_model and model.num_tasks == 2:
            loss = multi_task_unbias_loss(cfg, out, batch["mask"], uncertainty)
        elif cfg.is_unbias_model:
            loss = single_task_unbias_loss(cfg, out, batch["mask"],
                                           batch["label"], train=True)
        elif model.num_tasks == 2:
            sw = batch["propensity_weight_mul"] if cfg.propensity_em else None
            loss = multi_task_loss(cfg, out, batch["mask"], uncertainty,
                                   sample_weight=sw)
        else:
            loss = single_task_loss(cfg, out, batch["mask"], batch["label"],
                                    train=True)
        if cfg.wnd_wd > 1e-5:  # reference gate (run_dnn.py:174)
            loss = loss + l2_regularization(cfg, params, batch)
        return loss, (out, new_state)

    return loss_fn


def _lazy_step(trainer: "Trainer", tstate: dict, batch: dict, rng):
    """Train-step body when lazy Adam covers the big tables (train/lazy.py).

    The big tables never enter the differentiated tree: the loss sees
    their batch-touched rows (gathered once per step) as the diff leaf,
    optax updates only the dense remainder, and LazyAdam rewrites the
    touched rows of param/m/v in place (donated buffers)."""
    import optax as _optax

    from ..parallel.full_shard import collect_fms, fms_adam_update
    from .lazy import collect, lazy_adam_rows, lazy_adam_rows_sharded, \
        make_overlay

    cfg = trainer.cfg
    engine = trainer.model.engine
    mesh = trainer.mesh
    params = tstate["params"]
    cols = {t.name: (collect_fms(t, batch, params["emb"][t.name], mesh,
                                 cfg.dedup_budget_div) if t.full_mesh
                     else collect(t, batch, params["emb"][t.name],
                                  cfg.dedup_budget_div, mesh=mesh))
            for t in trainer.lazy_plan}
    # grid_bf16 (or DMT_GRID_BF16=1 A/B): f32 tables + bf16 union grid —
    # the [N, D] grid (where the step's HBM bytes are) rounds to bf16
    # right after the [U, D] gather, while the table keeps the 32-bit
    # 128-lane layout the per-row DMA write-back requires.  ONLY the
    # diff leaf (the grid source) is cast; lazy_adam_rows still reads
    # the true f32 c.rows, so param precision never round-trips bf16.
    import os as _os
    hybrid = cfg.grid_bf16 or _os.environ.get("DMT_GRID_BF16", "0") == "1"
    rows = {name: (c.rows.astype(jnp.bfloat16)
                   if hybrid and c.rows.dtype == jnp.float32 else c.rows)
            for name, c in cols.items()}
    dense = trainer._dense_params(params)

    def lazy_loss(diff, mstate, batch, rng):
        dense_p, rows_d = diff
        full = dict(dense_p)
        full["emb"] = dict(dense_p["emb"])
        for t in trainer.lazy_plan:
            full["emb"][t.name] = jax.lax.stop_gradient(
                params["emb"][t.name])
        engine.overlay = {
            t.name: make_overlay(
                t, cols[t.name], rows_d[t.name],
                table=(params["emb"][t.name]
                       if cfg.lazy_overflow_exact else None),
                mesh=mesh)
            for t in trainer.lazy_plan}
        try:
            return trainer.loss_fn(full, mstate, batch, rng)
        finally:
            engine.overlay = {}

    (loss, (out, mstate)), (g_dense, g_rows) = jax.value_and_grad(
        lazy_loss, has_aux=True)((dense, rows),
                                 tstate["model_state"], batch, rng)
    updates, opt_state = trainer.optimizer.update(
        g_dense, tstate["opt_state"], dense)
    new_dense = _optax.apply_updates(dense, updates)
    new_params = dict(new_dense)
    new_params["emb"] = dict(new_dense["emb"])
    count = tstate["step"] + 1
    lazy_opt = {}
    for t in trainer.lazy_plan:
        c = cols[t.name]
        if t.full_mesh:
            tab, mv = fms_adam_update(
                mesh, params["emb"][t.name],
                tstate["lazy_opt"][t.name]["mv"], c.uids,
                g_rows[t.name], count, trainer._schedule,
                grad_bf16=trainer.cfg.fms_grad_bf16)
            new_params["emb"][t.name] = tab
            lazy_opt[t.name] = {"mv": mv}
            continue
        update = (lazy_adam_rows_sharded if t.sharded
                  else lazy_adam_rows)
        args = (mesh,) if t.sharded else ()
        tab, mv = update(
            *args, params["emb"][t.name], tstate["lazy_opt"][t.name]["mv"],
            c.uids, c.rows, g_rows[t.name], count, trainer._schedule)
        new_params["emb"][t.name] = tab
        lazy_opt[t.name] = {"mv": mv}
    new_tstate = {
        "params": new_params,
        "model_state": mstate,
        "opt_state": opt_state,
        "step": count,
        "lazy_opt": lazy_opt,
        # cumulative count of unique ids past the dedup budget (gradient
        # skipped for the step; forward stays exact under the default
        # lazy_overflow_exact fallback); persistently nonzero means raise
        # dedup_budget_div's denominator margin — see train/lazy.py
        "lazy_overflow": tstate["lazy_overflow"] + sum(
            c.overflow for c in cols.values()),
    }
    return new_tstate, loss, out


class Trainer:
    def __init__(self, cfg: DMTConfig, model: Optional[BaseModel] = None,
                 mesh=None):
        self.cfg = cfg
        self.schema = FeatureSchema.from_config(cfg)
        self.model = model or build_model(cfg, self.schema)
        self.mesh = mesh if mesh is not None else build_mesh(cfg)
        # swap in shard_map-based lookups when the mesh has a model axis
        from ..parallel.embedding_shard import make_engine
        self.model.engine = make_engine(cfg, self.mesh)
        self.optimizer = make_optimizer(cfg)
        # lazy (row-sparse) Adam plan for the big tables (train/lazy.py);
        # empty unless single-device adam with no embedding L2
        from .lazy import build_lazy_plan
        from .optim import piecewise_constant
        self.lazy_plan = build_lazy_plan(cfg, self.mesh, self.model.engine)
        if cfg.table_bf16_threshold > 0:
            # bf16 tables outside the lazy plan fall to the dense optax
            # path, where bf16 `param += tiny update` flushes small steps
            lazy_names = {t.name for t in self.lazy_plan}
            # size each table the way collection_init does: first spec wins
            sizes: dict = {}
            for s in cfg.embeddings:
                sizes.setdefault(s.table, s.id_size)
            loose = {t for t, rows in sizes.items()
                     if rows >= cfg.table_bf16_threshold
                     and t not in lazy_names}
            if loose and cfg.optimizer.lower() != "adam":
                # adam routes through train/optim.f32_math (f32 moments
                # + f32 update arithmetic, one bf16 rounding at the
                # param write — the lazy path's contract); the other
                # optimizers keep low-precision state for bf16 params
                log_line(f"WARNING: bf16 tables {sorted(loose)} use the "
                         f"dense {cfg.optimizer} path with bf16 "
                         "optimizer state; small updates may round to "
                         "zero (pair table_bf16_threshold with "
                         "lazy_adam, or use adam)")
        self._schedule = piecewise_constant(cfg.step_boundary,
                                            cfg.learning_rate)
        self.loss_fn = make_loss_fn(cfg, self.model)
        self.ckpt = CheckpointManager(cfg.model_path)
        self._compiled = None
        self._pack_layout = None

    # ------------------------------------------------------------------
    def _dense_params(self, params: dict) -> dict:
        """Params minus the lazily-updated tables (what optax sees)."""
        if not self.lazy_plan:
            return params
        lazy_names = {t.name for t in self.lazy_plan}
        out = dict(params)
        out["emb"] = {k: v for k, v in params["emb"].items()
                      if k not in lazy_names}
        return out

    def init_state(self, rng: Optional[jax.Array] = None) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        params, mstate = self.model.init(rng)
        opt_state = self.optimizer.init(self._dense_params(params))
        state = {
            "params": params,
            "model_state": mstate,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }
        if self.lazy_plan:
            # moments for the lazy tables live outside optax, full-shape so
            # untouched rows keep state across steps (LazyAdam semantics);
            # m and v ROW-stacked.  PLAIN-flavor tables store them FLAT as
            # [2R, D] (m = rows [0,R), v = rows [R,2R)) so the write-back
            # DMA kernel aliases the param directly — any reshape between
            # the donated param and the pallas aliased operand makes XLA
            # copy all 1.28 GB first (measured 3.90 ms/step, r4 trace),
            # and 3-D indexed row DMA issues 12-25x slower (probe).
            # Sharded/full-mesh tables keep [2, R, D] (dim 1 = table rows
            # carries the row sharding; their write-backs are XLA
            # scatters inside shard_map).  Moments stay f32 even for
            # bf16 tables (table_bf16_threshold): v accumulates tiny
            # squared gradients that bf16 would flush.
            state["lazy_opt"] = {
                t.name: {"mv": jnp.zeros(
                    (2, params["emb"][t.name].shape[0],
                     params["emb"][t.name].shape[1]) if
                    (t.sharded or t.full_mesh) else
                    (2 * params["emb"][t.name].shape[0],
                     params["emb"][t.name].shape[1]),
                    jnp.float32)}
                for t in self.lazy_plan}
            state["lazy_overflow"] = jnp.zeros((), jnp.int32)
        return state

    def shard_state(self, tstate: dict) -> dict:
        """Place params per the mesh sharding policy (large tables row-split
        over the model axis); optimizer moments mirror their params."""
        psh = param_shardings(self.cfg, tstate["params"], self.mesh)
        rep = replicated(self.mesh)

        def put_like(tree, shardings):
            return jax.tree_util.tree_map(jax.device_put, tree, shardings)

        out = dict(tstate)
        out["params"] = put_like(tstate["params"], psh)

        # mirror: map each opt-state leaf to the sharding of the param with
        # identical shape when unique, else replicate
        shape_to_sh = {}
        for leaf, sh in zip(jax.tree_util.tree_leaves(tstate["params"]),
                            jax.tree_util.tree_leaves(psh)):
            key = (leaf.shape, leaf.dtype.name if hasattr(leaf, "dtype") else None)
            shape_to_sh.setdefault(key, sh)

        def put_opt(leaf):
            if hasattr(leaf, "shape"):
                sh = shape_to_sh.get(
                    (leaf.shape, leaf.dtype.name if hasattr(leaf, "dtype") else None))
                return jax.device_put(leaf, sh if sh is not None else rep)
            return leaf

        out["opt_state"] = jax.tree_util.tree_map(put_opt, tstate["opt_state"])
        if "lazy_opt" in tstate:
            # lazy moments are row-stacked so the shape-match heuristic
            # misses them: mirror the table's sharding explicitly.  Flat
            # [2R, D] (plain flavor) reuses the table spec verbatim (its
            # rows are unsharded by definition); [2, R, D] (sharded /
            # full-mesh) shifts it one dim right (dim 1 = table rows)
            from jax.sharding import NamedSharding, PartitionSpec
            out["lazy_opt"] = {
                name: {"mv": jax.device_put(
                    sub["mv"],
                    NamedSharding(self.mesh, psh["emb"][name].spec
                                  if sub["mv"].ndim == 2 else
                                  PartitionSpec(
                                      None, *psh["emb"][name].spec)))}
                for name, sub in tstate["lazy_opt"].items()}
        if "lazy_overflow" in tstate:
            out["lazy_overflow"] = jax.device_put(tstate["lazy_overflow"],
                                                  rep)
        out["model_state"] = put_like(
            tstate["model_state"],
            jax.tree_util.tree_map(lambda _: rep, tstate["model_state"]))
        out["step"] = jax.device_put(tstate["step"], rep)
        return out

    # ------------------------------------------------------------------
    def _train_step(self):
        if self._compiled is not None:
            return self._compiled
        optimizer = self.optimizer
        cfg = self.cfg
        loss_fn = self.loss_fn
        trainer = self

        def step_fn(tstate, metrics, batch, rng):
            if any(k.startswith("__packed_") for k in batch):
                batch = Trainer.unpack_device_batch(batch,
                                                    trainer._pack_layout)
            if trainer.lazy_plan:
                new_tstate, loss, out = _lazy_step(
                    trainer, tstate, batch, rng)
            else:
                (loss, (out, mstate)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        tstate["params"], tstate["model_state"], batch, rng)
                updates, opt_state = optimizer.update(
                    grads, tstate["opt_state"], tstate["params"])
                params = optax.apply_updates(tstate["params"], updates)
                new_tstate = {
                    "params": params,
                    "model_state": mstate,
                    "opt_state": opt_state,
                    "step": tstate["step"] + 1,
                }
            p_ctr, p_cvr = scores_from_logits(cfg, out)
            metrics = task_metrics_update(
                metrics, mask=batch["mask"], p_ctr=p_ctr, p_cvr=p_cvr,
                loss=loss, weights=batch["valid"])
            return new_tstate, metrics, loss

        self._compiled = jax.jit(step_fn, donate_argnums=(0, 1))
        return self._compiled

    def device_batch(self, batch: Batch) -> dict:
        """Host batch -> device arrays.

        Packed mode (cfg.packed_transfer, default on): the ~40 per-field
        arrays concatenate into ONE [b, F] f32 and ONE [b, I] i32 buffer so
        the host->device path pays 2 transfer setups instead of ~40 (the
        measured e2e bottleneck on links with per-transfer overhead); the
        jitted step slices the fields back out, which XLA fuses into the
        consumers.  Axis-1 concat keeps dim 0 = batch, so the data-axis
        sharding applies unchanged."""
        sh = batch_sharding(self.mesh)
        arrays = batch.arrays
        if self.cfg.unit_weights:
            # weights reconstruct on device from lens (components.feature_wts)
            arrays = {k: v for k, v in arrays.items()
                      if not k.endswith("__wts")}
        if not self.cfg.packed_transfer:
            return {k: jax.device_put(v, sh) for k, v in arrays.items()}

        # e2e A/B knobs (VERDICT r3 #3 — relay-serialization mitigations):
        # DMT_PACK_ONEBUF=1 bitcasts the i32 fields to f32 bits and ships
        # ONE buffer (fewest transfer RPCs); DMT_PACK_CHUNK_MB=N splits
        # each packed buffer into <= N MB pieces (dodges the tunnel's
        # erratic >16 MB per-buffer range, costs more RPCs).
        import os
        onebuf = os.environ.get("DMT_PACK_ONEBUF", "0") == "1"
        chunk_mb = float(os.environ.get("DMT_PACK_CHUNK_MB", "0") or 0)

        layout: dict[str, list] = {}
        bufs: dict[str, list] = {}
        out: dict = {}
        b = None
        for k in sorted(arrays):
            v = arrays[k]
            kind = {np.dtype(np.float32): "f32",
                    np.dtype(np.int32): "i32"}.get(v.dtype)
            if kind is None or v.ndim > 2 or (b not in (None, v.shape[0])):
                out[k] = jax.device_put(v, sh)  # odd field: ship as-is
                continue
            b = v.shape[0]
            cols = 1 if v.ndim == 1 else v.shape[1]
            v2 = v.reshape(b, cols)
            if onebuf and kind == "i32":
                v2 = v2.view(np.float32)   # same width; bitcast back in-step
                buf_kind = "f32"
            else:
                buf_kind = kind
            fields = layout.setdefault(buf_kind, [])
            off = sum(c for _, _, c, _ in fields)
            # field tuple: (name, col offset, cols, ndim_or_bitcast_tag)
            # ndim slot doubles as the bitcast marker: 1/2 plain, -1/-2
            # bitcast-i32 (kept positional for layout-equality asserts)
            tag = -v.ndim if (onebuf and kind == "i32") else v.ndim
            fields.append((k, off, cols, tag))
            bufs.setdefault(buf_kind, []).append(v2)
        for kind, parts in bufs.items():
            buf = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            if chunk_mb > 0:
                cols_per = max(1, int(chunk_mb * 1e6 / (buf.itemsize * b)))
                nchunks = -(-buf.shape[1] // cols_per)
                for j in range(nchunks):
                    piece = buf[:, j * cols_per:(j + 1) * cols_per]
                    out[f"__packed_{kind}@{j}:{cols_per}"] = jax.device_put(
                        np.ascontiguousarray(piece), sh)
            else:
                out["__packed_" + kind] = jax.device_put(buf, sh)
        if self._pack_layout is None:
            self._pack_layout = layout
        else:
            assert self._pack_layout == layout, "batch schema changed"
        return out

    @staticmethod
    def unpack_device_batch(batch: dict, layout) -> dict:
        """Inverse of the packed device_batch, traced inside the step."""
        out = {k: v for k, v in batch.items()
               if not k.startswith("__packed_")}
        for kind, fields in layout.items():
            buf = batch.get("__packed_" + kind)
            if buf is None:
                # chunked pieces: reassemble (XLA fuses the concat into
                # the downstream slices; no extra HBM pass materializes)
                pieces = sorted(
                    ((k2, v2) for k2, v2 in batch.items()
                     if k2.startswith(f"__packed_{kind}@")),
                    key=lambda kv: int(kv[0].split("@")[1].split(":")[0]))
                buf = jnp.concatenate([v2 for _, v2 in pieces], axis=1)
            for k, off, cols, tag in fields:
                x = jax.lax.slice_in_dim(buf, off, off + cols, axis=1)
                if tag < 0:   # bitcast-i32 field (DMT_PACK_ONEBUF)
                    x = jax.lax.bitcast_convert_type(x, jnp.int32)
                ndim = abs(tag)
                out[k] = x[:, 0] if ndim == 1 else x
        return out

    def device_prefetch(self, data_iter: Iterator[Batch],
                        depth: int = 2) -> Iterator[tuple[Batch, dict]]:
        """Keep ``depth`` batches in flight to the device so host->device
        transfer overlaps the previous step's compute (device_put is async;
        consuming one step behind hides the copy latency).

        DMT_XFER_THREAD=1 moves the device_put calls onto a dedicated
        thread (A/B for the tunneled-relay serialization diagnosis: if
        the relay blocks the CLIENT thread per transfer, this restores
        overlap; if it serializes server-side, it changes nothing)."""
        import collections
        import os
        if os.environ.get("DMT_XFER_THREAD", "0") == "1":
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=1)
            try:
                queue: collections.deque = collections.deque()
                for batch in data_iter:
                    queue.append((batch, ex.submit(self.device_batch, batch)))
                    if len(queue) >= depth:
                        b, fut = queue.popleft()
                        yield b, fut.result()
                while queue:
                    b, fut = queue.popleft()
                    yield b, fut.result()
            finally:
                ex.shutdown(wait=False)
            return
        queue = collections.deque()
        for batch in data_iter:
            queue.append((batch, self.device_batch(batch)))
            if len(queue) >= depth:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    # ------------------------------------------------------------------
    def train(self, data_path: Optional[str] = None,
              max_steps: Optional[int] = None,
              resume_step: Optional[int] = None,
              log_every: int = 10,
              data_iter: Optional[Iterator[Batch]] = None,
              profile_dir: Optional[str] = None,
              profile_steps: tuple[int, int] = (10, 15)) -> dict:
        """Chief training loop; returns final streaming metric values."""
        cfg = self.cfg
        data_path = data_path or cfg.train_data_path
        max_steps = max_steps if max_steps is not None else cfg.max_iter_step

        tstate = self.init_state()
        start_step = 0
        if resume_step is not None and self.ckpt.has_step(resume_step):
            # numpy template: every process restores full host arrays, then
            # shard_state() places them on the mesh (sharded saves restore
            # cleanly regardless of the saving topology)
            template = jax.tree_util.tree_map(np.asarray, tstate)
            tstate = self.ckpt.restore(resume_step, template)
            start_step = resume_step
            log_line(f"resumed from model.ckpt-{resume_step}")
        elif cfg.update_emb:
            # warm-start pretrained tables (reference run_dnn.py:298-299)
            from .warmstart import parse_update_emb, warm_start_embeddings
            tstate["params"] = warm_start_embeddings(
                tstate["params"], parse_update_emb(cfg.update_emb), cfg)
            log_line(f"warm-started embeddings: {cfg.update_emb}")
        tstate = self.shard_state(tstate)

        if data_iter is None:
            data_iter = prefetch(make_input_stream(
                cfg, data_path, cfg.batch_size, epochs=cfg.epoch_num,
                shuffle=True, num_shards=jax.process_count(),
                shard_index=jax.process_index(),
                with_headers=False))  # train never reads row headers

        step_fn = self._train_step()
        metrics = task_metrics_init()
        meter = Throughput()
        summary = (SummaryWriter(cfg.summary_path, "train")
                   if cfg.summary_path else None)
        # rbg PRNG for the per-step dropout stream: the XLA RngBitGenerator
        # lowers to the TPU hardware RNG instead of in-graph threefry
        # hashing (measured 87.5 -> 79.8 ms/step at batch 4096, v5e);
        # dropout only needs iid bernoulli, not threefry's stream contract
        rng = jax.random.key(cfg.seed + 1, impl="rbg")
        profile_dir = profile_dir or os.environ.get("DMT_PROFILE_DIR")
        step = start_step
        eps = 0.0
        # SIGTERM (preemption, job scheduler kill) takes the same emergency-
        # checkpoint path as Ctrl-C so an evicted run resumes cleanly
        import signal

        def _sigterm(signum, frame):
            raise KeyboardInterrupt(f"signal {signum}")

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _sigterm)
        except ValueError:
            pass  # not the main thread; Ctrl-C path still covered
        try:
            for batch, dev_batch in self.device_prefetch(data_iter):
                if step >= max_steps:
                    break
                # optional jax.profiler trace window (SURVEY.md §5: the
                # reference has no profiling; this is the TPU-native addition)
                if profile_dir and step - start_step == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and step - start_step == profile_steps[1]:
                    jax.block_until_ready(tstate["step"])
                    jax.profiler.stop_trace()
                    log_line(f"profiler trace written to {profile_dir}")
                tstate, metrics, loss = step_fn(
                    tstate, metrics, dev_batch, jax.random.fold_in(rng, step))
                step += 1
                step_time, eps = meter.tick(batch.size)
                if step % log_every == 0 or step == max_steps:
                    vals = task_metrics_values(metrics)
                    ovf = ""
                    if int(tstate.get("lazy_overflow", 0)) > 0:
                        ovf = (f" | LAZY-OVERFLOW "
                               f"{int(tstate['lazy_overflow'])} id-grads "
                               "skipped (lower dedup_budget_div)")
                    log_line(
                        f"step {step} | loss {float(loss):.6f} | "
                        f"clk p/r/auc {vals['click_precision']:.4f}/"
                        f"{vals['click_recall']:.4f}/{vals['click_auc']:.4f} | "
                        f"ord p/r/auc {vals['order_precision']:.4f}/"
                        f"{vals['order_recall']:.4f}/{vals['order_auc']:.4f} | "
                        f"{eps:.0f} ex/s ({step_time*1000:.0f} ms/step)"
                        + ovf)
                if step % cfg.validate_step == 0 or step == max_steps:
                    self._save(tstate, step, metrics)
                    if summary is not None:
                        vals = task_metrics_values(metrics)
                        vals["examples_per_sec"] = eps
                        summary.scalars(step, vals)
        except KeyboardInterrupt:
            # emergency checkpoint: an interrupted run resumes cleanly
            # from --model_ckpt model.ckpt-<step>
            if step != start_step and not self.ckpt.has_step(step):
                log_line(f"interrupted at step {step}; saving emergency ckpt")
                self._save(tstate, step, metrics)
            raise
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        if step != start_step and not self.ckpt.has_step(step):
            self._save(tstate, step, metrics)
        self.last_step = step  # final trained step (quality_ladder reads it)
        return task_metrics_values(metrics)

    def _save(self, tstate: dict, step: int, metrics) -> None:
        # Save the sharded jax.Arrays directly: Orbax writes each process's
        # addressable shards and barriers across processes, so no host
        # gather of the full Sku table (+Adam moments) per save, and no
        # np.asarray crash on non-fully-addressable multi-host arrays.
        self.ckpt.save(step, tstate)
        if jax.process_index() == 0:
            vals = task_metrics_values(metrics)
            lines = [f">> iter_steps:{step}"] + [
                f"train_{k}:{v}" for k, v in vals.items()]
            log_to_file("\n".join(lines), self.cfg.train_result_path)
            log_line(f"saved model.ckpt-{step} (+DONE marker)")
