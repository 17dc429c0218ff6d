"""Collective-traffic comparison for the sharded sequence-lookup designs.

Lowers the full sharded train step on an 8-virtual-device CPU mesh
(data 2 x model 4) twice — cfg.shard_seq_exchange on (dedup + all_gather
row exchange, the shipped default) vs off (full-grid psum) — and lists
every collective in the compiled HLO with its payload bytes, so the
~L x traffic reduction of the exchange design (VERDICT r1 weak #3) is a
measured artifact rather than a formula.

Collectives inside conditional branches are attributed to their branch
computation: the exchange variant keeps a grid-psum fallback branch for
budget overflow, whose bytes are NOT steady-state traffic.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/collective_bytes.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import __graft_entry__ as g
from cikm2020_dmt_tpu.core.mesh import build_mesh
from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
from cikm2020_dmt_tpu.train.loop import Trainer

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}

# "f32[2,1024,8]{2,1,0}" -> bytes
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-gather|all-reduce|all-to-all|collective-permute|reduce-scatter)\b")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collectives(hlo: str):
    """[(computation, op_kind, bytes, shape_str)] for every collective."""
    comp = "?"
    out = []
    for line in hlo.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->", line)
        if line and not line[0].isspace() and ("{" in line):
            cm = re.search(r"%?([\w.\-]+)\s*\(", line)
            if cm:
                comp = cm.group(1)
        m = _OP_RE.match(line)
        if m:
            out.append((comp, m.group(3), shape_bytes(m.group(2)), m.group(2)))
    return out


def lower(exchange: bool) -> str:
    cfg = g._demo_config(
        sku_rows=8192, cid3_rows=2048, batch_size=256, mesh_model=4,
        mesh_data=2, shard_rows_threshold=512, validate_step=10**9,
        shard_seq_exchange=exchange,
    )
    mesh = build_mesh(cfg, jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch = trainer.device_batch(
        g._as_batch(g.synthetic_batch(cfg, cfg.batch_size)))
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        tstate, task_metrics_init(), batch, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def report(tag: str, hlo: str) -> int:
    rows = collectives(hlo)
    print(f"\n=== {tag}: {len(rows)} collectives ===")
    total = 0
    by_comp: dict = {}
    for comp, kind, nbytes, shape in rows:
        by_comp.setdefault(comp, [0, 0])
        by_comp[comp][0] += 1
        by_comp[comp][1] += nbytes
        total += nbytes
    for comp, (cnt, b) in sorted(by_comp.items(), key=lambda kv: -kv[1][1]):
        print(f"  {comp:<50} {cnt:>3} ops {b/1e6:>10.3f} MB")
    big = sorted(rows, key=lambda r: -r[2])[:8]
    for comp, kind, nbytes, shape in big:
        print(f"    {kind:<20} {nbytes/1e6:>8.3f} MB  {shape[:70]}  "
              f"[{comp[:40]}]")
    by_kind: dict = {}
    for comp, kind, nbytes, shape in rows:
        by_kind.setdefault(kind, [0, 0])
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
    for kind, (cnt, b) in sorted(by_kind.items(), key=lambda kv: -kv[1][1]):
        print(f"  by kind: {kind:<20} {cnt:>3} ops {b/1e6:>10.3f} MB")
    print(f"  TOTAL {total/1e6:.3f} MB (static; conditional branches "
          "included — see per-computation rows)")
    return total


def lower_dp(lazy: bool) -> str:
    """Pure data-parallel mesh (data=8, model=1): lazy vs dense Adam —
    the gradient all-reduce shrinks from the dense [R, D] table cotangent
    to the [U, D] touched-row block."""
    cfg = g._demo_config(
        sku_rows=65536, cid3_rows=2048, batch_size=256, mesh_model=1,
        mesh_data=8, validate_step=10**9, lazy_adam=lazy,
        dedup_rows_threshold=8192,
    )
    mesh = build_mesh(cfg, jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    if lazy:
        assert trainer.lazy_plan, "lazy plan empty on data-parallel mesh"
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch = trainer.device_batch(
        g._as_batch(g.synthetic_batch(cfg, cfg.batch_size)))
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        tstate, task_metrics_init(), batch, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def lower_sharded_lazy(lazy: bool) -> str:
    """(data=2 x model=4) mesh with a row-split 64k-row Sku: sharded lazy
    Adam (one [U, D] row exchange per step + local update) vs the dense
    shard_map path (per-site collectives + dense sharded Adam)."""
    cfg = g._demo_config(
        sku_rows=65536, cid3_rows=2048, batch_size=256, mesh_model=4,
        mesh_data=2, shard_rows_threshold=512, validate_step=10**9,
        lazy_adam=lazy, dedup_rows_threshold=8192,
    )
    mesh = build_mesh(cfg, jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    if lazy:
        assert any(t.sharded for t in trainer.lazy_plan), trainer.lazy_plan
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch = trainer.device_batch(
        g._as_batch(g.synthetic_batch(cfg, cfg.batch_size)))
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        tstate, task_metrics_init(), batch, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def main():
    if "--model-lazy" in sys.argv:
        hlo_dense = lower_sharded_lazy(lazy=False)
        hlo_lazy = lower_sharded_lazy(lazy=True)
        report("model-sharded tables, dense shard_map Adam", hlo_dense)
        report("model-sharded tables, sharded lazy Adam (default)", hlo_lazy)
        return
    if "--data" in sys.argv:
        hlo_dense = lower_dp(lazy=False)
        hlo_lazy = lower_dp(lazy=True)
        report("data-parallel, dense Adam (lazy_adam=false)", hlo_dense)
        report("data-parallel, lazy Adam (default)", hlo_lazy)
        return
    hlo_psum = lower(exchange=False)
    hlo_ex = lower(exchange=True)
    report("grid-psum seq lookups (shard_seq_exchange=false)", hlo_psum)
    report("dedup + all_gather exchange (default)", hlo_ex)


if __name__ == "__main__":
    main()
