"""Scaling-efficiency projection (VERDICT r2 next-round #5).

BASELINE.json asks for >=85% multi-host scaling efficiency.  Multi-chip
hardware is not available in this container, so this script converts
MEASURED quantities into an explicit analytic projection:

    measured:  per-step collective bytes of the compiled flagship step,
               by mesh axis (parsed from the GSPMD HLO's replica_groups
               on an 8-virtual-device mesh at production per-chip batch);
               36.8 ms single-chip step time (r5 device-op sum, TPU v5e).
    model:     ring all-reduce / all-gather cost on the mesh axis the
               collective actually rides, with public TPU v5e link
               numbers (jax-ml.github.io/scaling-book: ICI ~4.5e10 B/s
               per link per direction, v5e 2D torus; DCN ~2.5e10 B/s
               per host).  Efficiency = t_comp / (t_comp + t_comm) with
               ZERO compute/communication overlap — the conservative
               bound; XLA overlaps collectives with independent fusions,
               so realized efficiency sits between this and 1.0.

Assumptions stated inline and in the JSON: per-chip batch fixed at 4096
(weak scaling); lazy-Adam's [U, D] row-block all-reduce grows with the
GLOBAL batch (no cross-chip dedup of the union — conservative; Zipfian
overlap only shrinks it); dense-net gradient bytes are constant.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_analysis.py

Writes results/scaling_analysis_r5.json and prints the PARITY.md table.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as g
from cikm2020_dmt_tpu.core.mesh import build_mesh
from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
from cikm2020_dmt_tpu.train.loop import Trainer
from collective_bytes import shape_bytes  # noqa: E402  (sibling script)

# public v5e numbers (scaling book; per chip)
ICI_BW = 4.5e10          # bytes/s per link per direction
DCN_BW_HOST = 2.5e10     # bytes/s per host
CHIPS_PER_HOST = 8
T_COMPUTE_MS = 36.8      # measured: r5 shipped step @4096 (device-op sum,
                         # results/trace_decomposition_r5.txt; 39.2 r4, 45.3 r3)

_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-gather|all-reduce|all-to-all|collective-permute|reduce-scatter)")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(
    r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?")
_PAIRS_RE = re.compile(r"source_target_pairs=\{\{(\d+),(\d+)\}")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(")


def _first_group(line):
    """Device ids of the first replica group on an HLO collective line
    (explicit {{...}} lists and iota [G,S]<=[dims]T(perm) forms)."""
    m = _GROUPS_LIST_RE.search(line)
    if m:
        return [int(x) for x in m.group(1).split(",")]
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        import numpy as np
        n_groups, g_size = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(4):
            ids = ids.transpose([int(x) for x in m.group(4).split(",")])
        return ids.reshape(n_groups, g_size)[0].tolist()
    m = _PAIRS_RE.search(line)
    if m:
        return [int(m.group(1)), int(m.group(2))]
    return None


def collective_rows(hlo: str, mesh_shape: tuple[int, int]):
    """[(comp, kind, bytes, axis, group_size)] for every collective.
    axis from the first replica group's device ids (device id =
    data * model_size + model for our mesh build); comp tracks the HLO
    computation so callers can drop cond-branch fallbacks (not
    steady-state traffic)."""
    d_sz, m_sz = mesh_shape
    comp = "?"
    rows = []
    for line in hlo.splitlines():
        if line and not line[0].isspace() and "{" in line:
            cm = _COMP_RE.match(line.replace("ENTRY ", ""))
            if cm:
                comp = cm.group(1)
        m = _OP_RE.match(line)
        if not m:
            continue
        nbytes = shape_bytes(m.group(1))
        ids = _first_group(line)
        axis = "unknown"
        if ids is not None and len(ids) == 1:
            axis = "self"   # degenerate single-device group: zero traffic
        if ids and len(ids) >= 2:
            datas = {i // m_sz for i in ids}
            models = {i % m_sz for i in ids}
            if len(datas) == 1:
                axis = "model"
            elif len(models) == 1:
                axis = "data"
            else:
                axis = "both"
        rows.append((comp, m.group(2), nbytes, axis,
                     len(ids) if ids else 0))
    return rows


def lower_step(mesh_data: int, mesh_model: int, batch: int,
               shard_rows_threshold: int = 1 << 62,
               fms_grad_bf16: bool = False):
    cfg = g._demo_config(
        sku_rows=1_048_576, cid3_rows=12_000, batch_size=batch,
        mesh_model=mesh_model, mesh_data=mesh_data,
        shard_rows_threshold=shard_rows_threshold,
        fms_grad_bf16=fms_grad_bf16,
        validate_step=10**9, compute_dtype="bfloat16")
    mesh = build_mesh(cfg, jax.devices()[:mesh_data * mesh_model])
    trainer = Trainer(cfg, mesh=mesh)
    tstate = trainer.shard_state(trainer.init_state())
    step_fn = trainer._train_step()
    batch_d = trainer.device_batch(
        g._as_batch(g.synthetic_batch(cfg, cfg.batch_size)))
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        tstate, task_metrics_init(), batch_d, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def ring_ms(nbytes: float, group: int, bw: float, kind: str) -> float:
    """Ring-collective wall time (ms) for logical payload nbytes."""
    if group <= 1 or nbytes == 0:
        return 0.0
    f = (group - 1) / group
    per_chip = {"all-reduce": 2.0, "all-gather": 1.0, "reduce-scatter": 1.0,
                "all-to-all": 1.0, "collective-permute": 1.0}[kind] * nbytes * f
    return per_chip / bw * 1e3


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    out: dict = {"assumptions": {
        "ici_bw_bytes_per_s_per_link_dir": ICI_BW,
        "dcn_bw_bytes_per_s_per_host": DCN_BW_HOST,
        "t_compute_ms_per_chip_batch_4096": T_COMPUTE_MS,
        "overlap": "zero (conservative); XLA overlaps in practice",
        "lazy_block_growth": "linear in global batch (no cross-chip dedup)",
        "dcn_model": "all-reduce crosses DCN hierarchically (XLA "
                     "multislice: in-host reduce-scatter on ICI, one "
                     "inter-host payload per host NIC per direction); "
                     "all-to-all payloads cross once, each chip's "
                     "off-host share riding the shared host NIC",
    }}

    # --- measure per-axis bytes on the virtual-device meshes ------------
    print("lowering (data=8, model=1) DP-lazy at per-chip batch 4096 ...",
          flush=True)
    # sharding threshold set so the big tables are ELIGIBLE for full-mesh
    # sharding on the pure-data mesh too (full_mesh_tables default); set
    # DMT_SCALING_LEGACY=1 to reproduce the pre-fms global-union numbers
    # recorded in results/scaling_analysis_r3.json's history
    legacy = os.environ.get("DMT_SCALING_LEGACY", "0") == "1"
    hlo_dp = lower_step(8, 1, batch=8 * 4096,
                        shard_rows_threshold=(1 << 62) if legacy else 131072)
    rows_dp = collective_rows(hlo_dp, (8, 1))
    print("lowering (data=2, model=4) row-split at per-chip batch 4096 ...",
          flush=True)
    hlo_2d = lower_step(2, 4, batch=2 * 4096, shard_rows_threshold=131072)
    rows_2d = collective_rows(hlo_2d, (2, 4))
    # second data-axis size: fit the PER-CHIP growth law empirically
    # instead of assuming it (needs 16 virtual devices)
    rows_2d4 = None
    if jax.device_count() >= 16:
        print("lowering (data=4, model=4) row-split at per-chip batch "
              "4096 ...", flush=True)
        hlo_2d4 = lower_step(4, 4, batch=4 * 4096,
                             shard_rows_threshold=131072)
        rows_2d4 = collective_rows(hlo_2d4, (4, 4))

    def tally(rows):
        """Steady-state per-(axis, kind) byte totals: entry computation
        only — collectives inside cond-branch computations are the lazy
        overflow fallback, not per-step traffic (same exclusion as
        collective_bytes.py)."""
        t: dict = {}
        dropped = 0
        for comp, kind, b, axis, grp in rows:
            if "main" not in comp:
                dropped += b
                continue
            k = (axis, kind)
            t[k] = t.get(k, 0) + b
        return t, dropped

    tal_dp, drop_dp = tally(rows_dp)
    tal_2d, drop_2d = tally(rows_2d)
    tal_2d4 = tally(rows_2d4)[0] if rows_2d4 is not None else None
    out["measured_bytes_dp_8x1"] = {f"{a}:{k}": v
                                    for (a, k), v in sorted(tal_dp.items())}
    out["measured_bytes_2d_2x4"] = {f"{a}:{k}": v
                                    for (a, k), v in sorted(tal_2d.items())}
    out["excluded_cond_branch_bytes"] = {"dp": drop_dp, "2d": drop_2d}
    for tag, tal, drop in (("dp 8x1", tal_dp, drop_dp),
                           ("2d 2x4", tal_2d, drop_2d)):
        print(f"  {tag}: " + ", ".join(
            f"{a}:{k}={v/1e6:.2f}MB" for (a, k), v in sorted(tal.items()))
            + f"  [excluded cond-branch: {drop/1e6:.1f}MB]")

    # --- project ---------------------------------------------------------
    # Per-bucket scaling law: model-axis bytes are per-data-row constants
    # (the row exchange is dedup-budget-bound).  Data-axis logical bytes
    # S(d) are FIT from the two measured data sizes (d=2 and d=4, same
    # per-chip batch): S(d) = alpha + beta*d, linear two-point fit —
    # beta==0 means per-chip traffic is flat under weak scaling; beta>0
    # means the bucket does global-batch work (the conservative
    # assumption the first draft applied to everything).  The DP mesh has
    # one measurement, so it keeps the conservative linear rule.
    dense_floor = 3.5e6

    def fit_2pt(v2: float, v4: float):
        beta = (v4 - v2) / 2.0
        alpha = v2 - beta * 2.0
        return alpha, beta

    fits = {}
    if tal_2d4 is not None:
        keys = set(tal_2d) | set(tal_2d4)
        print("\n  data-axis growth fits (S(d) = alpha + beta*d, MB):")
        for key in sorted(keys):
            a, k = key
            if a == "model":
                continue
            alpha, beta = fit_2pt(tal_2d.get(key, 0), tal_2d4.get(key, 0))
            fits[key] = (alpha, beta)
            print(f"    {a}:{k:<20} alpha={alpha/1e6:8.2f} "
                  f"beta={beta/1e6:8.2f} MB/data-row")
        out["fits_mb"] = {f"{a}:{k}": [al / 1e6, be / 1e6]
                          for (a, k), (al, be) in fits.items()}


    table = []
    print("\n| mesh | chips | hosts | comm ms (ICI) | eff (ICI slice) | "
          "comm ms (+DCN data axis) | eff (DCN) |")
    print("|---|---|---|---|---|---|---|")
    for chips in (8, 16, 32, 64, 128, 256):
        hosts = max(1, chips // CHIPS_PER_HOST)
        # WIRE-DTYPE correction (a2a only): the byte tally reads the
        # CPU-optimized HLO, whose float-normalization pass upcasts
        # bf16 collectives to f32 (verified: the pre-optimization
        # stablehlo carries tensor<...xbf16> for the same all_to_all),
        # so every a2a leg is counted at f32 width.  On TPU the wire
        # dtype is real: the row RESPONSE leg is the table dtype (bf16
        # by default) and the gradient PUSH leg is f32 unless
        # cfg.fms_grad_bf16.  The two legs are shape-symmetric
        # ([n_dev*C, D] each; the s32 id legs are ~1.5% of the total),
        # so: default = 0.75x measured, +fms_grad_bf16 = 0.5x.
        variants = [("dp", 1, tal_dp, 8, 1.0),
                    ("2d m=4 (a2a @f32, conservative)", 4, tal_2d, 2, 1.0),
                    ("2d m=4 bf16 tables", 4, tal_2d, 2, 0.75),
                    ("2d m=4 +fms_grad_bf16", 4, tal_2d, 2, 0.5)]
        for mesh_name, model_sz, tal, meas_data, a2a_dtype_factor \
                in variants:
            data_sz = chips // model_sz
            if data_sz < 1:
                continue
            t_model = t_data_ici = 0.0
            ar_bytes = a2a_bytes = 0.0
            for (a, k), v in tal.items():
                if a == "self":
                    continue       # single-device group: no wire traffic
                if a == "model":
                    t_model += ring_ms(v, model_sz, ICI_BW, k)
                    continue
                if mesh_name.startswith("2d") and (a, k) in fits:
                    alpha, beta = fits[(a, k)]
                    grown = max(0.0, alpha + beta * data_sz)
                    if k != "all-reduce":
                        grown *= a2a_dtype_factor
                else:
                    scale = data_sz / meas_data
                    grown = v * scale
                    if k == "all-reduce":
                        grown = dense_floor + \
                            max(0.0, v - dense_floor) * scale
                if k == "all-reduce":
                    ar_bytes += grown
                else:
                    a2a_bytes += grown
                t_data_ici += ring_ms(grown, data_sz, ICI_BW, k)
            t_ici = t_model + t_data_ici
            eff_ici = T_COMPUTE_MS / (T_COMPUTE_MS + t_ici)
            # DCN variant, per collective kind:
            #  - all-reduce (dense grads + metrics) runs HIERARCHICALLY
            #    across hosts (XLA multislice: in-host reduce-scatter on
            #    ICI, inter-host exchange of the reduced payload, in-host
            #    all-gather) -> each host NIC carries the payload once
            #    per direction: t = 2 * S * (h-1)/h / DCN_BW_HOST.
            #  - all-to-all rows/grads cross hosts once (no 2x reduce
            #    factor); every chip's off-host share rides the host NIC:
            #    per-host bytes = chips/host * S * (h-1)/h.
            if hosts > 1:
                t_ar = ar_bytes * 2 * (hosts - 1) / hosts \
                    / DCN_BW_HOST * 1e3
                t_a2a = a2a_bytes * CHIPS_PER_HOST * (hosts - 1) / hosts \
                    / DCN_BW_HOST * 1e3
                t_data_dcn = t_ar + t_a2a
            else:
                t_data_dcn = t_data_ici
            t_dcn = t_model + t_data_dcn
            eff_dcn = T_COMPUTE_MS / (T_COMPUTE_MS + t_dcn)
            table.append({
                "mesh": mesh_name, "chips": chips, "hosts": hosts,
                "t_comm_ici_ms": round(t_ici, 3),
                "eff_ici": round(eff_ici, 4),
                "t_comm_dcn_ms": round(t_dcn, 3),
                "eff_dcn": round(eff_dcn, 4),
            })
            print(f"| {mesh_name} | {chips} | {hosts} | {t_ici:.2f} | "
                  f"{eff_ici:.1%} | {t_dcn:.2f} | {eff_dcn:.1%} |")
    out["projection"] = table

    os.makedirs("results", exist_ok=True)
    with open("results/scaling_analysis_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote results/scaling_analysis_r5.json")


if __name__ == "__main__":
    main()
