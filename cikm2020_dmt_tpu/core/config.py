"""Typed configuration for the TPU DMT framework.

Mirrors the degrees of freedom of the reference INI config
(reference conf/recsys_conf.py + conf/settings/dmt.conf) with the same
mini-DSLs:

- embedding spec    ``Name:id_size:dim:feature_name:{i|u}#...``
  (reference recsys_conf.py:274-284, dmt.conf:121)
- attention pairs   ``seq_feat:item_feat#...|...`` one group per behavior
  sequence (reference recsys_conf.py:295-305, dmt.conf:123)
- ts features       ``ts_feat|ts_feat|...`` (reference recsys_conf.py:307-314)
- class weights     ``label:weight,...`` sorted by label into a weight vector
  (reference util/util.py:132-144, dmt.conf:112-118)

The reference coerces an untyped INI into a dict-of-dicts at runtime
(recsys_conf.py:234-242); here everything lands in frozen dataclasses that
are hashable, so a config can be closed over by a jitted train step as a
static argument.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
import re
from dataclasses import dataclass, field
from typing import Mapping


# ---------------------------------------------------------------------------
# DSL parsers
# ---------------------------------------------------------------------------


def parse_csv_ints(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.split(",") if x.strip() != "")


def parse_csv_floats(s: str) -> tuple[float, ...]:
    return tuple(float(x) for x in s.split(",") if x.strip() != "")


def parse_class_weights(s: str) -> tuple[tuple[int, float], ...]:
    """``"0:1.0,1:15.0,..."`` -> ((0, 1.0), (1, 15.0), ...) sorted by label.

    Reference util/util.py:132-144 (parse_weight) sorts by label and keeps
    only the weight vector; we keep the labels too since they define the
    mask columns (labels {0,1,2,4,5} -> mask one-hot columns 0..4).
    """
    pairs = []
    for item in s.split(","):
        item = item.strip()
        if not item:
            continue
        label, weight = item.split(":")
        pairs.append((int(label), float(weight)))
    return tuple(sorted(pairs))


@dataclass(frozen=True)
class EmbeddingSpec:
    """One entry of the embedding DSL (reference recsys_conf.py:274-284)."""

    table: str          # embedding (vocab) name, e.g. "Sku"
    id_size: int        # total rows incl. OOV buckets, e.g. 5_000_000
    dim: int            # embedding dim
    feature: str        # input feature name, e.g. "clk_seq_sku_7d_50"
    side: str           # "i" (item) or "u" (user)


def parse_embedding_spec(s: str) -> tuple[EmbeddingSpec, ...]:
    s = s.strip()
    if len(s) <= 2:
        return ()
    out = []
    for item in s.split("#"):
        f = item.split(":")
        out.append(EmbeddingSpec(f[0], int(f[1]), int(f[2]), f[3], f[4] if len(f) > 4 else "i"))
    return tuple(out)


def parse_attention_pairs(s: str) -> tuple[tuple[tuple[str, str], ...], ...]:
    """``"a:x#b:y|c:x#d:y"`` -> (((a,x),(b,y)), ((c,x),(d,y))).

    Outer groups (split on ``|``) are the behavior sequences (click / order /
    cart); inner pairs map a sequence feature to the matching target-item
    feature (reference recsys_conf.py:295-305).
    """
    s = s.strip()
    if len(s) <= 2:
        return ()
    groups = []
    for group in s.split("|"):
        pairs = []
        for pair in group.split("#"):
            a, b = pair.split(":")
            pairs.append((a.strip(), b.strip()))
        groups.append(tuple(pairs))
    return tuple(groups)


def parse_ts_features(s: str) -> tuple[str, ...]:
    s = s.strip()
    if len(s) <= 1:
        return ()
    return tuple(x.strip() for x in s.split("|"))


def parse_sim_pairs(s: str) -> tuple[tuple[str, str], ...]:
    s = s.strip()
    if len(s) <= 2:
        return ()
    out = []
    for pair in s.split("#"):
        a, b = pair.split(":")
        out.append((a.strip(), b.strip()))
    return tuple(out)


_SEQ_LEN_RE = re.compile(r"_(\d+)$")


def feature_max_len(feature: str, default: int = 10) -> int:
    """Static padded length for an id feature.

    Sequence features encode their cap in the trailing ``_N`` of the name
    (``clk_seq_sku_7d_50`` -> 50), matching how the reference's data
    generation capped them; item-side single-id features get length 1.
    Uncapped multi-id features (e.g. ``near_expo_seq_c2``) fall back to
    ``default``.
    """
    m = _SEQ_LEN_RE.search(feature)
    if m:
        return int(m.group(1))
    if feature.startswith("item_"):
        return 1
    return default


# ---------------------------------------------------------------------------
# Config dataclasses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerConfig:
    """Deep Interest Transformer hparams (reference dmt.conf:41-56)."""

    d_model: int = 80
    d_ff: int = 320
    num_heads: int = 4
    num_blocks_encode: int = 1
    num_blocks_decode: int = 1
    maxlen_k: int = 50
    maxlen_q: int = 1
    dropout_rate: float = 0.1
    is_trans_input_by_mlp: bool = False
    # one of: position_sin_cos | position_learn | time_add | time_concat | none
    position_encoding_method: str = "position_learn"
    is_trans_out_concat_item: bool = False
    is_trans_out_by_mlp: bool = False
    is_decoder_add_pos_emb: bool = False


@dataclass(frozen=True)
class DMTConfig:
    # ---- model (reference dmt.conf [model]) ----
    model_type: str = "mmoe_transformer_unbias"
    feature_dimension: int = 615
    output_units: int = 1
    hidden_units: tuple[int, ...] = (512, 256, 128)          # single-task MLP stack
    hidden_units_bottom: tuple[int, ...] = (512, 256, 128)   # shared bottom / experts
    hidden_units_task: tuple[int, ...] = (32,)               # per-task tower
    hidden_units_bias: tuple[int, ...] = (32, 16)            # bias deep net
    num_experts: int = 4
    is_use_feature: bool = True

    # regularization (reference dmt.conf:69-76)
    optimizer: str = "adam"
    dropout: tuple[float, ...] = (0.5, 0.7, 0.8)
    dropout_bottom: tuple[float, ...] = (0.5, 0.7, 0.8)      # keep-probs (TF semantics)
    dropout_task: tuple[float, ...] = (1.0,)
    dropout_rate_bias: tuple[float, ...] = (0.5, 0.5)        # drop-rates (tf.layers semantics)
    is_bn: bool = False
    bn_decay: float = 0.999
    is_dropout: bool = False
    wnd_wd: float = 0.0
    l2_emb_lambda: float = 0.01

    # schedule (reference dmt.conf:62-81, recsys_conf.py:144-151)
    epoch_num: int = 2
    batch_size: int = 2048
    test_batch_size: int = 4096
    validation_batch_size: int = 4096
    validate_step: int = 1000
    shuffle_size: int = 100000
    total_example_num: int = 0
    max_iter_step: int = 10_000_000
    learning_rate: tuple[float, ...] = (0.001, 0.0001)
    step_boundary: tuple[int, ...] = (300_000_000,)

    # losses (reference dmt.conf:8-10,24-31,112-118)
    loss_weight: tuple[float, ...] = (1.0, 1.0)
    loss_weight_method: str = "fixed"        # fixed | uncertainty
    loss_unbias_method: str = "two_head_add"  # two_head_add | two_head_multiply
    loss_ctr_rel_method: str = "ctr_rel"      # ctr | ctr_rel
    # exact-fidelity switch: feed the RAW multi-valued label (0..5) into the
    # single-task sigmoid CE like the reference does
    # (inference_mlp.py:146-160) instead of the derived binary click label.
    # Off by default — the raw-label CE is not a proper binary objective
    # (documented deviation, SURVEY.md §2.4) — on for parity measurement.
    single_task_raw_label: bool = False
    export_weight: tuple[float, ...] = (1.0, 1.0)
    # serving export: store embedding tables with >= this many physical
    # rows as int8 + per-row f32 scale (4x less serving memory; gathers
    # move D+4 bytes/row instead of 4D — dequantize happens after the
    # gather in the jitted scorer).  0 = off.  Scoring deltas are bounded
    # by the per-row quantization step (tests/test_export.py)
    export_int8_rows: int = 0
    # ((label, weight), ...) sorted by label; labels define the mask columns
    weight_ctr: tuple[tuple[int, float], ...] = parse_class_weights(
        "0:1.0,1:15.0,2:15.0,4:15.0,5:15.0")
    weight_ecvr: tuple[tuple[int, float], ...] = parse_class_weights(
        "0:1.0,1:1.0,2:1.0,4:400.0,5:400.0")
    train_weight: tuple[tuple[int, float], ...] = parse_class_weights(
        "0:1.0,1:15.0,2:15.0,4:400.0,5:400.0")
    valid_weight: tuple[tuple[int, float], ...] = parse_class_weights(
        "0:1.0,1:15.0,2:15.0,4:400.0,5:400.0")

    # unbias / propensity (reference dmt.conf:24-31, tfrecord_mask.py:63-81)
    propensity_em: bool = False
    propensity_em_type: str = "page"          # position | page

    # transformer
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    zero_pad: bool = True

    # ---- embeddings (reference dmt.conf [embedding]) ----
    embeddings: tuple[EmbeddingSpec, ...] = ()
    embeddings_bias: tuple[EmbeddingSpec, ...] = ()
    attention_pairs: tuple[tuple[tuple[str, str], ...], ...] = ()
    attention_ts: tuple[str, ...] = ()
    sim_embed: tuple[tuple[str, str], ...] = ()
    # warm-start DSL "Table:path#..." (reference recsys_conf.py:330-338)
    update_emb: str = ""

    # default static length cap for uncapped multi-id features
    default_id_len: int = 10

    # ---- schema ----
    header_schema: tuple[str, ...] = (
        "expid", "pin", "expo_time", "sid", "pos", "sku", "uuid",
        "click_time", "order_id", "label", "reqsig", "page", "index")

    # ---- paths (reference dmt.conf [path]) ----
    output_path: str = ""
    summary_path: str = ""
    train_data_path: str = ""
    train_data_mean_path: str = ""
    train_data_std_path: str = ""
    train_data_stat_path: str = ""
    validation_data_path: str = ""
    test_data_path: str = ""
    test_data_path_ord: str = ""
    checkpoint: str = ""
    # directory of reference-style idtables vocab .py files; empty -> pure
    # hashing for every table (see data/vocab.py)
    vocab_path: str = ""
    tag: str = "dmt"

    # ---- TPU-native additions ----
    seed: int = 131
    param_dtype: str = "float32"
    compute_dtype: str = "float32"    # "bfloat16" for MXU-friendly activations
    # embedding tables with at least this many rows are row-sharded over the
    # "model" mesh axis; smaller tables are replicated
    shard_rows_threshold: int = 100_000
    # drop per-id weight arrays from device batches and reconstruct them as
    # presence masks on device (valid when every id weight is 1.0, which
    # holds for the whole DMT feature set — halves host->device bytes)
    unit_weights: bool = False
    # concat all batch fields into one f32 + one i32 [b, F] buffer on the
    # host and slice them back inside the jitted step: 2 host->device
    # transfer setups per batch instead of ~40 (per-transfer overhead is
    # the measured e2e bottleneck on tunneled/driver-heavy links)
    packed_transfer: bool = True
    # dedup embedding gradients before the scatter-add for tables with at
    # least dedup_rows_threshold rows (TPU scatter is 0.13us/row serialized;
    # ranking traffic is Zipfian — 19.7x sku duplication measured on demo
    # batches).  Budget = update_count // dedup_budget_div unique rows;
    # overflow falls back to the plain scatter inside a lax.cond.
    dedup_grads: bool = True
    dedup_rows_threshold: int = 1_000_000
    dedup_budget_div: int = 8
    # lazy-Adam budget overflow: keep the FORWARD exact by gathering the
    # true table rows for budget-overflowed ids (lax.cond — free when no
    # overflow occurs); only their gradient is skipped for the step.  Off:
    # overflowed ids read the zero row (pre-r2 behavior)
    lazy_overflow_exact: bool = True
    # small tables (<= dedup_exact_rows_max rows) get an EXACT dedup
    # backward: ids < num_rows bounds the unique count by pigeonhole, so
    # the scatter touches at most num_rows rows with no budget heuristic.
    # DEFAULT OFF (0): measured a ~19 ms/step REGRESSION on the flagship
    # (87.6 vs 68.6 ms) — small-table scatter-adds are already ~25x
    # faster per row (VMEM-resident accumulator), so sorting the ~287k
    # seq-site rows costs more than the dedup saves.  Kept as an opt-in
    # for workloads with extreme duplication on mid-size tables.
    dedup_exact_rows_max: int = 0
    # tables with <= onehot_bwd_rows_max rows take their gradient as a
    # one-hot matmul on the MXU (ops/scatter_rows.take_onehot) instead of
    # the serialized scatter-add: measured 11.6x faster on TPU v5e at the
    # flagship id volume (N=290k ids, R=2048, D=16: 0.24 vs 2.77 ms).
    # FLOPs scale with N*R*D, so keep this small-table-only.
    onehot_bwd_rows_max: int = 4096
    # round the small-table cotangent to bf16 before the one-hot backward
    # dot (bf16 MXU rate instead of the 3-pass f32 decomposition; f32
    # accumulation preserved).  DEFAULT OFF: measured a ~3 ms/step
    # REGRESSION on the flagship (53.2 vs 50.3) — the [N, D] f32->bf16
    # cast materializes and breaks XLA's fusion of the cotangent producer
    # into the dot operand, costing more than the faster MXU rate saves.
    onehot_bwd_bf16: bool = False
    # sparse (lazy) row-wise Adam for tables with >= dedup_rows_threshold
    # rows: dedup the batch's id union outside the loss, differentiate
    # w.r.t. the gathered unique rows (scatter-free backward), and update
    # only the touched rows of param/m/v.  Kills the dense-gradient
    # materialization AND the dense Adam sweep over the full table (~1.9 GB
    # HBM traffic/step for a 5M-row packed table).  Untouched rows keep
    # stale moments — LazyAdam semantics (tf.contrib LazyAdamOptimizer),
    # a documented deviation from the reference's dense TF1 Adam; set
    # false for exact dense-Adam parity.  Auto-disabled unless the
    # optimizer is adam, the mesh is single-device, and wnd_wd == 0.
    lazy_adam: bool = True
    # sharded sequence lookups: dedup + all_gather of owned unique rows
    # (collective moves ~2*(bL/dedup_budget_div)*D bytes) instead of the
    # full-grid [B, L, D] psum; falls back to the psum on budget overflow
    shard_seq_exchange: bool = True
    # full-mesh table sharding (parallel/full_shard.py): big lazy-Adam
    # tables split their rows over EVERY device (data x model) and
    # exchange looked-up rows / gradient row-blocks with all_to_all —
    # per-chip collective traffic is then bound by the PER-CHIP batch, not
    # the global batch, which is what multi-host weak scaling needs
    # (results/scaling_analysis_r3.json measured the global-union
    # alternative growing ~157 MB per added data shard).  Applies when the
    # mesh has >1 device and the table divides evenly; overflow semantics:
    # forward falls back to an exact fetch, over-budget/capacity rows skip
    # their gradient for the step (counted in lazy_overflow).
    full_mesh_tables: bool = True
    # store embedding tables packed 128//dim logical rows per 128-lane
    # physical row: TPU gathers/scatters cost per (8,128) tile, so packing
    # measured 15x faster gathers / 6.7x faster scatter-adds at equal
    # bytes.  Only tables with >= pack_rows_threshold logical rows pack:
    # for small tables the one-hot slot-select (and its p-times-wider
    # cotangent) costs more than the scatter it saves (measured)
    packed_tables: bool = True
    pack_rows_threshold: int = 500_000
    # store embedding tables with >= this many logical rows in bfloat16:
    # halves the HBM bytes of the dominant gather/grid traffic (the step
    # is memory-bound, not FLOP-bound).  Update math stays exact: the
    # lazy-Adam moments are f32, the row update computes in f32 and
    # rounds once to bf16 on write-back, and the union-grid backward
    # accumulates its segment-sum in f32.  ON by default since the
    # round-3 on-chip A/B: 83.1k -> 89.4k ex/s (+7.6%) on the flagship
    # step (TPU v5e, batch 4096), with the full demo chain reproducing
    # the f32 artifact's test AUCs to 4 decimals (PARITY.md).  Default
    # 500 since round 5: bf16 storage for the SMALL tables too measured
    # 39.8 -> 36.8 ms/step device-op sum (96.5k -> 104.2k ex/s wall —
    # the sequence grids and their cotangent traffic are where the f32
    # bytes were), held-out quality inside the seed band
    # (PARITY.md round-5).  Dense-path bf16 tables get f32 optimizer
    # math via train/optim.f32_math (moments + update arithmetic f32,
    # one bf16 rounding at the parameter write — the same contract as
    # the lazy path).  0 disables.
    table_bf16_threshold: int = 500
    # hybrid storage for the lazily-managed big tables: keep the TABLE
    # f32 (so the write-back rides the per-row DMA kernel — Mosaic can
    # only row-slice 32-bit 128-lane HBM memrefs) but round the gathered
    # union rows to bf16 before they feed the [N, D] grid, which is
    # where the step's HBM bytes actually are.  Only meaningful with
    # compute_dtype=bfloat16 and table_bf16_threshold=0; A/B via
    # DMT_GRID_BF16 (train/lazy.collect).
    grid_bf16: bool = False
    # full-mesh tables (parallel/full_shard.py): push the per-row
    # gradient blocks through the all_to_all in bf16 instead of f32
    # (receivers segment-sum in f32).  Halves the DCN-dominant exchange
    # bytes on multi-host meshes — the 128-chip DCN-limited projection
    # moves from 0.842 back over the 0.85 bar (scaling_analysis) — at
    # the cost of bf16-rounding each pushed row BEFORE the cross-chip
    # sum (the same compression bf16 gradient all-reduces apply).  Off
    # by default: single-host/ICI meshes don't need it.
    fms_grad_bf16: bool = False
    mesh_data: int = 0   # 0 = auto: all devices not used by the model axis
    mesh_model: int = 1
    # host input pipeline: concurrent batch assemblers (the C++ parse
    # releases the GIL, so worker THREADS overlap one batch's parse with
    # the next one's numpy allocation + segment bookkeeping) and the
    # TFRecord scan cache budget for multi-epoch runs over small datasets.
    # 0 = auto (one per core, cap 8): interleaved A/B on a 4-core host
    # measured ~78k ex/s at 2 workers vs ~92k at 4 — auto keeps the host
    # path at the device step rate without hand-tuning per machine
    data_workers: int = 0
    data_cache_bytes: int = 1 << 29

    # -------------------------------------------------------------------
    # Derived paths (reference recsys_conf.py:106-110)
    @property
    def model_path(self) -> str:
        return os.path.join(self.output_path or ".", self.tag + ".model")

    @property
    def train_result_path(self) -> str:
        return os.path.join(self.output_path or ".", self.tag + ".train.result")

    @property
    def validation_result_path(self) -> str:
        return os.path.join(self.output_path or ".", self.tag + ".validation.result")

    # -------------------------------------------------------------------
    @property
    def labels(self) -> tuple[int, ...]:
        """Sorted distinct labels -> mask columns (reference recsys_conf.py:349-356)."""
        return tuple(l for l, _ in self.train_weight)

    @property
    def num_label_classes(self) -> int:
        return len(self.train_weight)

    @property
    def is_unbias_model(self) -> bool:
        return "unbias" in self.model_type

    @property
    def is_transformer_model(self) -> bool:
        return "transformer" in self.model_type

    @property
    def is_multi_task(self) -> bool:
        return self.model_type in (
            "multi_task", "mmoe", "multi_task_transformer", "mmoe_transformer",
            "mmoe_transformer_unbias")

    @property
    def is_use_seq_ts(self) -> bool:
        return len(self.attention_ts) >= 1

    def weight_vector(self, pairs: tuple[tuple[int, float], ...]) -> tuple[float, ...]:
        return tuple(w for _, w in pairs)

    def id_feature_names(self) -> tuple[str, ...]:
        """All id feature names (main + bias), deduped, order-preserving."""
        seen: dict[str, None] = {}
        for spec in self.embeddings + self.embeddings_bias:
            seen.setdefault(spec.feature, None)
        return tuple(seen)

    def feature_to_spec(self) -> Mapping[str, EmbeddingSpec]:
        out: dict[str, EmbeddingSpec] = {}
        for spec in self.embeddings + self.embeddings_bias:
            out.setdefault(spec.feature, spec)
        return out

    def replace(self, **kw) -> "DMTConfig":
        return dataclasses.replace(self, **kw)

    # -------------------------------------------------------------------
    @classmethod
    def from_ini(cls, path: str, **overrides) -> "DMTConfig":
        """Load a reference-format INI file (e.g. dmt.conf)."""
        cp = configparser.ConfigParser(interpolation=None)
        with open(path) as f:
            cp.read_string(f.read())

        def get(section: str, option: str, default=None):
            try:
                return cp.get(section, option)
            except (configparser.NoSectionError, configparser.NoOptionError):
                return default

        def get_bool(section, option, default):
            v = get(section, option)
            if v is None:
                return default
            return v.strip().lower() in ("true", "1", "yes")

        def get_int(section, option, default):
            v = get(section, option)
            return default if v is None else int(v)

        def get_float(section, option, default):
            v = get(section, option)
            return default if v is None else float(v)

        d = cls()  # defaults
        t = d.transformer
        transformer = TransformerConfig(
            d_model=get_int("model", "transformer_d_model", t.d_model),
            d_ff=get_int("model", "transformer_d_ff", t.d_ff),
            num_heads=get_int("model", "transformer_num_heads", t.num_heads),
            num_blocks_encode=get_int("model", "transformer_num_blocks_encode", t.num_blocks_encode),
            num_blocks_decode=get_int("model", "transformer_num_blocks_decode", t.num_blocks_decode),
            maxlen_k=get_int("model", "transformer_maxlen_k", t.maxlen_k),
            maxlen_q=get_int("model", "transformer_maxlen_q", t.maxlen_q),
            dropout_rate=get_float("model", "transformer_dropout_rate", t.dropout_rate),
            is_trans_input_by_mlp=get_bool("model", "transformer_is_trans_input_by_mlp", t.is_trans_input_by_mlp),
            position_encoding_method=get("model", "transformer_position_encoding_method", t.position_encoding_method),
            is_trans_out_concat_item=get_bool("model", "transformer_is_trans_out_concat_item", t.is_trans_out_concat_item),
            is_trans_out_by_mlp=get_bool("model", "transformer_is_trans_out_by_mlp", t.is_trans_out_by_mlp),
            is_decoder_add_pos_emb=get_bool("model", "transformer_is_decoder_add_pos_emb", t.is_decoder_add_pos_emb),
        )

        def weights(option, default):
            v = get("class_weight", option)
            return default if v is None else parse_class_weights(v)

        tag = os.path.basename(path)
        if tag.endswith(".conf"):
            tag = tag[: -len(".conf")]

        cfg = cls(
            model_type=get("model", "model_type", d.model_type),
            feature_dimension=get_int("model", "feature_dimension", d.feature_dimension),
            output_units=get_int("model", "output_units", d.output_units),
            hidden_units=parse_csv_ints(get("model", "hidden_units", "") or "") or d.hidden_units,
            hidden_units_bottom=parse_csv_ints(get("model", "hidden_units_bottom", "") or "") or d.hidden_units_bottom,
            hidden_units_task=parse_csv_ints(get("model", "hidden_units_task", "") or "") or d.hidden_units_task,
            hidden_units_bias=parse_csv_ints(get("model", "hidden_units_bias", "") or "") or d.hidden_units_bias,
            num_experts=get_int("model", "num_experts", d.num_experts),
            is_use_feature=get_bool("model", "is_use_feature", d.is_use_feature),
            optimizer=get("model", "optimizer", d.optimizer),
            dropout=parse_csv_floats(get("model", "dropout", "") or "") or d.dropout,
            dropout_bottom=parse_csv_floats(get("model", "dropout_bottom", "") or "") or d.dropout_bottom,
            dropout_task=parse_csv_floats(get("model", "dropout_task", "") or "") or d.dropout_task,
            dropout_rate_bias=parse_csv_floats(get("model", "dropout_rate_bias", "") or "") or d.dropout_rate_bias,
            is_bn=get_bool("model", "is_bn", d.is_bn),
            bn_decay=get_float("model", "bn_decay", d.bn_decay),
            is_dropout=get_bool("model", "is_dropout", d.is_dropout),
            wnd_wd=get_float("model", "wnd_wd", d.wnd_wd),
            l2_emb_lambda=get_float("model", "l2_emb_lambda", d.l2_emb_lambda),
            epoch_num=get_int("model", "epoch_num", d.epoch_num),
            batch_size=get_int("model", "batch_size", d.batch_size),
            test_batch_size=get_int("model", "test_batch_size", d.test_batch_size),
            validation_batch_size=get_int("model", "validation_batch_size", d.validation_batch_size),
            validate_step=get_int("model", "validate_step", d.validate_step),
            shuffle_size=get_int("model", "shuffle_size", d.shuffle_size),
            total_example_num=get_int("model", "total_example_num", d.total_example_num),
            max_iter_step=get_int("model", "max_iter_step", d.max_iter_step),
            learning_rate=parse_csv_floats(get("model", "learning_rate", "") or "") or d.learning_rate,
            step_boundary=parse_csv_ints(get("model", "step_boundary", "") or "") or d.step_boundary,
            loss_weight=parse_csv_floats(get("parameter", "loss_weight", "") or "") or d.loss_weight,
            loss_weight_method=get("parameter", "loss_weight_method", d.loss_weight_method),
            loss_unbias_method=get("model", "loss_unbias_method", d.loss_unbias_method),
            loss_ctr_rel_method=get("model", "loss_ctr_rel_method", d.loss_ctr_rel_method),
            single_task_raw_label=get_bool("model", "single_task_raw_label", d.single_task_raw_label),
            export_weight=parse_csv_floats(get("export_model", "export_weight", "") or "") or d.export_weight,
            export_int8_rows=get_int("export_model", "export_int8_rows",
                                     d.export_int8_rows),
            weight_ctr=weights("weight_ctr", d.weight_ctr),
            weight_ecvr=weights("weight_ecvr", d.weight_ecvr),
            train_weight=weights("train_weight", d.train_weight),
            valid_weight=weights("valid_weight", d.valid_weight),
            propensity_em=get_bool("model", "propensity_em", d.propensity_em),
            propensity_em_type=get("model", "propensity_em_type", d.propensity_em_type),
            transformer=transformer,
            zero_pad=get_bool("model", "zero_pad", d.zero_pad),
            embeddings=parse_embedding_spec(get("embedding", "emb", "") or ""),
            embeddings_bias=parse_embedding_spec(get("embedding", "emb_bias", "") or ""),
            attention_pairs=parse_attention_pairs(get("embedding", "attention_embed", "") or ""),
            attention_ts=parse_ts_features(get("embedding", "attention_embed_seq_ts", "") or ""),
            sim_embed=parse_sim_pairs(get("embedding", "sim_embed", "") or ""),
            update_emb=get("embedding", "update_emb", "") or "",
            header_schema=tuple(s.strip() for s in (get("schema", "header_schema", ",".join(d.header_schema))).split(",")),
            output_path=get("path", "output_path", d.output_path) or "",
            summary_path=get("path", "summary_path", d.summary_path) or "",
            train_data_path=get("path", "train_data_path", d.train_data_path) or "",
            train_data_mean_path=get("path", "train_data_mean_path", d.train_data_mean_path) or "",
            train_data_std_path=get("path", "train_data_std_path", d.train_data_std_path) or "",
            train_data_stat_path=get("path", "train_data_stat_path", d.train_data_stat_path) or "",
            validation_data_path=get("path", "validation_data_path", d.validation_data_path) or "",
            test_data_path=get("path", "test_data_path", d.test_data_path) or "",
            test_data_path_ord=get("path", "test_data_path_ord", d.test_data_path) or "",
            checkpoint=get("path", "checkpoint", d.checkpoint) or "",
            vocab_path=get("path", "vocab_path", d.vocab_path) or "",
            tag=tag,
        )
        if overrides:
            cfg = cfg.replace(**overrides)
        return cfg

    def recompute_max_steps(self, label_counts: tuple[int, ...], num_replicas: int = 1) -> "DMTConfig":
        """Cap max_iter_step by epochs*examples/(batch*replicas).

        Reference recsys_conf.py:144-151 derives the step budget from the
        label-count stat file; ``num_replicas`` generalizes the reference's
        GPU count to mesh data-parallel size.
        """
        total = sum(label_counts)
        total_step = int(self.epoch_num * total / (self.batch_size * max(1, num_replicas)))
        return self.replace(
            total_example_num=total,
            max_iter_step=min(self.max_iter_step, total_step),
        )
