"""Reference-on-demo quality oracle: run the ACTUAL reference TF1 code
(/root/reference/DMT_code) on the JD demo shards and record its test AUC
as the quality-parity target (BASELINE.json: "match the reference's test
AUC per task within run-to-run variance"; VERDICT r2 next-round #3).

    env -u PALLAS_AXON_POOL_IPS python scripts/reference_oracle.py \
        [--steps 185] [--batch 256] [--smoke]

Nothing from the reference tree is copied into this repo: the reference
modules are imported IN PLACE from /root/reference/DMT_code under a
3-function ``tf.contrib`` compatibility shim (TF 2.21's tf.compat.v1
covers everything else the reference uses):

    tf.contrib.lookup.index_table_from_tensor  (kwarg mapping->vocabulary_list,
        backed by tensorflow.python.ops.lookup_ops — same op, same
        Fingerprint64 OOV hashing as TF 1.12)
    tf.contrib.layers.xavier_initializer       -> glorot_uniform (same math)
    tf.contrib.layers.l2_regularizer           -> scale * l2_loss (same math)

plus a synthetic ``idtables.Sku`` module with vocab ['unknow'] (the Sku
vocab was withheld upstream, SURVEY.md §2.4.2 — all sku ids hash into the
OOV bucket range, which is the only consistent reading of
``Sku:N:32`` + a missing table) and a Session wrapper that turns on
allow_soft_placement so the reference's hard /gpu:0 pins fall back to CPU.

The conf is the reference's own conf/settings/dmt.conf with ONLY
demo-required edits applied at runtime (never committed): demo data paths,
ord_seq_*_12m_50 -> _12m_10 (the names the demo shards actually carry,
SURVEY.md §2.4.9), Sku 5M -> 1M (matching conf/dmt_demo.conf), batch/step
counts.  Training runs the reference's own run_dnn.train() (run_dnn.py:
111-388); eval mirrors run_dnn.predict()'s graph (run_dnn.py:652-830)
without its broken tail (SURVEY.md §2.4.5).

Output: out/reference_oracle/oracle_results.json with streaming + overall
+ grouped AUC per task — the numbers PARITY.md quotes next to ours.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import re
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/DMT_code"
OUT = os.path.join(REPO, "out", "reference_oracle")


def install_shim():
    """tf.compat.v1 + the 3 contrib functions the reference calls."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()

    from tensorflow.python.ops import lookup_ops

    def _index_table_from_tensor(mapping=None, **kw):
        # TF2 renamed `mapping` -> `vocabulary_list`; same op underneath
        return lookup_ops.index_table_from_tensor(vocabulary_list=mapping,
                                                  **kw)

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.lookup = types.SimpleNamespace(
        index_table_from_tensor=_index_table_from_tensor)
    contrib.layers = types.SimpleNamespace(
        # contrib xavier_initializer() == glorot_uniform (uniform fan-avg)
        xavier_initializer=lambda: tf.glorot_uniform_initializer(),
        # contrib l2_regularizer(s)(w) == s * sum(w^2)/2 == s * l2_loss(w)
        l2_regularizer=lambda scale: (lambda w: scale * tf.nn.l2_loss(w)))
    tf.contrib = contrib

    # Keras-3 removed tf.layers; the reference uses exactly two of them.
    # TF1-semantics reimplementations on get_variable (names uniquified
    # through variable_scope default_name, so train and eval graphs built
    # by THIS harness resolve to the same checkpoint keys):
    def _dense(inputs=None, units=None, activation=None, use_bias=True,
               name=None, **_kw):
        def build():
            in_dim = int(inputs.shape[-1])
            kernel = tf.get_variable(
                "kernel", [in_dim, units],
                initializer=tf.glorot_uniform_initializer())
            rank = len(inputs.shape)
            out = (tf.matmul(inputs, kernel) if rank == 2 else
                   tf.tensordot(inputs, kernel, [[rank - 1], [0]]))
            if use_bias:
                bias = tf.get_variable("bias", [units],
                                       initializer=tf.zeros_initializer())
                out = out + bias
            return activation(out) if activation is not None else out

        if name is None:
            with tf.variable_scope(None, default_name="dense"):
                return build()
        with tf.variable_scope(name):
            return build()

    def _dropout(inputs=None, rate=0.5, training=False, **_kw):
        if isinstance(training, bool):
            return tf.nn.dropout(inputs, rate=rate) if training else inputs
        return tf.cond(training,
                       lambda: tf.nn.dropout(inputs, rate=rate),
                       lambda: inputs)

    tf.layers = types.SimpleNamespace(dense=_dense, dropout=_dropout)

    # the reference pins towers to /gpu:N; soft placement falls back to CPU
    real_session = tf.Session

    class SoftSession(real_session):
        def __init__(self, target="", graph=None, config=None):
            config = config or tf.ConfigProto()
            config.allow_soft_placement = True
            super().__init__(target, graph, config)

    tf.Session = SoftSession

    sys.modules["tensorflow"] = tf
    sys.modules["tensorflow.contrib"] = contrib

    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "conf"))

    # synthetic Sku idtable (vocab withheld upstream, SURVEY.md §2.4.2)
    import idtables  # noqa: F401  (registers the package)
    sku = types.ModuleType("idtables.Sku")
    sku.ID_TABLES = {"Sku": ["unknow"]}
    sys.modules["idtables.Sku"] = sku
    return tf


def write_conf(steps: int, batch: int, holdout: bool = False) -> None:
    """Patch the reference's own dmt.conf for the demo shards (runtime
    artifact under out/, never committed).

    holdout=True: train on shard part-r-00000 ONLY, test on part-r-00001
    — a real generalization split instead of the train==test memorization
    runs.  recsys_conf.py forces a trailing '/' onto every data path (and
    tfrecord_mask.py:101 then appends '*'), so per-shard selection needs
    real DIRECTORIES: out/ gets holdout_{train,test}/ dirs holding one
    symlink each into the read-only demo tree."""
    src = open(os.path.join(REF, "conf/settings/dmt.conf")).read()
    demo = "/root/reference/jd_recsys_demo"
    data = f"{demo}/*/test_ord/*/data/"
    if holdout:
        import glob as globlib
        shards = sorted(globlib.glob(data + "part-r-*"))
        assert len(shards) == 2, shards

        def link_dir(name: str, shard: str) -> str:
            d = os.path.join(OUT, name)
            os.makedirs(d, exist_ok=True)
            link = os.path.join(d, os.path.basename(shard))
            if not os.path.islink(link):
                os.symlink(shard, link)
            return d + "/"

        train_p = link_dir("holdout_train", shards[0])
        test_p = link_dir("holdout_test", shards[1])
    else:
        train_p = test_p = data
    for pat, rep in [
        (r"gpu_visible = 0,1,2,3", "gpu_visible = 0"),
        (r"batch_size = 2048", f"batch_size = {batch}"),
        (r"test_batch_size = 4096", "test_batch_size = 512"),
        (r"validation_batch_size = 4096", "validation_batch_size = 512"),
        (r"validate_step = 1000", f"validate_step = {steps}"),
        (r"epoch_num = 2", "epoch_num = 1000"),
        (r"max_iter_step = 10000000", f"max_iter_step = {steps}"),
        (r"Sku:5000000", "Sku:1000000"),
        (r"_12m_50", "_12m_10"),
        (r"output_path = .*", f"output_path = {OUT}/"),
        (r"summary_path = .*", f"summary_path = {OUT}/summary/"),
        (r"train_data_path = .*",
         f"train_data_path = {train_p}"),
        (r"train_data_mean_path = .*",
         f"train_data_mean_path = {demo}/stat/mean/part-00000"),
        (r"train_data_stat_path = .*", "train_data_stat_path = "),
        (r"train_data_std_path = .*",
         f"train_data_std_path = {demo}/stat/std/part-00000"),
        (r"validation_data_path = .*",
         f"validation_data_path = {train_p}"),
        (r"test_data_path = .*", f"test_data_path = {test_p}"),
        (r"test_data_path_ord = .*",
         f"test_data_path_ord = {test_p}"),
    ]:
        src = re.sub(pat, rep, src)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "oracle.conf"), "w") as f:
        f.write(src)


def run_train(tf, log) -> float:
    import recsys_conf as conf_mod
    import run_dnn
    wnd_conf = conf_mod.Conf(OUT + "/", "oracle.conf")
    t0 = time.time()
    with contextlib.redirect_stdout(log):
        run_dnn.train(wnd_conf, "model.ckpt-0")
    return time.time() - t0


def run_eval(tf, steps: int, log) -> dict:
    """Mirror run_dnn.predict()'s scoring graph (run_dnn.py:652-830,
    test_score_method='rel'), then the reference's own offline metrics."""
    import numpy as np
    import recsys_conf as conf_mod
    from data_feed import index_tables as lookup
    from data_feed import tfrecord_mask as tfrecord
    from metrics import metrics
    from model import inference_mlp as inference
    from run_dnn import cal_ctr_cvr
    from sklearn.metrics import roc_auc_score

    # TF1.12-era sklearn RAISED on single-class groups, which the
    # reference's cal_auc turns into 1.0 (metrics.py:68-73); modern sklearn
    # warns and returns NaN instead, which would poison the group average.
    # Restore the old contract inside the reference's module only.
    _orig_auc = metrics.roc_auc_score

    def _strict_auc(y_true, y_score, **kw):
        if len(np.unique(np.asarray(y_true))) < 2:
            raise ValueError("Only one class present in y_true")
        return _orig_auc(y_true, y_score, **kw)

    metrics.roc_auc_score = _strict_auc

    tf.reset_default_graph()
    wnd_conf = conf_mod.Conf(OUT + "/", "oracle.conf")
    with contextlib.redirect_stdout(log):
        tables = lookup.LookupTables(wnd_conf)
        test_path = wnd_conf[conf_mod.PATH]["test_data_path_ord"]
        labels_t, header_t, mask_t, features_t = tfrecord.get_val_test_batch(
            file_path=test_path, EPOCH_NUM=1,
            batch_size=wnd_conf[conf_mod.MODEL][conf_mod.TEST_BATCH_SIZE],
            wnd_conf=wnd_conf, lookup_tables=tables)
        inf = inference.Inference(wnd_conf)
        with tf.variable_scope("DnnModel"):
            logits = inf.inference(features_t, is_train=False)
            y_rel, _y_bias = logits
            p_ctr_t, p_cvr_t = cal_ctr_cvr(y_rel)

        var_list = [v for v in tf.global_variables() if "moving" in v.name]
        var_list += tf.trainable_variables()
        saver = tf.train.Saver(var_list=var_list)

    all_clk, all_ord, all_mask, all_hdr = [], [], [], []
    with tf.Session() as sess:
        sess.run(tf.tables_initializer())
        # MODEL_PATH = output_path + tag + '.model/' (recsys_conf.py:106)
        saver.restore(sess, os.path.join(OUT, "oracle.model",
                                         f"model.ckpt-{steps}"))
        while True:
            try:
                pc, po, mk, hd = sess.run(
                    [p_ctr_t, p_cvr_t, mask_t, header_t])
            except tf.errors.OutOfRangeError:
                break
            all_clk.append(pc.reshape(-1))
            all_ord.append(po.reshape(-1))
            all_mask.append(mk)
            all_hdr.extend(hd.tolist())

    p_clk = np.concatenate(all_clk)
    p_ord = np.concatenate(all_ord)
    mask = np.concatenate(all_mask)
    # ground truth the way the reference's own streaming metrics define it
    # (run_dnn.py:221-241): click = mask classes {1,2,4,5}, order = {4,5};
    # the demo TFRecords' scalar `label` field is binarized and unusable
    # for per-task AUC (the header carries the 5-valued label instead)
    y_clk = (mask[:, 1:5].sum(axis=1) > 0).astype(np.int8)
    y_ord = (mask[:, 3] + mask[:, 4] > 0).astype(np.int8)
    hdr_label = np.array(
        [int(h.decode().strip().split("\t")[9]) for h in all_hdr])
    total = p_clk + p_ord  # reference total score (run_dnn.py:833-849)

    header_schema = wnd_conf[conf_mod.SCHEMA][conf_mod.HEADER_SCHEMA]
    with contextlib.redirect_stdout(log):
        grouped = metrics.get_offline_metrics_auc(
            header_schema, all_hdr, total)
    res = {
        # streaming convention (mask labels, per-head scores) — compare
        # with our test_streaming click_auc/order_auc
        "streaming_auc": {"click": float(roc_auc_score(y_clk, p_clk)),
                          "order": float(roc_auc_score(y_ord, p_ord))},
        # offline convention (header label thresholds >=2/>=5, total
        # score) — compare with our test_overall_auc
        "overall_auc": {
            "click": float(roc_auc_score(
                (hdr_label >= 2).astype(np.int8), total)),
            "order": float(roc_auc_score(
                (hdr_label >= 5).astype(np.int8), total))},
        "grouped_auc": {str(k): float(np.asarray(v).reshape(()))
                        for k, v in grouped.items()},
        "n": int(mask.shape[0]),
        "pos_click": int(y_clk.sum()), "pos_order": int(y_ord.sum()),
    }
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=185)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--smoke", action="store_true",
                    help="3 steps, tiny batch — plumbing check only")
    ap.add_argument("--holdout", action="store_true",
                    help="train on part-r-00000 only, test on part-r-00001")
    args = ap.parse_args(argv)
    if args.smoke:
        args.steps, args.batch = 3, 64

    tf = install_shim()
    write_conf(args.steps, args.batch, holdout=args.holdout)
    log_path = os.path.join(OUT, "oracle.log")
    with open(log_path, "w") as log:
        print(f"training reference {args.steps} steps @ batch {args.batch} "
              f"(log: {log_path})", flush=True)
        train_s = run_train(tf, log)
        print(f"reference train done in {train_s:.0f}s "
              f"({args.steps * args.batch / train_s:.0f} ex/s)", flush=True)
        res = run_eval(tf, args.steps, log)
    res["train_seconds"] = round(train_s, 1)
    res["train_examples_per_s"] = round(args.steps * args.batch / train_s, 1)
    res["steps"], res["batch"] = args.steps, args.batch
    res["holdout"] = args.holdout
    with open(os.path.join(OUT, "oracle_results.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
