"""Warm-starting embedding tables from pretrained arrays.

Reference: ``base.embedding_update`` loads pickled numpy tables via a
placeholder assign at session start (reference model/net/base.py:178-196,
triggered by the ``update_emb`` config DSL ``Table:path#...``,
recsys_conf.py:330-338, run_dnn.py:298-299).

Here it is a pure function on the param tree: each named table is replaced
by the array loaded from ``<path>.pickle`` / ``.npy`` / ``.npz``.
"""

from __future__ import annotations

import os
import pickle
from typing import Mapping

import numpy as np


def load_pretrained_table(path: str) -> np.ndarray:
    """Load one table; reference used ``np.load(path + '.pickle')``."""
    for candidate in (path, path + ".pickle", path + ".npy", path + ".npz"):
        if os.path.exists(candidate):
            if candidate.endswith(".pickle") or candidate.endswith(".pkl"):
                with open(candidate, "rb") as f:
                    return np.asarray(pickle.load(f), np.float32)
            arr = np.load(candidate, allow_pickle=True)
            if isinstance(arr, np.lib.npyio.NpzFile):
                arr = arr[arr.files[0]]
            return np.asarray(arr, np.float32)
    raise FileNotFoundError(f"no pretrained table at {path}[.pickle|.npy|.npz]")


def warm_start_embeddings(params: dict,
                          table_paths: Mapping[str, str],
                          cfg=None) -> dict:
    """Return params with the named embedding tables replaced.

    Pretrained arrays are LOGICAL [rows, dim]; they are packed to the
    physical layout when cfg.packed_tables.  Shape must match the
    configured table exactly (the reference's assign would likewise fail).
    """
    if not table_paths:
        return params
    emb = dict(params.get("emb", {}))
    for name, path in table_paths.items():
        if name not in emb:
            raise KeyError(f"unknown embedding table {name!r}; "
                           f"have {sorted(emb)}")
        arr = load_pretrained_table(path)
        if (cfg is not None and cfg.packed_tables
                and arr.shape[0] >= cfg.pack_rows_threshold):
            import jax.numpy as jnp

            from ..nn.embedding import pack_table
            arr = np.asarray(pack_table(jnp.asarray(arr)))
        want = tuple(emb[name].shape)
        if tuple(arr.shape) != want:
            raise ValueError(
                f"pretrained table {name}: shape {arr.shape} != {want}")
        emb[name] = arr
    out = dict(params)
    out["emb"] = emb
    return out


def parse_update_emb(spec: str) -> dict[str, str]:
    """``Table:path#Table2:path2`` -> {table: path}
    (reference get_emb_init_info, recsys_conf.py:330-338)."""
    out: dict[str, str] = {}
    for item in spec.split("#"):
        fields = item.split(":")
        if len(fields) != 2:
            continue
        out[fields[0]] = fields[1]
    return out
