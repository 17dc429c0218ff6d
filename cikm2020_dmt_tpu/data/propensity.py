"""Inverse-propensity tables for unbiased learning-to-rank.

The reference hard-codes EM-estimated propensity arrays
(``propensity_em_position`` — 401 entries indexed by clipped display
position, ``propensity_em_page`` — 101 entries indexed by clipped page)
in util/util_unbias.py:2-11, and derives per-example IPS weights
``clip(1/p, 1, 10)`` in the input pipeline
(reference data_feed/tfrecord_mask.py:70-81).

These arrays are *data* (model estimates), not code, so we do not vendor
them: they load at runtime from a configured file in the same Python-literal
format.  Without a file, propensities default to 1.0 (=> IPS weight 1.0,
i.e. IPS disabled), matching the fact that the reference's shipped training
path never consumes the weight either (SURVEY.md §2.4.3).
"""

from __future__ import annotations

import ast
import re

import numpy as np

MAX_POSITION = 400  # reference tfrecord_mask.py:65
MAX_PAGE = 100      # reference tfrecord_mask.py:67

_ASSIGN_RE = re.compile(rb"(propensity_em\w*)\s*=\s*(\[)", re.S)


def load_propensity_file(path: str) -> dict[str, np.ndarray]:
    """Parse ``name = [ ... ]`` float-list literals from a python file."""
    with open(path, "rb") as f:
        src = f.read()
    out: dict[str, np.ndarray] = {}
    for m in _ASSIGN_RE.finditer(src):
        name = m.group(1).decode()
        start = m.start(2)
        depth = 0
        for i in range(start, len(src)):
            c = src[i:i + 1]
            if c == b"[":
                depth += 1
            elif c == b"]":
                depth -= 1
                if depth == 0:
                    literal = src[start:i + 1].decode()
                    out[name] = np.asarray(ast.literal_eval(literal), dtype=np.float32)
                    break
    return out


class PropensityModel:
    """Position/page -> propensity -> clipped IPS weight."""

    def __init__(self, em_type: str = "page", table: np.ndarray | None = None):
        self.em_type = em_type
        size = (MAX_POSITION if em_type == "position" else MAX_PAGE) + 1
        if table is None:
            table = np.ones((size,), dtype=np.float32)
        self.table = np.asarray(table, dtype=np.float32)

    @classmethod
    def from_file(cls, path: str, em_type: str) -> "PropensityModel":
        tables = load_propensity_file(path)
        key = f"propensity_em_{em_type}"
        return cls(em_type, tables.get(key))

    def weights(self, positions: np.ndarray, pages: np.ndarray, labels: np.ndarray):
        """Returns (propensity, weight, weight_positive, weight_mul) —
        the four derived features of reference tfrecord_mask.py:70-81."""
        idx = positions if self.em_type == "position" else pages
        idx = np.minimum(idx, len(self.table) - 1)
        p = self.table[idx]
        w = np.clip(1.0 / np.maximum(p, 1e-12), 1.0, 10.0).astype(np.float32)
        w_pos = np.where(labels > 0.5, w, np.float32(1.0)).astype(np.float32)
        return p, w, w_pos, w
