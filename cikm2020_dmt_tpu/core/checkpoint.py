"""Checkpoint manager: Orbax-backed, reference save/marker contract.

Reference contract (run_dnn.py:258-261,379-388,409-429,447-449):
- save every ``validate_step`` steps as ``model.ckpt-{step}``
- touch a ``step-{step}.model.DONE`` marker the evaluator polls for
- keep every checkpoint (max_to_keep=0)
- resume step is parsed from the checkpoint name

Here each checkpoint is an Orbax PyTree directory
``{model_path}/model.ckpt-{step}`` holding params/state/opt_state, plus the
same DONE marker files, so the chief/evaluator filesystem protocol carries
over unchanged.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"model\.ckpt-(\d+)$")


def step_from_name(name: str) -> Optional[int]:
    m = _CKPT_RE.search(name)
    return int(m.group(1)) if m else None


class CheckpointManager:
    def __init__(self, model_path: str):
        self.model_path = os.path.abspath(model_path)
        os.makedirs(self.model_path, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    # -- paths ----------------------------------------------------------
    def ckpt_dir(self, step: int) -> str:
        return os.path.join(self.model_path, f"model.ckpt-{step}")

    def marker_path(self, step: int) -> str:
        return os.path.join(self.model_path, f"step-{step}.model.DONE")

    # -- save / restore -------------------------------------------------
    def save(self, step: int, tree: Any) -> str:
        """Save a pytree (numpy or jax.Arrays — sharded arrays write only
        each process's addressable shards).  The DONE marker is written by
        process 0 only, after Orbax's cross-process commit barrier, so the
        evaluator never sees a half-written checkpoint."""
        path = self.ckpt_dir(step)
        self._ckpt.save(path, tree, force=True)
        if jax.process_index() == 0:
            with open(self.marker_path(step), "w") as f:
                f.write(str(step))
        return path

    def restore(self, step: int, template: Any = None) -> Any:
        path = self.ckpt_dir(step)
        if template is not None:
            return self._ckpt.restore(path, item=template)
        return self._ckpt.restore(path)

    def has_step(self, step: int) -> bool:
        return os.path.isdir(self.ckpt_dir(step)) and \
            os.path.exists(self.marker_path(step))

    # -- discovery (reference get_ckpt_from_fs, run_dnn.py:409-429) -----
    def all_steps(self) -> list[int]:
        steps = []
        if not os.path.isdir(self.model_path):
            return steps
        for name in os.listdir(self.model_path):
            s = step_from_name(name)
            if s is not None and os.path.isdir(os.path.join(self.model_path, name)):
                steps.append(s)
        return sorted(steps)

    def newest_step_after(self, step: int) -> Optional[int]:
        """Newest *completed* (DONE-marked) step greater than ``step``."""
        done = [s for s in self.all_steps()
                if s > step and os.path.exists(self.marker_path(s))]
        return max(done) if done else None

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None
