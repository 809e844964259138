"""Sharded checkpoint save/load + tracker manifest + retention GC.

Covers both reference systems (SURVEY.md §5 "Checkpoint / resume"):
  (a) openmatch HF-Trainer saves (dense_trainer.py:67-105) → here: params in
      Orbax (sharded arrays) + config json;
  (b) verl per-rank sharded model/optim/extra + checkpoint_tracker.json +
      keep-best/save-limit GC (checkpoint_manager.py:111-167,
      fsdp_checkpoint_manager.py:56-123) → here: one Orbax tree holds
      params/opt_state/step/rng/dataloader state; tracker manifest and GC are
      file-level.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f"global_step_{step}")


def save_checkpoint(root: str, step: int, tree: Any, *,
                    extra: Optional[dict] = None,
                    best_metric: Optional[float] = None,
                    save_limit: Optional[int] = None) -> str:
    """Save a pytree (params/opt_state/...) at `root/global_step_{step}`.

    extra: small JSON-serializable host state (dataloader position, rng seeds).
    Updates checkpoint_tracker.json {last_step, best_step, best_metric} and
    applies keep-(best+latest) retention like the reference GC.
    """
    import orbax.checkpoint as ocp

    path = _ckpt_dir(root, step)
    os.makedirs(root, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    if extra is not None:
        with open(os.path.join(path, "extra_state.json"), "w") as f:
            json.dump(extra, f)

    tracker_path = os.path.join(root, "checkpoint_tracker.json")
    tracker = {}
    if os.path.exists(tracker_path):
        with open(tracker_path) as f:
            tracker = json.load(f)
    tracker["last_step"] = step
    if best_metric is not None:
        if ("best_metric" not in tracker or
                best_metric >= tracker.get("best_metric", -np.inf)):
            tracker["best_metric"] = best_metric
            tracker["best_step"] = step
    with open(tracker_path, "w") as f:
        json.dump(tracker, f)

    if save_limit is not None:
        gc_checkpoints(root, save_limit)
    return path


def find_latest_ckpt(root: str) -> Optional[str]:
    """Reference find_latest_ckpt via tracker json (checkpoint_manager.py:111-135)."""
    tracker_path = os.path.join(root, "checkpoint_tracker.json")
    if not os.path.exists(tracker_path):
        return None
    with open(tracker_path) as f:
        tracker = json.load(f)
    step = tracker.get("last_step")
    if step is None:
        return None
    path = _ckpt_dir(root, step)
    return path if os.path.exists(path) else None


def gc_checkpoints(root: str, save_limit: int) -> None:
    """Keep the newest `save_limit` checkpoints, never deleting best_step
    (reference remove_obsolete_ckpt, checkpoint_manager.py:138-167)."""
    tracker_path = os.path.join(root, "checkpoint_tracker.json")
    best = None
    if os.path.exists(tracker_path):
        with open(tracker_path) as f:
            best = json.load(f).get("best_step")
    steps = []
    for name in os.listdir(root):
        m = re.fullmatch(r"global_step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    steps.sort(reverse=True)
    for step in steps[save_limit:]:
        if step == best:
            continue
        shutil.rmtree(_ckpt_dir(root, step), ignore_errors=True)


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Restore (tree, extra). With `target` given, arrays are restored with the
    target's shardings/dtypes (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        tree = ckptr.restore(os.path.abspath(path), item=target)
    else:
        tree = ckptr.restore(os.path.abspath(path))
    extra = None
    epath = os.path.join(path, "extra_state.json")
    if os.path.exists(epath):
        with open(epath) as f:
            extra = json.load(f)
    return tree, extra
