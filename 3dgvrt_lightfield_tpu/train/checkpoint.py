"""Checkpoint / resume for the fine-tune loop.

The reference has no training and therefore no checkpoints (SURVEY.md §5:
model load is a `.ply` parse, base/Vulkan3DGRTModel.cpp:7-125); the persisted
artifacts are images/CSVs only.  The TPU framework adds a training loop, so it
adds durable train state: orbax-backed checkpoints of
(GaussianModel, optimizer state, step), plus `.ply` export of the model for
cross-validation in the reference viewer (Vulkan3DGRTModel.cpp expects the
INRIA property layout, which GaussianModel.to_ply writes).

Layout on disk:
    <dir>/step_<N>/      orbax PyTree checkpoint (atomic, resumable)
    <dir>/latest.txt     step number of the newest complete checkpoint
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..models.gaussians import GaussianModel


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Tuple[GaussianModel, Any],
                    step: int) -> str:
    """Save (model, opt_state) at `step`. Returns the checkpoint path."""
    model, opt_state = state
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, {"model": model, "opt_state": opt_state,
                                "step": np.int64(step)}, force=True)
    with open(os.path.join(os.path.abspath(ckpt_dir), "latest.txt"), "w") as f:
        f.write(str(step))
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    marker = os.path.join(ckpt_dir, "latest.txt")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_checkpoint(ckpt_dir: str, state: Tuple[GaussianModel, Any],
                       step: Optional[int] = None):
    """Restore (model, opt_state, step); `state` provides the tree structure.

    Returns (state, step) or (state, None) if no checkpoint exists.
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return state, None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    model, opt_state = state
    template = {"model": model, "opt_state": opt_state,
                "step": np.int64(step)}
    restored = _checkpointer().restore(path, item=template)
    return (restored["model"], restored["opt_state"]), int(restored["step"])
