"""Checkpoint / resume for training state.

The reference has no compute-side checkpointing (its only persisted state is
the weight blobs, SURVEY.md section 5). Training introduced in core/train.py
needs real resume: orbax-backed save/restore of the full TrainState
(params + optimizer state + step), plus the blob exporters in
core/weights.py for deployment back into the reference's formats.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from spleeterrt_tpu.core.train import TrainState


def save(path: str | os.PathLike, state: TrainState) -> None:
    """Write a checkpoint directory (overwrites)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = jax.tree.map(np.asarray, state)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str | os.PathLike, template: TrainState) -> TrainState:
    """Restore into the structure/shardings of `template`."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def latest_step_dir(root: str | os.PathLike) -> str | None:
    """Resolve the newest step_N subdirectory under a checkpoint root."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append((int(name[5:]), name))
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])
