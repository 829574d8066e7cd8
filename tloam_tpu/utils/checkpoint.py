"""Checkpoint / resume for the odometry pipeline.

The reference DECLARES save services but never implements them
(srv/saveMap.srv, srv/saveOdometry.srv — no advertiseService exists;
SURVEY.md §5). Here checkpointing is real: the full OdometryState pytree
(submap buffers, poses, motion model) plus the trajectory-so-far round-trips
through one .npz, enabling resume-at-frame-k.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_state(path: str | Path, state, poses: np.ndarray) -> None:
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(str(path), poses=np.asarray(poses), **arrays)


def load_state(path: str | Path, template):
    """Restore a state saved by save_state; `template` provides the pytree
    structure (e.g. frontend.init_state(cfg)). Returns (state, poses)."""
    data = np.load(str(path))
    treedef = jax.tree.structure(template)
    n = treedef.num_leaves
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    t_leaves = jax.tree.leaves(template)
    leaves = [l.astype(t.dtype) for l, t in zip(leaves, t_leaves)]
    return jax.tree.unflatten(treedef, leaves), data["poses"]
