"""Orbax checkpointing for train states.

Replaces the reference's filename-encoded torch checkpoints
(/root/reference/training_loop_single.py:316-371: `model{step:09d}.pt`,
step parsed back out of the name, optimizer state saved but never restored;
AE side /root/reference/AutoEncoder/trainers/encdec.py:299-341). Here the
step lives in the state itself, optimizer state round-trips, and saves are
async (Orbax) so the TPU never waits on host I/O.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in (self.manager.all_steps() or ()):  # already on disk
            if not force:
                return False
            # force=True re-saves over an existing step (e.g. after a
            # partial/corrupt write); Orbax's own force never overwrites, so
            # drop the old step first
            self.manager.wait_until_finished()
            self.manager.delete(step)
        return self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_template` (abstract or real)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def save_params_npz(path: str, params) -> None:
    """Flat npz export of a param pytree (for weight interchange/debug)."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str, template):
    """Inverse of save_params_npz against a matching template pytree."""
    import numpy as np

    with np.load(path) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kp, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            arr = z[key]
            assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
            leaves.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)
