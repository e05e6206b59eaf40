"""Orbax checkpoint / resume of the full GAN training state.

The reference saves only generator/critic weights per epoch and has no resume
path (no optimizer state, SURVEY.md §5).  Here one checkpoint holds the whole
`GANTrainState` pytree (both param sets, both Adam states, PRNG key, step), so
restart is exact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from prdisagg_tpu.train.state import GANTrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state: GANTrainState, wait: bool = True) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: GANTrainState,
                epoch: Optional[int] = None) -> GANTrainState:
        """Restore into the structure of `state_like` (a freshly created
        state with the same configs)."""
        epoch = self._mgr.latest_step() if epoch is None else epoch
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.close()
