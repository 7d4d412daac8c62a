"""Orbax checkpointing: atomic, multi-host-safe save/resume.

Replaces the reference's hand-rolled tar-dict checkpoints with `module.`-prefix
remapping (`Diffusion_Stage/trainers/ddpm_trainer.py:290-319`; stage-1 raw
`state_dict` saves `Contrastive_Stage/M2SNet_eval.py:118-119`) and its
manual-restart-only recovery story (SURVEY.md §5.3): Orbax writes are atomic,
versioned by step, and restore onto a pytree template — no wrapper-class
naming churn possible.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def restore_raw(ckpt_dir: str) -> Any:
    """Restore a checkpoint as a raw pytree (no template) for cross-stage
    grafting — e.g. pulling `music_encoder`/`motion_encoder` subtrees out of a
    stage-1 run (`transformer.py:394-401`).  Accepts either a concrete step
    directory or a CheckpointManager root (resolves to the latest step)."""
    path = os.path.abspath(ckpt_dir)
    if not os.path.exists(os.path.join(path, "_METADATA")):
        steps = sorted(
            (int(d) for d in os.listdir(path) if d.isdigit()), reverse=True
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        path = os.path.join(path, str(steps[0]))
        # CheckpointManager nests the pytree under a 'default' item
        if os.path.isdir(os.path.join(path, "default")):
            path = os.path.join(path, "default")
    return ocp.StandardCheckpointer().restore(path)


class CheckpointManager:
    """Step-versioned checkpoints of an arbitrary state pytree."""

    def __init__(self, directory: str, max_to_keep: int | None = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, *, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        """Restore onto a template pytree (e.g. a freshly built TrainState) so
        shapes/dtypes/shardings are taken from the template."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
