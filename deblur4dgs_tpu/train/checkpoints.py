"""Checkpoint save/restore (counterpart of trainer.py:126-178).

The reference torch.saves a dict {model, optimizers, schedulers,
global_step, epoch, move_model}; here the entire TrainState is one pytree,
saved with orbax. Stage handoff (stage 2 lifting only bg params + move
model from stage 1, run_training_dynamic.py:588-599) is a pytree surgery
helper rather than a state-dict key dance.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from deblur4dgs_tpu.models.scene import SceneModel
from deblur4dgs_tpu.train.trainer import TrainState


def save_checkpoint(path: str, state: TrainState, epoch: int = 0):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    meta = {"epoch": np.asarray(epoch), "step": np.asarray(state.step)}
    ckptr.save(path, {"state": state, "meta": meta}, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore into the shape of ``template`` (capacities must match)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {
        "state": template,
        "meta": {"epoch": np.asarray(0), "step": np.asarray(0)},
    }
    restored = ckptr.restore(path, target=target)
    return restored["state"], int(restored["meta"]["epoch"])


def lift_static_stage(scene: SceneModel, static_scene: SceneModel) -> SceneModel:
    """Stage handoff: reuse stage-1 bg Gaussians + MoveModel weights, keep
    the fresh fg/bases (run_training_dynamic.py:588-599). time_params are
    re-initialized if the frame count changed (trainer.py:156-158)."""
    move = static_scene.move
    if move.time_params.shape != scene.move.time_params.shape:
        move = move._replace(time_params=scene.move.time_params)
    return scene._replace(bg=static_scene.bg, move=move)
