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


def template_state(
    num_fg: int,
    num_bg: int,
    num_bases: int,
    num_frames: int,
) -> TrainState:
    """Zero-filled TrainState with the given capacities.

    load_checkpoint restores into the SHAPE of a template (the reference
    instead rebuilds modules by inspecting state-dict shapes,
    scene_model.py:145-160); this builds one from the run's dimensions so
    CLI tools (view / render-path) can restore without the training setup.
    """
    import jax.numpy as jnp

    from deblur4dgs_tpu.configs import OptimizerConfig, SceneLRConfig
    from deblur4dgs_tpu.models.gaussians import Gaussians
    from deblur4dgs_tpu.models.motion_bases import MotionBases
    from deblur4dgs_tpu.models.move_model import init_move_model
    from deblur4dgs_tpu.train.trainer import init_train_state

    def gauss(n, coefs):
        return Gaussians(
            means=jnp.zeros((n, 3)),
            quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
            scales=jnp.zeros((n, 3)),
            colors=jnp.zeros((n, 3)),
            opacities=jnp.zeros((n,)),
            motion_coefs=jnp.zeros((n, num_bases)) if coefs else None,
            alive=jnp.ones((n,)),
        )

    scene = SceneModel(
        fg=gauss(num_fg, True),
        bg=gauss(num_bg, False) if num_bg else None,
        bases=MotionBases(
            rots=jnp.zeros((num_bases, num_frames, 6)),
            transls=jnp.zeros((num_bases, num_frames, 3)),
        ),
        move=init_move_model(jax.random.PRNGKey(0), num_frames=num_frames),
    )
    return init_train_state(scene, SceneLRConfig(), OptimizerConfig())


def lift_static_stage(scene: SceneModel, static_scene: SceneModel) -> SceneModel:
    """Stage handoff: reuse stage-1 bg Gaussians + MoveModel weights, keep
    the fresh fg/bases (run_training_dynamic.py:588-599). time_params are
    re-initialized if the frame count changed (trainer.py:156-158)."""
    move = static_scene.move
    if move.time_params.shape != scene.move.time_params.shape:
        move = move._replace(time_params=scene.move.time_params)
    return scene._replace(bg=static_scene.bg, move=move)
