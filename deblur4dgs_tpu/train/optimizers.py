"""Optimizer groups: label-based optax transforms replacing the reference's
per-tensor torch.optim.Adam dict (trainer.py:1168-1196).

Groups and schedules (matching the reference):
  * every Gaussian/basis param: Adam(lr from SceneLRConfig); 'scales' decay
    exponentially to 0.1x over max_steps, everything else constant
  * MoveModel pose nets: Adam 5e-4, cosine to 1e-5 over 24*500 steps,
    stepping every 25 steps with gradient accumulation, gated on after
    epoch 20 (trainer.py:241-255) — implemented as optax.MultiSteps plus a
    gradient gate supplied by the caller
  * MoveModel time_params: Adam 1e-1, cosine to 1e-5 over 24*200 steps,
    also 25-step accumulation

The whole optimizer is a single optax GradientTransformation over the
SceneModel pytree, so its state is one pytree too (checkpoint-friendly and
trivially shardable).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax

from deblur4dgs_tpu.configs import OptimizerConfig, SceneLRConfig
from deblur4dgs_tpu.models.scene import SceneModel


def _exp_decay_schedule(lr_init: float, lr_final: float, max_steps: int):
    def sched(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        return jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )

    return sched


def _cosine_schedule(lr_init: float, eta_min: float, T_max: int):
    def sched(step):
        return eta_min + (lr_init - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.clip(step, 0, T_max) / T_max)
        )

    return sched


def param_labels(scene: SceneModel) -> Any:
    """Label pytree matching the SceneModel structure."""

    def gauss_labels(g, part):
        if g is None:
            return None
        return g._replace(
            means=f"{part}.means",
            quats=f"{part}.quats",
            scales=f"{part}.scales",
            colors=f"{part}.colors",
            opacities=f"{part}.opacities",
            motion_coefs=(
                None if g.motion_coefs is None else f"{part}.motion_coefs"
            ),
            alive=None if g.alive is None else "frozen",
        )

    return scene._replace(
        fg=gauss_labels(scene.fg, "fg"),
        bg=gauss_labels(scene.bg, "bg"),
        bases=scene.bases._replace(
            rots="motion_bases.rots", transls="motion_bases.transls"
        ),
        move=scene.move._replace(
            trunk=jax.tree.map(lambda _: "move.pose", scene.move.trunk),
            head_start=jax.tree.map(lambda _: "move.pose", scene.move.head_start),
            head_end=jax.tree.map(lambda _: "move.pose", scene.move.head_end),
            time_params="move.time",
        ),
    )


def make_optimizer(
    scene: SceneModel,
    lr_cfg: SceneLRConfig,
    optim_cfg: OptimizerConfig,
) -> optax.GradientTransformation:
    transforms = {}

    def gauss_groups(part_cfg, part):
        for field, lr in vars(part_cfg).items():
            name = f"{part}.{field}"
            if field == "scales":
                sched = _exp_decay_schedule(lr, 0.1 * lr, optim_cfg.max_steps)
                transforms[name] = optax.adam(sched)
            else:
                transforms[name] = optax.adam(lr)

    gauss_groups(lr_cfg.fg, "fg")
    if scene.bg is not None:
        gauss_groups(lr_cfg.bg, "bg")
    transforms["motion_bases.rots"] = optax.adam(lr_cfg.motion_bases.rots)
    transforms["motion_bases.transls"] = optax.adam(lr_cfg.motion_bases.transls)

    mv = lr_cfg.move
    transforms["move.pose"] = optax.MultiSteps(
        optax.adam(_cosine_schedule(mv.pose, mv.eta_min, mv.pose_T_max)),
        every_k_schedule=mv.accum_every,
    )
    transforms["move.time"] = optax.MultiSteps(
        optax.adam(_cosine_schedule(mv.time, mv.eta_min, mv.time_T_max)),
        every_k_schedule=mv.accum_every,
    )
    transforms["frozen"] = optax.set_to_zero()

    labels = param_labels(scene)
    return optax.multi_transform(transforms, labels)


def gate_move_pose_grads(grads: SceneModel, gate: jnp.ndarray) -> SceneModel:
    """Zero MoveModel pose-net grads when gate==0 (epoch <= 20 gating)."""
    move = grads.move
    z = lambda t: jax.tree.map(lambda x: x * gate, t)
    return grads._replace(
        move=move._replace(
            trunk=z(move.trunk),
            head_start=z(move.head_start),
            head_end=z(move.head_end),
        )
    )
