"""Adaptive density control on fixed-capacity Gaussian buffers.

TPU-native counterpart of the reference's densify/cull/reset-opacity +
optimizer-state surgery (trainer.py:926-1252). The reference rebuilds
tensors at new sizes every control event; XLA wants static shapes, so:

  * every Gaussian group has a fixed capacity C with a float alive mask;
  * densify writes dup/split children into dead slots via scatters
    (split kills the original — its slot is immediately reusable, matching
    params.py:86-99 where split originals are removed);
  * cull just clears alive bits;
  * Adam moments of newly-allocated slots are zeroed in-place through the
    labeled optax state (the analog of dup_in_optim/remove_from_optim/
    reset_in_optim at trainer.py:1199-1252);
  * when capacity runs out, lowest-priority candidates are dropped and
    reported (the trainer can compact+grow at a re-jit boundary if needed).

Stats are zeroed after every control event, exactly like trainer.py:949-951
(which makes the reference's stat remapping dead code we don't replicate).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from deblur4dgs_tpu.configs import OptimizerConfig
from deblur4dgs_tpu.models.gaussians import Gaussians


class ControlReport(NamedTuple):
    num_split: jnp.ndarray
    num_dup: jnp.ndarray
    num_dropped: jnp.ndarray  # candidates lost to capacity exhaustion
    num_culled: jnp.ndarray
    new_slot_mask: jnp.ndarray  # (C,) float 1.0 where a slot was (re)allocated


def _scatter_rows(x, tgt, src_vals):
    """x.at[tgt].set(src_vals) with out-of-range targets dropped."""
    return x.at[tgt].set(src_vals, mode="drop")


def densify_group(
    g: Gaussians,
    grad_avg: jnp.ndarray,  # (C,)
    max_radii: jnp.ndarray,  # (C,) normalized by max(W, H)
    cfg: OptimizerConfig,
    use_screen: bool,
) -> tuple[Gaussians, ControlReport]:
    """Split/dup control for one group (trainer.py:992-1047)."""
    C = g.capacity
    alive = g.get_alive()
    scales = jnp.exp(g.scales).max(axis=-1)

    too_high = (grad_avg > cfg.densify_xys_grad_threshold) & alive
    scale_big = scales > cfg.densify_scale_threshold
    radius_big = (
        (max_radii > cfg.densify_screen_threshold)
        if use_screen
        else jnp.zeros_like(too_high)
    )
    should_split = too_high & (scale_big | radius_big)
    should_dup = too_high & ~scale_big

    # Free slots (dead after killing split originals), dead-first order.
    alive_after_kill = alive & ~should_split
    free = jnp.argsort(alive_after_kill, stable=True)  # False (dead) first
    n_free = jnp.sum(~alive_after_kill)

    n_dup = jnp.sum(should_dup)
    n_split = jnp.sum(should_split)

    dup_rank = jnp.cumsum(should_dup) - 1
    split_rank = jnp.cumsum(should_split) - 1

    free_pad = jnp.concatenate([free, jnp.full((C,), C, jnp.int32)])

    def targets(mask, rank, offset):
        r = rank + offset
        ok = mask & (r < n_free)
        return jnp.where(ok, free_pad[jnp.clip(r, 0, 2 * C - 1)], C), ok

    tgt_dup, ok_dup = targets(should_dup, dup_rank, 0)
    tgt_a, ok_a = targets(should_split, split_rank, n_dup)
    tgt_b, ok_b = targets(should_split, split_rank + n_split, n_dup)

    shrink = math.log(1.6)  # params.py:94

    def write(x, adjust_scales=False):
        if x is None:
            return None
        x = _scatter_rows(x, tgt_dup, x)
        src = x - shrink if adjust_scales else x
        x = _scatter_rows(x, tgt_a, src)
        x = _scatter_rows(x, tgt_b, src)
        return x

    new_alive = alive_after_kill.astype(jnp.float32)
    for tgt in (tgt_dup, tgt_a, tgt_b):
        new_alive = new_alive.at[tgt].set(1.0, mode="drop")
    new_slots = new_alive * (1.0 - alive_after_kill.astype(jnp.float32))

    out = Gaussians(
        means=write(g.means),
        quats=write(g.quats),
        scales=write(g.scales, adjust_scales=True),
        colors=write(g.colors),
        opacities=write(g.opacities),
        motion_coefs=write(g.motion_coefs),
        alive=new_alive,
    )
    dropped = (
        jnp.sum(should_dup & ~ok_dup)
        + jnp.sum(should_split & ~ok_a)
        + jnp.sum(should_split & ~ok_b)
    )
    report = ControlReport(
        num_split=n_split,
        num_dup=n_dup,
        num_dropped=dropped,
        num_culled=jnp.asarray(0),
        new_slot_mask=new_slots,
    )
    return out, report


def cull_group(
    g: Gaussians,
    max_radii: jnp.ndarray,
    cfg: OptimizerConfig,
    scene_scale: float,
    use_scale: bool,
    use_screen: bool,
) -> tuple[Gaussians, jnp.ndarray]:
    """Opacity/scale/radius culling (trainer.py:1088-1136)."""
    alive = g.get_alive()
    opac = jax.nn.sigmoid(g.opacities)
    small = opac < cfg.cull_opacity_threshold
    cull = small
    if use_scale:
        scales = jnp.exp(g.scales).max(axis=-1)
        cull = cull | (scales > cfg.cull_scale_threshold * scene_scale)
    if use_screen:
        cull = cull | (max_radii > cfg.cull_screen_threshold)
    cull = cull & alive
    new_alive = (alive & ~cull).astype(jnp.float32)
    return g._replace(alive=new_alive), jnp.sum(cull)


def reset_opacities_group(g: Gaussians, cfg: OptimizerConfig) -> Gaussians:
    """Reset alive opacities to logit(0.8 * cull_thr) (trainer.py:1146-1166)."""
    target = math.log(0.8 * cfg.cull_opacity_threshold) - math.log(
        1 - 0.8 * cfg.cull_opacity_threshold
    )
    alive = g.get_alive()
    return g._replace(
        opacities=jnp.where(alive, jnp.minimum(g.opacities, target), g.opacities)
    )


# ---------------------------------------------------------------------------
# Optimizer-state surgery (trainer.py:1199-1252 analog)
# ---------------------------------------------------------------------------


def _map_labeled_state(opt_state, label_pred, fn):
    """Apply fn to the adam moment trees of multi_transform inner states
    whose label satisfies label_pred."""
    inner = dict(opt_state.inner_states)
    for label, st in inner.items():
        if not label_pred(label):
            continue
        inner[label] = jax.tree.map(fn, st)
    return opt_state._replace(inner_states=inner)


def reset_moments_at_slots(opt_state, part: str, slot_mask: jnp.ndarray):
    """Zero Adam mu/nu rows at (re)allocated slots for a gaussian part
    ('fg' or 'bg'). slot_mask: (C,) float 1.0 at new slots."""
    keep = 1.0 - slot_mask

    def zero_rows(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == slot_mask.shape[0]:
            return x * keep.reshape((-1,) + (1,) * (x.ndim - 1))
        return x

    return _map_labeled_state(
        opt_state, lambda lab: lab.startswith(part + "."), zero_rows
    )


def apply_density_control(
    state,
    cfg: OptimizerConfig,
    *,
    num_frames: int,
    only_fg: bool,
    do_densify: bool,
    do_cull: bool,
    do_reset: bool,
    use_screen: bool,
    bg_scene_scale: float = 1.0,
    cull_use_scale: bool = False,
):
    """One control event on a TrainState (run_control_steps analog,
    trainer.py:926-951). Host decides cadence flags; this function is pure
    and jit-compatible per flag combination. Stats are zeroed afterwards.
    """
    scene = state.scene
    stats = state.stats
    opt_state = state.opt_state
    n_fg = scene.num_fg

    grad_avg = stats.grad_norm_acc / jnp.maximum(stats.vis_count, 1)
    parts = [("fg", scene.fg, slice(0, n_fg))]
    if scene.bg is not None and not only_fg:
        parts.append(("bg", scene.bg, slice(n_fg, None)))

    new_groups = {}
    for name, g, sl in parts:
        if do_densify:
            g, rep = densify_group(
                g, grad_avg[sl], stats.max_radii[sl], cfg, use_screen
            )
            opt_state = reset_moments_at_slots(opt_state, name, rep.new_slot_mask)
        if do_cull:
            scale = bg_scene_scale if name == "bg" else 1.0
            g, _ = cull_group(
                g, stats.max_radii[sl], cfg, scale, cull_use_scale, use_screen
            )
        if do_reset:
            g = reset_opacities_group(g, cfg)
            opt_state = reset_moments_full(opt_state, f"{name}.opacities")
        new_groups[name] = g

    scene = scene._replace(fg=new_groups["fg"])
    if "bg" in new_groups:
        scene = scene._replace(bg=new_groups["bg"])

    stats = jax.tree.map(jnp.zeros_like, stats)
    return state._replace(scene=scene, opt_state=opt_state, stats=stats)


def control_flags(cfg: OptimizerConfig, step: int, num_frames: int) -> dict:
    """Cadence logic of run_control_steps (trainer.py:933-947)."""
    reset_every = cfg.reset_opacity_every_n_controls * cfg.control_every
    if not (
        step > cfg.warmup_steps
        and step % cfg.control_every == 0
        and step < cfg.stop_control_steps
    ):
        return {}
    return {
        "do_densify": (
            step < cfg.stop_densify_steps
            and step % reset_every > num_frames
        ),
        "do_cull": step % reset_every > min(3 * num_frames, 1000),
        "do_reset": step % reset_every == 0,
        "use_screen": step < cfg.stop_control_by_screen_steps,
        "cull_use_scale": step > reset_every,
    }


def reset_moments_full(opt_state, label: str):
    """Zero all moments of one labeled group (reset_in_optim analog)."""

    def zero(x):
        if hasattr(x, "shape") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return x

    return _map_labeled_state(opt_state, lambda lab: lab == label, zero)
