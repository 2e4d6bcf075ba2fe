"""Exposure model: learned camera motion + exposure time within each frame.

TPU-native counterpart of the reference MoveModel
(/root/reference/flow3d/models/move_model.py). Given a frame's world->camera
pose, an MLP conditioned on the se(3)-embedded pose predicts two small se(3)
*deltas* (zero-initialized heads => identity at init) that define the
residual camera trajectory across the exposure window; a learnable per-frame
scalar deltaT (clamped to [0.1, 0.9] frame units) defines the window's
half-width in time. Sub-frame poses are SE(3)-linearly interpolated between
exp(delta_start) and exp(delta_end); sub-frame times span
[t - deltaT, t + deltaT].

The residual poses apply to Gaussian means in *world* space before the
static viewmat (scene_model.py:352-353), i.e. they warp the scene rather
than re-deriving per-sub-frame camera matrices — we keep that convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.utils.mlp import init_mlp, mlp, posenc

NUM_FREQS = 5  # posenc over the 6-dim se(3) vector -> 6 * (1 + 2*5) = 66
WIDTH = 64


class MoveModel(NamedTuple):
    trunk: list  # 5 linear layers 66 -> 64 -> ... -> 64
    head_start: list  # 64 -> 64 -> 6, last layer zero-init
    head_end: list  # 64 -> 64 -> 6, last layer zero-init
    time_params: jnp.ndarray  # (T,) raw per-frame deltaT (init 0.5)


class ExposureSamples(NamedTuple):
    poses: jnp.ndarray  # (N, 3, 4) residual world-space poses
    times: jnp.ndarray  # (N,) fractional frame times
    delta_t: jnp.ndarray  # () learned exposure half-width for this frame


def init_move_model(key, num_frames: int) -> MoveModel:
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = 6 * (1 + 2 * NUM_FREQS)
    return MoveModel(
        trunk=init_mlp(k1, [in_dim, WIDTH, WIDTH, WIDTH, WIDTH, WIDTH]),
        head_start=init_mlp(k2, [WIDTH, WIDTH, 6], zero_last=True),
        head_end=init_mlp(k3, [WIDTH, WIDTH, 6], zero_last=True),
        time_params=jnp.full((num_frames,), 0.5, jnp.float32),
    )


def predict_deltas(model: MoveModel, w2c: jnp.ndarray):
    """w2c (4, 4) -> (delta_start (6,), delta_end (6,)) se(3) residuals."""
    se3 = lie.se3_log(w2c[:3, :])
    x = posenc(se3, NUM_FREQS)
    h = mlp(model.trunk, x)  # trunk ends in a plain Linear (move_model.py:74-84)
    d0 = mlp(model.head_start, h)
    d1 = mlp(model.head_end, h)
    return d0, d1


def frame_delta_t(model: MoveModel, t, stage: str) -> jnp.ndarray:
    """Learned exposure half-width for integer frame index t.

    Boundary frames (t <= 0 or t >= T-1) and the camera-only first stage get
    deltaT = 0 (move_model.py:121-131)."""
    if stage == "first":
        return jnp.asarray(0.0, jnp.float32)
    T = model.time_params.shape[0]
    ti = jnp.clip(jnp.asarray(t, jnp.int32), 0, T - 1)
    dt = jnp.clip(jax.nn.relu(model.time_params[ti]), 0.1, 0.9)
    boundary = (jnp.asarray(t) <= 0) | (jnp.asarray(t) >= T - 1)
    return jnp.where(boundary, 0.0, dt)


def exposure_samples(
    model: MoveModel,
    w2c: jnp.ndarray,  # (4, 4)
    t,  # scalar frame index (int or traced)
    num_cameras: int,
    stage: str = "second",
    mode: str = "uniform",
    camera_mode: str = "linear",
) -> ExposureSamples:
    """Sample the exposure window: N residual poses + times.

    mode selects which sub-frames: 'uniform' (all N), 'mid', 'start', 'end'
    (single sample but returned with N entries sliced by the caller — here
    we just return the full uniform set; callers slice, matching
    scene_model.py:313-321).

    camera_mode selects the within-window pose interpolation
    (move_model.py:168-204): 'linear' (reference default) or 'cubic'. The
    reference's cubic branch cannot actually run — it feeds its TWO control
    poses into the four-basis-row cubic_bspline_interpolation
    (spline_utils.py:442-449), a shape mismatch — so we define 'cubic' as
    the SE(3) B-spline over duplicated knots [start, start, end, end]: a
    smooth ease between the endpoint poses (see PARITY.md).

    Caveats of the duplicated-knot spline: it evaluates to (5*p0+p1)/6 at
    u=0 and (p0+5*p1)/6 at u=1, so 'cubic' spans only the middle ~2/3 of
    the predicted exposure motion (reduced effective blur extent vs
    'linear'). Its exact-midpoint property — sample N//2 sitting at the
    true SE(3) midpoint of (p0, p1), which mode='mid' slicing relies on —
    holds only for ODD num_cameras; use odd num_exposure with
    camera_mode='cubic'.
    """
    d0, d1 = predict_deltas(model, w2c)
    p0 = lie.se3_exp(d0)
    p1 = lie.se3_exp(d1)
    u = jnp.linspace(0.0, 1.0, num_cameras)
    if camera_mode == "cubic":
        knots = jnp.stack([p0, p0, p1, p1], axis=0)  # (4, 3, 4)
        poses = lie.se3_cubic_bspline(knots, u)  # (N, 3, 4)
    else:
        poses = lie.se3_lerp(p0, p1, u)  # (N, 3, 4)

    dt = frame_delta_t(model, t, stage)
    tf = jnp.asarray(t, jnp.float32)
    times = (tf - dt) * (1.0 - u) + (tf + dt) * u  # (N,)

    if mode == "mid":
        sl = slice(num_cameras // 2, num_cameras // 2 + 1)
    elif mode == "start":
        sl = slice(0, 1)
    elif mode == "end":
        sl = slice(num_cameras - 1, num_cameras)
    else:
        sl = slice(None)
    return ExposureSamples(poses[sl], times[sl], dt)
