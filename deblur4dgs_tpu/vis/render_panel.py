"""Keyframed camera paths + offline path rendering.

Counterpart of /root/reference/flow3d/vis/render_panel.py
(populate_render_tab, 37-1165): the reference builds a viser GUI tab where
the user drops camera keyframes, a Kochanek-Bartels spline
(render_panel.py:158-178, tension slider at :535) interpolates a smooth
camera path through them (optionally looped, :510), per-keyframe fov and
"time" (scene frame) are interpolated alongside (:67-118), and the tab
renders the path to a video. Here the path math is a plain library — the
browser viewer (vis/viewer.py), scripts, and tests all drive it directly;
no GUI toolkit required.

Rotation interpolation uses the standard interpolating C1 quaternion
spline (squad with Kochanek-Bartels-scaled inner tangents) rather than the
reference's generic spline library; translations / fov / time use classic
Hermite with the same tangent rule, so tension=0 reproduces Catmull-Rom
exactly and the path passes through every keyframe.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops import lie


@dataclass
class Keyframe:
    """One camera keyframe (render_panel.py:67-118).

    c2w: (4, 4) camera-to-world. fov: vertical field of view (radians).
    time: scene frame index rendered at this keyframe, or None (sharp
    canonical rendering / static scenes).
    """

    c2w: np.ndarray
    fov: float = np.pi / 3
    time: float | None = None


def _align_quats(qs: jnp.ndarray) -> jnp.ndarray:
    """Flip signs so consecutive quaternions lie in the same hemisphere."""

    def step(prev, q):
        q = jnp.where(jnp.sum(prev * q) < 0.0, -q, q)
        return q, q

    _, out = jax.lax.scan(step, qs[0], qs)
    return out


def _kb_tangents(x: jnp.ndarray, loop: bool, tension: float) -> jnp.ndarray:
    """Kochanek-Bartels tangents (continuity=bias=0): (K, ...) values ->
    (K, ...) tangents m_i = (1 - tension)/2 * (x_{i+1} - x_{i-1}), with
    clamped (one-sided) ends or wrap-around when looped."""
    if loop:
        nxt = jnp.roll(x, -1, axis=0)
        prv = jnp.roll(x, 1, axis=0)
        return 0.5 * (1.0 - tension) * (nxt - prv)
    inner = 0.5 * (x[2:] - x[:-2])
    first = (x[1] - x[0])[None]
    last = (x[-1] - x[-2])[None]
    return (1.0 - tension) * jnp.concatenate([first, inner, last], axis=0)


def _hermite(x0, x1, m0, m1, u):
    """Cubic Hermite: values/tangents (...,), u (N, 1) -> (N, ...)."""
    u2 = u * u
    u3 = u2 * u
    h00 = 2 * u3 - 3 * u2 + 1
    h10 = u3 - 2 * u2 + u
    h01 = -2 * u3 + 3 * u2
    h11 = u3 - u2
    return h00 * x0 + h10 * m0 + h01 * x1 + h11 * m1


def _slerp(q0, q1, u):
    r = lie.quat_log(lie.quat_mul(lie.quat_conj(q0), q1))
    return lie.quat_mul(
        jnp.broadcast_to(q0, u.shape[:-1] + (4,)), lie.quat_exp(u * r)
    )


def _squad_inner(qs: jnp.ndarray, loop: bool, tension: float) -> jnp.ndarray:
    """Inner control quats s_i = q_i exp(-(1-t)(log(q_i^-1 q_{i+1}) +
    log(q_i^-1 q_{i-1}))/4) for the interpolating squad spline."""
    if loop:
        nxt = jnp.roll(qs, -1, axis=0)
        prv = jnp.roll(qs, 1, axis=0)
    else:
        nxt = jnp.concatenate([qs[1:], qs[-1:]], axis=0)
        prv = jnp.concatenate([qs[:1], qs[:-1]], axis=0)
    inv = lie.quat_conj(qs)
    r = lie.quat_log(lie.quat_mul(inv, nxt)) + lie.quat_log(
        lie.quat_mul(inv, prv)
    )
    return lie.quat_mul(qs, lie.quat_exp(-0.25 * (1.0 - tension) * r))


def interpolate_camera_path(
    keyframes: list[Keyframe],
    num_frames: int,
    loop: bool = False,
    tension: float = 0.0,
):
    """Smooth camera path through the keyframes (render_panel.py:158-178).

    Returns (w2cs (N, 4, 4) jnp, fovs (N,) jnp, times (N,) jnp | None).
    Frames are allocated to spline segments proportionally to chord length
    (approximately constant travel speed, matching the reference's
    spline_t arc parameterization); each segment gets at least one frame.
    times is None unless every keyframe carries a time.
    """
    K = len(keyframes)
    if K == 0:
        raise ValueError("need at least one keyframe")
    if K == 1 or num_frames <= 1:
        kf = keyframes[0]
        w2c = jnp.linalg.inv(jnp.asarray(kf.c2w, jnp.float32))
        n = max(num_frames, 1)
        fovs = jnp.full((n,), kf.fov, jnp.float32)
        times = (
            None if kf.time is None else jnp.full((n,), kf.time, jnp.float32)
        )
        return jnp.broadcast_to(w2c, (n, 4, 4)), fovs, times

    c2ws = jnp.asarray(np.stack([k.c2w for k in keyframes]), jnp.float32)
    pos = c2ws[:, :3, 3]  # (K, 3)
    qs = _align_quats(lie.rmat_to_quat(c2ws[:, :3, :3]))
    fov = jnp.asarray([k.fov for k in keyframes], jnp.float32)
    have_time = all(k.time is not None for k in keyframes)
    tval = (
        jnp.asarray([k.time or 0.0 for k in keyframes], jnp.float32)
        if have_time
        else None
    )

    m_pos = _kb_tangents(pos, loop, tension)
    m_fov = _kb_tangents(fov, loop, tension)
    m_t = _kb_tangents(tval, loop, tension) if have_time else None
    s_q = _squad_inner(qs, loop, tension)

    nseg = K if loop else K - 1
    # every segment gets >= 1 frame, so fewer frames than segments can
    # never be honored (the trim loop below only shrinks entries > 1)
    num_frames = max(num_frames, nseg)
    chord = np.asarray(
        jnp.linalg.norm(jnp.roll(pos, -1, axis=0) - pos, axis=-1)
    )[:nseg]
    weights = np.maximum(chord, 1e-6)
    alloc = np.maximum(
        1, np.round(weights / weights.sum() * num_frames).astype(int)
    )
    # trim/extend to exactly num_frames (largest segments absorb the diff)
    order = np.argsort(-alloc)
    i = 0
    while alloc.sum() > num_frames:
        if alloc[order[i % nseg]] > 1:
            alloc[order[i % nseg]] -= 1
        i += 1
    i = 0
    while alloc.sum() < num_frames:
        alloc[order[i % nseg]] += 1
        i += 1

    w2cs, fovs, times = [], [], []
    for seg in range(nseg):
        j0, j1 = seg, (seg + 1) % K
        n = int(alloc[seg])
        # cover [0, 1) per segment; the final segment of a clamped path
        # includes u=1 so the last keyframe is hit exactly
        last = (not loop) and seg == nseg - 1
        u = jnp.linspace(0.0, 1.0, n, endpoint=False) if not last else (
            jnp.linspace(0.0, 1.0, n)
        )
        u1 = u[:, None]
        p = _hermite(pos[j0], pos[j1], m_pos[seg], m_pos[(seg + 1) % K], u1)
        f = _hermite(
            fov[j0], fov[j1], m_fov[seg], m_fov[(seg + 1) % K], u1
        )[:, 0]
        # squad(q0, q1, s0, s1; u) = slerp(slerp(q0,q1,u), slerp(s0,s1,u),
        # 2u(1-u)) — interpolating, C1 across keyframes.
        qa = _slerp(qs[j0], qs[j1], u1)
        qb = _slerp(s_q[j0], s_q[j1], u1)
        q = _slerp(qa, qb, 2.0 * u1 * (1.0 - u1))
        R = lie.quat_to_rmat(q)
        c2w = jnp.concatenate(
            [
                jnp.concatenate([R, p[:, :, None]], axis=-1),
                jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1, 4)
                ),
            ],
            axis=1,
        )
        w2cs.append(jnp.linalg.inv(c2w))
        fovs.append(f)
        if have_time:
            times.append(
                _hermite(
                    tval[j0], tval[j1], m_t[seg], m_t[(seg + 1) % K], u1
                )[:, 0]
            )
    return (
        jnp.concatenate(w2cs, axis=0),
        jnp.concatenate(fovs, axis=0),
        jnp.concatenate(times, axis=0) if have_time else None,
    )


def render_camera_path(
    render_fn,
    keyframes: list[Keyframe],
    img_wh: tuple[int, int],
    num_frames: int,
    out_path: str | None = None,
    fps: float = 30.0,
    loop: bool = False,
    tension: float = 0.0,
    num_scene_frames: int | None = None,
):
    """Render a keyframed path to frames (and optionally a video).

    render_fn: (CameraState, img_wh, t | None) -> (H, W, 3) uint8 — the
    same callback surface the interactive viewer drives
    (vis/renderer.py:42). Keyframe times are rounded to scene frame
    indices and clamped to [0, num_scene_frames). Returns (frames
    (N, H, W, 3) uint8, video path | None).
    """
    from deblur4dgs_tpu.vis.renderer import CameraState

    w2cs, fovs, times = interpolate_camera_path(
        keyframes, num_frames, loop=loop, tension=tension
    )
    c2ws = np.asarray(jnp.linalg.inv(w2cs))
    fovs = np.asarray(fovs)
    tarr = None if times is None else np.asarray(times)
    frames = []
    for i in range(c2ws.shape[0]):
        t = None
        if tarr is not None:
            t = int(round(float(tarr[i])))
            if num_scene_frames is not None:
                t = min(max(t, 0), num_scene_frames - 1)
        cam = CameraState(
            fov=float(fovs[i]), aspect=img_wh[0] / img_wh[1], c2w=c2ws[i]
        )
        frames.append(np.asarray(render_fn(cam, img_wh, t)))
    frames = np.stack(frames)
    video = None
    if out_path is not None:
        from deblur4dgs_tpu.vis.utils import save_video

        video = save_video(out_path, frames, fps=fps)
    return frames, video
