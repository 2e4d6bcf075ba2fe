"""Novel-view camera path generators (counterpart of
/root/reference/flow3d/trajectories.py): average pose, ray-triangulated
lookat, arc / lemniscate / spiral / wander paths. Pure jnp."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops import lie


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)


def get_avg_w2c(w2cs: jnp.ndarray) -> jnp.ndarray:
    """Average camera (trajectories.py:9-24)."""
    c2ws = jnp.linalg.inv(w2cs)
    center = c2ws[:, :3, -1].mean(0)
    z = _normalize(c2ws[:, :3, 2].mean(0))
    y_ = c2ws[:, :3, 1].mean(0)
    x = _normalize(jnp.cross(y_, z))
    y = jnp.cross(z, x)
    avg_c2w = lie.rt_to_mat4(jnp.stack([x, y, z], 1), center)
    return jnp.linalg.inv(avg_c2w)


def get_lookat(origins: jnp.ndarray, viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Least-squares triangulation of rays (trajectories.py:26-48)."""
    d = _normalize(viewdirs)
    eye = jnp.eye(3)[None]
    I_min_cov = eye - d[..., None] * d[..., None, :]
    sum_proj = (I_min_cov @ origins[..., None]).sum(axis=-3)
    A = I_min_cov.sum(axis=-3)
    lookat = jnp.linalg.lstsq(A, sum_proj)[0][..., 0]
    return lookat


def get_lookat_w2cs(positions, lookat, up):
    """(N, 3) positions looking at a point (trajectories.py:50-68)."""
    fwd = _normalize(lookat - positions)
    right = _normalize(jnp.cross(fwd, jnp.broadcast_to(up, fwd.shape)))
    down = _normalize(jnp.cross(fwd, right))
    Rs = jnp.stack([right, down, fwd], axis=-1)
    return jnp.linalg.inv(lie.rt_to_mat4(Rs, positions))


def get_arc_w2cs(ref_w2c, lookat, up, num_frames, degree, **_):
    ref_pos = jnp.linalg.inv(ref_w2c)[:3, 3]
    thetas = (
        jnp.sin(jnp.linspace(0.0, 2 * jnp.pi, num_frames + 1)[:-1])
        * (degree / 2.0) / 180.0 * jnp.pi
    )
    R = lie.so3_exp(thetas[:, None] * up[None])
    # orbit about the lookat point (the reference omits the +lookat,
    # trajectories.py:89-93, which only works for lookat ~ origin)
    positions = jnp.einsum("nij,j->ni", R, ref_pos - lookat) + lookat
    return get_lookat_w2cs(positions, lookat, up)


def get_lemniscate_w2cs(ref_w2c, lookat, up, num_frames, degree, **_):
    ref_c2w = jnp.linalg.inv(ref_w2c)
    a = jnp.linalg.norm(ref_c2w[:3, 3] - lookat) * np.tan(degree / 360 * np.pi)
    thetas = jnp.linspace(0, 2 * jnp.pi, num_frames + 1)[:-1] + jnp.pi / 2
    pos_cam = jnp.stack(
        [
            a * jnp.cos(thetas) / (1 + jnp.sin(thetas) ** 2),
            a * jnp.cos(thetas) * jnp.sin(thetas) / (1 + jnp.sin(thetas) ** 2),
            jnp.zeros(num_frames),
        ],
        -1,
    )
    pos = jnp.einsum(
        "ij,nj->ni", ref_c2w[:3],
        jnp.concatenate([pos_cam, jnp.ones((num_frames, 1))], -1),
    )
    return get_lookat_w2cs(pos, lookat, up)


def get_spiral_w2cs(ref_w2c, lookat, up, num_frames, rads, zrate, rots, **_):
    ref_c2w = jnp.linalg.inv(ref_w2c)
    thetas = jnp.linspace(0, 2 * jnp.pi * rots, num_frames + 1)[:-1]
    rads = jnp.asarray(rads).reshape(-1, 3) if hasattr(rads, "shape") else rads
    pos_cam = (
        jnp.stack(
            [jnp.cos(thetas), -jnp.sin(thetas), -jnp.sin(thetas * zrate)], -1
        )
        * rads
    )
    pos = jnp.einsum(
        "ij,nj->ni", ref_c2w[:3],
        jnp.concatenate([pos_cam, jnp.ones((num_frames, 1))], -1),
    )
    return get_lookat_w2cs(pos, lookat, up)


def get_wander_w2cs(ref_w2c, focal_length, num_frames, max_disp=48.0, **_):
    c2w = np.linalg.inv(np.asarray(ref_w2c))
    max_trans = max_disp / focal_length
    poses = []
    for i in range(num_frames):
        x_t = max_trans * np.sin(2 * np.pi * i / num_frames)
        z_t = max_trans * np.cos(2 * np.pi * i / num_frames) / 2.0
        i_pose = np.eye(4)
        i_pose[:3, 3] = [x_t, 0.0, z_t]
        poses.append(c2w @ np.linalg.inv(i_pose))
    return jnp.linalg.inv(jnp.asarray(np.stack(poses), dtype=jnp.float32))
