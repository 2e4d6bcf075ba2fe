"""EWA projection of 3D Gaussians to screen space.

TPU-native equivalent of the gsplat v1.1.1 projection stage (reference call
site /root/reference/flow3d/scene_model.py:360-373): quats+scales -> 3D
covariance -> camera frame -> perspective Jacobian -> 2D conic, radii,
depths. Pure batched jnp (everything is fused elementwise + tiny matmuls;
XLA handles this well — the Pallas effort goes into compositing instead).

All math fp32. Semantics follow gsplat's packed=False pipeline:
  * low-pass dilation eps2d = 0.3 added to the 2D covariance diagonal
  * perspective Jacobian evaluated at tan-FOV-clamped (x/z, y/z)
  * radius = ceil(3 * sqrt(max eigenvalue of cov2d))
  * valid = near < z < far, det(cov2d) > 0, radius > 0, on-screen
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from deblur4dgs_tpu.ops import lie


class Projected(NamedTuple):
    """Screen-space Gaussians for one camera."""

    means2d: jnp.ndarray  # (G, 2) pixel coords
    conics: jnp.ndarray  # (G, 3) upper-tri inverse 2D covariance (a, b, c)
    depths: jnp.ndarray  # (G,) camera-space z
    radii: jnp.ndarray  # (G,) float screen radius (3 sigma), 0 if culled
    valid: jnp.ndarray  # (G,) bool


def quat_scale_to_covar(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(G, 4) wxyz unit quats + (G, 3) scales -> (G, 3, 3) covariance."""
    R = lie.quat_to_rmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def _covar_cam_entries(quats, scales, R_cw):
    """Unique entries of R_cw (R diag(s^2) R^T) R_cw^T, fully scalar-expanded.

    Returns (c00, c01, c02, c11, c12, c22), each (G,). Equivalent to
    quat_scale_to_covar + the camera-frame rotation, but with no (G, 3, 3)
    tensors: batched 3x3 matmuls put the size-3 axes on TPU vector lanes
    (heavy padding + relayout copies — this line was ~8% of a train step);
    elementwise formulas fuse into one VPU pass.
    """
    w, x, y, z = (quats[:, i] for i in range(4))
    r = (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y),
    )
    s2 = (scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2)

    # A = R_cw @ R_gauss: A[i][k] = sum_m R_cw[i, m] r[m*3+k]; R_cw entries
    # are scalars, so each A entry is a 3-term elementwise combination.
    A = [
        sum(R_cw[i, m] * r[m * 3 + k] for m in range(3)) for i in range(3)
        for k in range(3)
    ]

    def cc(i, j):
        return sum(s2[k] * A[i * 3 + k] * A[j * 3 + k] for k in range(3))

    return cc(0, 0), cc(0, 1), cc(0, 2), cc(1, 1), cc(1, 2), cc(2, 2)


def project(
    means: jnp.ndarray,  # (G, 3) world
    quats: jnp.ndarray,  # (G, 4) wxyz (normalized by caller or here)
    scales: jnp.ndarray,  # (G, 3) linear (already exp-activated)
    viewmat: jnp.ndarray,  # (4, 4) world->camera
    K: jnp.ndarray,  # (3, 3) intrinsics
    img_wh: tuple[int, int],
    eps2d: float = 0.3,
    near: float = 0.01,
    far: float = 1e10,
    aux_mask: jnp.ndarray | None = None,  # (G,) bool: False => culled
) -> Projected:
    W, H = img_wh
    quats = lie.quat_normalize(quats)
    R_cw = viewmat[:3, :3]
    t_cw = viewmat[:3, 3]
    p_c = means @ R_cw.T + t_cw  # (G, 3)
    x, y, z = p_c[:, 0], p_c[:, 1], p_c[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    # 3D covariance in camera frame (scalar-expanded; see _covar_cam_entries).
    c00, c01, c02, c11, c12, c22 = _covar_cam_entries(quats, scales, R_cw)

    # Perspective Jacobian at FOV-clamped point (gsplat's 1.3 * tan(fov/2)).
    tan_fovx = 0.5 * W / fx
    tan_fovy = 0.5 * H / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)

    rz = 1.0 / zs
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    # cov2d = J covar_c J^T, expanded explicitly (avoids (G,2,3) matmuls).
    jx = fx * rz
    jy = fy * rz
    jxz = -fx * tx * rz2
    jyz = -fy * ty * rz2
    # row0 = [jx, 0, jxz]; row1 = [0, jy, jyz]
    a = jx * (jx * c00 + jxz * c02) + jxz * (jx * c02 + jxz * c22)
    b = jx * (jy * c01 + jyz * c02) + jxz * (jy * c12 + jyz * c22)
    c = jy * (jy * c11 + jyz * c12) + jyz * (jy * c12 + jyz * c22)

    a = a + eps2d
    c = c + eps2d
    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # Radius from max eigenvalue.
    mid = 0.5 * (a + c)
    v1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(v1, 0.0)))

    mean_x = fx * x * rz + cx
    mean_y = fy * y * rz + cy
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    inside = (
        (mean_x + radius > 0)
        & (mean_x - radius < W)
        & (mean_y + radius > 0)
        & (mean_y - radius < H)
    )
    valid = (z > near) & (z < far) & (det > 0) & (radius > 0) & inside
    if aux_mask is not None:
        valid = valid & aux_mask
    radius = jnp.where(valid, radius, 0.0)

    return Projected(means2d, conic, z, radius, valid)
