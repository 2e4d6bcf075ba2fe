"""Lie-group math: quaternions, SO(3)/SE(3) exp/log, 6D rotations, splines.

Pure-jnp, batched over arbitrary leading dims, fp32, autodiff-safe (all
singular points are guarded with the double-where pattern so gradients never
see NaN). Semantics match the reference implementation
(/root/reference/flow3d/models/utils/spline_utils.py,
/root/reference/flow3d/transforms.py) but the code is an independent
TPU-first design: branchless, vectorized, no per-element Python loops.

Conventions:
  * Quaternions are **wxyz** unless a function name says otherwise.
  * se(3) vectors are ``[w, u]`` (rotation first), matching the reference's
    ``SE3_to_se3`` layout (spline_utils.py:177-188).
  * SE(3) "pose" = (..., 3, 4) matrix ``[R | t]``.
  * SE(3) *interpolation* lerps translation directly in t-space and slerps
    rotation, matching pypose-based ``linear_interpolation``
    (spline_utils.py:371-408) — translation does NOT go through the V-matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(x, axis=-1, keepdims=False):
    """Norm with zero-safe gradient (grad at ||x||=0 is 0, not NaN)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    small = sq < 1e-30
    return jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, sq)))


def _safe_where(cond, safe_fn, unsafe_fn, x):
    """Evaluate unsafe_fn only on values where it is finite-valued.

    Standard double-where trick: replaces x by a safe dummy inside
    ``unsafe_fn`` where ``cond`` holds so autodiff never differentiates the
    singular branch at the singular point.
    """
    safe_x = jnp.where(cond, jnp.ones_like(x), x)
    return jnp.where(cond, safe_fn(x), unsafe_fn(safe_x))


# ---------------------------------------------------------------------------
# sinc-family coefficients (A = sin(x)/x, B = (1-cos x)/x^2, C = (x-sin x)/x^3)
# Reference computes these via 10th-order Taylor for all x
# (spline_utils.py:26-54); we use exact forms with Taylor fallbacks near 0.
# ---------------------------------------------------------------------------


def taylor_A(x):
    small = jnp.abs(x) < 1e-3
    return _safe_where(
        small,
        lambda x: 1.0 - x**2 / 6.0 + x**4 / 120.0,
        lambda x: jnp.sin(x) / x,
        x,
    )


def taylor_B(x):
    small = jnp.abs(x) < 1e-3
    return _safe_where(
        small,
        lambda x: 0.5 - x**2 / 24.0 + x**4 / 720.0,
        lambda x: (1.0 - jnp.cos(x)) / x**2,
        x,
    )


def taylor_C(x):
    small = jnp.abs(x) < 1e-3
    return _safe_where(
        small,
        lambda x: 1.0 / 6.0 - x**2 / 120.0 + x**4 / 5040.0,
        lambda x: (x - jnp.sin(x)) / x**3,
        x,
    )


# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------


def quat_normalize(q):
    return q / jnp.maximum(_safe_norm(q, keepdims=True), _EPS)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1, q2):
    """Hamilton product, wxyz."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_to_rmat(q):
    """Unit wxyz quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (w * y + x * z)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (w * x + y * z)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rmat_to_quat(R):
    """(..., 3, 3) rotation matrix -> wxyz unit quaternion (branchless).

    Uses the 4-candidate construction: compute the quaternion via all four
    "largest component" formulas and select the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four squared-magnitude candidates (4q_i^2 = 1 + ...).
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(cands, axis=-1)

    def build(i2, a, b, c, order):
        s = 2.0 * jnp.sqrt(jnp.maximum(i2, _EPS))
        comps = [0.25 * s, a / s, b / s, c / s]
        return jnp.stack([comps[j] for j in order], axis=-1)

    q_w = build(qw2, m21 - m12, m02 - m20, m10 - m01, [0, 1, 2, 3])
    q_x = build(qx2, m21 - m12, m01 + m10, m02 + m20, [1, 0, 2, 3])
    q_y = build(qy2, m02 - m20, m01 + m10, m12 + m21, [1, 2, 0, 3])
    q_z = build(qz2, m10 - m01, m02 + m20, m12 + m21, [1, 2, 3, 0])

    b = best[..., None]
    q = jnp.select([b == 0, b == 1, b == 2, b == 3], [q_w, q_x, q_y, q_z])
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def quat_exp(w):
    """so(3) rotation vector (..., 3) -> unit wxyz quaternion."""
    theta = _safe_norm(w, keepdims=True)
    half = 0.5 * theta
    # sin(theta/2)/theta, guarded.
    k = 0.5 * taylor_A(half)
    qw = jnp.cos(half)
    return jnp.concatenate([qw, k * w], axis=-1)


def quat_log(q):
    """Unit wxyz quaternion -> so(3) rotation vector (..., 3).

    Matches the reference's arctan formulation (spline_utils.py:133-174):
    lam = 2*atan2(|v|, w)/|v|, with Taylor fallback near |v|=0.
    """
    w = q[..., :1]
    v = q[..., 1:]
    vn = _safe_norm(v, keepdims=True)
    small = vn < 1e-6

    def taylor(vn_):
        # 2/w - 2/3 * vn^2 / w^3 (reference log_q2r_taylor_theta_0)
        ws = jnp.where(jnp.abs(w) < _EPS, jnp.ones_like(w), w)
        return 2.0 / ws - 2.0 / 3.0 * vn_**2 / ws**3

    def exact(vn_):
        return 2.0 * jnp.arctan2(vn_, w) / vn_

    lam = _safe_where(small, taylor, exact, vn)
    return lam * v


# ---------------------------------------------------------------------------
# 6D continuous rotation (transforms.py:33-53)
# ---------------------------------------------------------------------------


def rmat_to_cont_6d(R):
    """(..., 3, 3) -> (..., 6): first two *columns* of R concatenated."""
    return jnp.concatenate([R[..., 0], R[..., 1]], axis=-1)


def cont_6d_to_rmat(c):
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt; columns of the result."""
    x1 = c[..., 0:3]
    y1 = c[..., 3:6]
    x = x1 / jnp.maximum(_safe_norm(x1, keepdims=True), _EPS)
    y1p = y1 - jnp.sum(y1 * x, axis=-1, keepdims=True) * x
    y = y1p / jnp.maximum(_safe_norm(y1p, keepdims=True), _EPS)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# SO(3) / SE(3)
# ---------------------------------------------------------------------------


def skew(w):
    w0, w1, w2 = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zero, -w2, w1], axis=-1),
            jnp.stack([w2, zero, -w0], axis=-1),
            jnp.stack([-w1, w0, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """(..., 3) rotation vector -> (..., 3, 3) via Rodrigues."""
    theta = _safe_norm(w)[..., None, None]
    wx = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + taylor_A(theta) * wx + taylor_B(theta) * (wx @ wx)


def so3_log(R):
    """(..., 3, 3) -> (..., 3) rotation vector.

    Routed through the 4-candidate quaternion extraction + atan2 quaternion
    log, which stays well-conditioned all the way to theta = pi. (The
    reference's (R - R^T)/(2 sinc) formulation, spline_utils.py:191-201,
    collapses near pi — verified experimentally — so we deliberately do not
    replicate it.)
    """
    return quat_log(rmat_to_quat(R))


def _se3_V(w):
    theta = _safe_norm(w)[..., None, None]
    wx = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + taylor_B(theta) * wx + taylor_C(theta) * (wx @ wx)


def _se3_V_inv(w, eps=1e-8):
    theta = _safe_norm(w)[..., None, None]
    wx = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    coef = (1.0 - A / (2.0 * B)) / (theta**2 + eps)
    return eye - 0.5 * wx + coef * (wx @ wx)


def se3_exp(wu):
    """se(3) (..., 6) [w,u] -> (..., 3, 4) pose [R|t]."""
    w, u = wu[..., :3], wu[..., 3:]
    R = so3_exp(w)
    t = (_se3_V(w) @ u[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_log(Rt):
    """(..., 3, 4) pose [R|t] -> se(3) (..., 6) [w,u]."""
    R, t = Rt[..., :3], Rt[..., 3]
    w = so3_log(R)
    u = (_se3_V_inv(w) @ t[..., None])[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def rt_to_mat4(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    mat34 = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype),
        mat34.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([mat34, bottom], axis=-2)


def pose_compose(A, B):
    """Compose two (..., 3, 4) poses: result = A @ B (as 4x4s)."""
    Ra, ta = A[..., :3], A[..., 3]
    Rb, tb = B[..., :3], B[..., 3]
    R = Ra @ Rb
    t = (Ra @ tb[..., None])[..., 0] + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_inverse(A):
    R, t = A[..., :3], A[..., 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([Rt, (-(Rt @ t[..., None]))], axis=-1)


def pose_apply(A, pts):
    """Apply (..., 3, 4) pose to (..., 3) points."""
    return (A[..., :3] @ pts[..., None])[..., 0] + A[..., 3]


# ---------------------------------------------------------------------------
# SE(3) interpolation (translation lerped directly; rotation slerped),
# matching spline_utils.py:346-470.
# ---------------------------------------------------------------------------


def se3_lerp(pose0, pose1, u):
    """Linear SE(3) interpolation.

    Args:
      pose0, pose1: (..., 3, 4) control poses.
      u: (..., N) normalized positions in [0, 1].
    Returns:
      (..., N, 3, 4) interpolated poses.
    """
    t0, t1 = pose0[..., 3], pose1[..., 3]
    q0 = rmat_to_quat(pose0[..., :3])
    q1 = rmat_to_quat(pose1[..., :3])

    uN = u[..., None]  # (..., N, 1)
    t = (1.0 - uN) * t0[..., None, :] + uN * t1[..., None, :]

    r = quat_log(quat_mul(quat_conj(q0), q1))  # (..., 3)
    q = quat_mul(
        jnp.broadcast_to(q0[..., None, :], uN.shape[:-1] + (4,)),
        quat_exp(uN * r[..., None, :]),
    )
    R = quat_to_rmat(q)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_cubic_bspline(poses, u):
    """Cubic B-spline SE(3) interpolation with 4 control knots.

    Args:
      poses: (..., 4, 3, 4) control poses.
      u: (..., N) in [0, 1].
    Returns:
      (..., N, 3, 4). Matches spline_utils.py:411-470: translation blended
      with B-spline basis, rotation as cumulative product of exponentials of
      scaled adjacent relative rotations.
    """
    uu = u * u
    uuu = uu * u
    oos = 1.0 / 6.0
    ct = jnp.stack(
        [
            oos - 0.5 * u + 0.5 * uu - oos * uuu,
            4.0 * oos - uu + 0.5 * uuu,
            oos + 0.5 * u + 0.5 * uu - 0.5 * uuu,
            oos * uuu,
        ],
        axis=-1,
    )  # (..., N, 4)
    t = jnp.einsum("...nk,...ki->...ni", ct, poses[..., 3])

    cr = jnp.stack(
        [
            5.0 * oos + 0.5 * u - 0.5 * uu + oos * uuu,
            oos + 0.5 * u + 0.5 * uu - 2.0 * oos * uuu,
            oos * uuu,
        ],
        axis=-1,
    )  # (..., N, 3)

    q = rmat_to_quat(poses[..., :3])  # (..., 4, 4quat)
    r_adj = quat_log(
        quat_mul(quat_conj(q[..., :-1, :]), q[..., 1:, :])
    )  # (..., 3, 3vec)
    # q_t = q0 * exp(c1 r01) * exp(c2 r12) * exp(c3 r23)
    q_acc = jnp.broadcast_to(
        q[..., 0:1, :], cr.shape[:-1] + (4,)
    )  # (..., N, 4)
    for k in range(3):
        qk = quat_exp(cr[..., k : k + 1] * r_adj[..., k, None, :])
        q_acc = quat_mul(q_acc, qk)
    R = quat_to_rmat(q_acc)
    return jnp.concatenate([R, t[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Weighted Procrustes (transforms.py:56-129)
# ---------------------------------------------------------------------------


def solve_procrustes(src, dst, weights=None, enforce_se3=True):
    """Weighted similarity/SE(3) alignment min ||s(src @ R^T + t) - dst||.

    Args:
      src, dst: (N, 3); weights: (N,) or None.
    Returns:
      (q_wxyz, t, s), error — rotation as wxyz quaternion.
    """
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), dtype=src.dtype)
    w = (weights / jnp.maximum(weights.sum(), _EPS))[:, None]
    src_mean = (src * w).sum(axis=0)
    dst_mean = (dst * w).sum(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    if enforce_se3:
        src_scale = dst_scale = jnp.asarray(1.0, src.dtype)
    else:
        src_scale = jnp.sqrt(jnp.mean(jnp.sum(src_c**2 * w, axis=-1)))
        dst_scale = jnp.sqrt(jnp.mean(jnp.sum(dst_c**2 * w, axis=-1)))
    src_s = src_c / src_scale
    dst_s = dst_c / dst_scale
    M = (w * dst_s).T @ src_s
    U, _, Vh = jnp.linalg.svd(M)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    S = jnp.diag(jnp.array([1.0, 1.0, 0.0], src.dtype)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], src.dtype)
    ) * jnp.sign(det)
    R = U @ S @ Vh
    s = dst_scale / src_scale
    t = dst_mean / s - src_mean @ R.T
    q = rmat_to_quat(R)
    aligned = s * (src @ R.T + t)
    error = jnp.sum(jnp.linalg.norm(dst - aligned, axis=-1) * w[:, 0])
    return (q, t, s), error
