"""SE(3) motion bases: per-frame basis trajectories blended per Gaussian.

TPU-native counterpart of the reference MotionBases
(/root/reference/flow3d/params.py:121-180): K bases, each a trajectory of
per-frame 6D-continuous rotations and translations; a Gaussian's transform
at (possibly fractional) time t is the softmax-coefficient blend of the
bases, linearly interpolated between floor(t) and ceil(t) in (6D-rot,
transl) space and converted to a rotation matrix afterwards (blend-then-
orthonormalize, same order as the reference).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from deblur4dgs_tpu.ops import lie


class MotionBases(NamedTuple):
    rots: jnp.ndarray  # (K, T, 6) 6D-continuous rotations
    transls: jnp.ndarray  # (K, T, 3)

    @property
    def num_bases(self) -> int:
        return self.rots.shape[0]

    @property
    def num_frames(self) -> int:
        return self.rots.shape[1]


def compute_transforms(
    bases: MotionBases,
    ts: jnp.ndarray,  # (B,) or (G, B) possibly-fractional frame times
    coefs: jnp.ndarray,  # (G, K) softmax blend weights
) -> jnp.ndarray:
    """Blended SE(3) transforms, (G, B, 3, 4).

    Fractional times lerp between the floor/ceil frames (params.py:152-177).
    For per-Gaussian times (G, B), the gather uses row 0's floor/ceil and
    per-row lerp weights — matching the reference's behavior (times differ
    per Gaussian only within one frame interval in practice).
    """
    T = bases.num_frames
    if ts.ndim == 1:
        ts = ts[None, :]  # (1, B)
    ts_pre = jnp.clip(jnp.floor(ts), 0, T - 1).astype(jnp.int32)
    ts_next = jnp.clip(jnp.ceil(ts), 0, T - 1).astype(jnp.int32)

    # (K, B, c) gathers at row-0 frame indices, blended to (G, B, c).
    transls_pre = jnp.einsum("gk,kbi->gbi", coefs, bases.transls[:, ts_pre[0]])
    rots_pre = jnp.einsum("gk,kbi->gbi", coefs, bases.rots[:, ts_pre[0]])
    transls_next = jnp.einsum("gk,kbi->gbi", coefs, bases.transls[:, ts_next[0]])
    rots_next = jnp.einsum("gk,kbi->gbi", coefs, bases.rots[:, ts_next[0]])

    w = (ts - ts_pre)[..., None]  # (1 or G, B, 1)
    transls = (1.0 - w) * transls_pre + w * transls_next
    rots = (1.0 - w) * rots_pre + w * rots_next
    rotmats = lie.cont_6d_to_rmat(rots)  # (G, B, 3, 3)
    return jnp.concatenate([rotmats, transls[..., None]], axis=-1)


def transform_gaussians(
    transfms: jnp.ndarray,  # (G, B, 3, 4)
    means: jnp.ndarray,  # (G, 3) canonical
    quats: jnp.ndarray,  # (G, 4) canonical unit wxyz
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply blended transforms to canonical Gaussians.

    Returns (means (G, B, 3), quats (G, B, 4)); quat composition mirrors
    scene_model.py:76-106 (rotmat->quat, Hamilton product, renormalize).
    """
    means_h = jnp.concatenate([means, jnp.ones_like(means[:, :1])], axis=-1)
    new_means = jnp.einsum("gbij,gj->gbi", transfms, means_h)
    q_rot = lie.rmat_to_quat(transfms[..., :3, :3])  # (G, B, 4)
    new_quats = lie.quat_mul(q_rot, quats[:, None, :])
    return new_means, lie.quat_normalize(new_quats)
