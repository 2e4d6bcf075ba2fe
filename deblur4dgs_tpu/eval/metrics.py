"""Masked image/pose metrics (counterpart of /root/reference/flow3d/metrics.py).

Functional jnp cores + small stateful accumulators mirroring the reference's
torchmetrics API (update/compute/reset). The masked SSIM reproduces the
reference's mask-aware separable gaussian filtering (metrics.py:142-213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_psnr(preds, targets, masks=None) -> float:
    """metrics.py:13-42: masked MSE -> PSNR."""
    if masks is None:
        masks = jnp.ones_like(preds[..., 0])
    sse = jnp.sum(((preds - targets) * masks[..., None]) ** 2)
    total = jnp.maximum(masks.sum(), 1.0) * 3.0
    return float(-10.0 * jnp.log(sse / total) / np.log(10.0))


def masked_ssim(
    preds, targets, masks=None, kernel_size=11, sigma=1.5, k1=0.01, k2=0.03,
    data_range=1.0,
):
    """Mask-aware SSIM for one (H, W, 3) image pair (metrics.py:142-213)."""
    if masks is None:
        masks = jnp.ones_like(preds[..., 0])

    hw = kernel_size // 2
    shift = (2 * hw - kernel_size + 1) / 2
    f_i = ((jnp.arange(kernel_size) - hw + shift) / sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    filt = filt / filt.sum()

    def conv1d(z, m, axis):
        """Mask-weighted separable filter along one spatial axis, valid pad.
        z: (H, W, C); m: (H, W)."""
        k = filt.reshape((-1, 1, 1) if axis == 0 else (1, -1, 1))
        zm = z * m[..., None]
        dn = jax.lax.conv_dimension_numbers(
            zm.transpose(2, 0, 1)[:, None].shape, (1, 1) + k.shape[:2],
            ("NCHW", "OIHW", "NCHW"),
        )

        def corr(x, kern):
            x4 = x.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
            k4 = kern.reshape(1, 1, *kern.shape[:2])
            out = jax.lax.conv_general_dilated(
                x4, k4, (1, 1), "VALID", dimension_numbers=dn
            )
            return out[:, 0].transpose(1, 2, 0)

        z_ = corr(zm, k)
        ones_k = jnp.ones_like(k)
        m_ = corr(m[..., None], ones_k)[..., 0]
        scale = jnp.sum(jnp.ones_like(filt))
        out = jnp.where(m_[..., None] != 0, z_ * scale / m_[..., None], 0.0)
        return out, (m_ != 0).astype(z.dtype)

    def filt_fn(z, m):
        z, m = conv1d(z, m, axis=1)
        return conv1d(z, m, axis=0)

    mu0 = filt_fn(preds, masks)[0]
    mu1 = filt_fn(targets, masks)[0]
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = jnp.maximum(filt_fn(preds**2, masks)[0] - mu00, 0.0)
    s11 = jnp.maximum(filt_fn(targets**2, masks)[0] - mu11, 0.0)
    s01 = filt_fn(preds * targets, masks)[0] - mu01
    s01 = jnp.sign(s01) * jnp.minimum(jnp.sqrt(s00 * s11), jnp.abs(s01))

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
        (mu00 + mu11 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(ssim_map)


def compute_pck(preds, targets, threshold: float) -> float:
    """metrics.py:294-306."""
    ok = jnp.linalg.norm(preds - targets, axis=-1) < threshold
    return float(jnp.sum(ok) / max(preds.shape[0], 1))


def compute_pose_errors(preds: np.ndarray, targets: np.ndarray):
    """ATE / RPE_t / RPE_r in degrees (metrics.py:45-78); numpy for acos
    accuracy near 1.0 (reference note)."""
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    ate = float(np.linalg.norm(preds[:, :3, -1] - targets[:, :3, -1], axis=-1).mean())
    pred_rels = np.linalg.inv(preds[:-1]) @ preds[1:]
    target_rels = np.linalg.inv(targets[:-1]) @ targets[1:]
    error_rels = np.linalg.inv(target_rels) @ pred_rels
    traces = error_rels[:, :3, :3].trace(axis1=-2, axis2=-1)
    rpe_t = float(np.linalg.norm(error_rels[:, :3, -1], axis=-1).mean())
    rpe_r = float(
        np.arccos(np.clip((traces - 1.0) / 2.0, -1.0, 1.0)).mean() / np.pi * 180.0
    )
    return ate, rpe_t, rpe_r


# ---------------------------------------------------------------------------
# Stateful accumulators (torchmetrics-style update/compute/reset)
# ---------------------------------------------------------------------------


class mPSNR:
    """Per-image masked PSNR, averaged over updates (metrics.py:81-124)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum_squared_error = []
        self.total = []

    def __len__(self):
        return len(self.total)

    def update(self, preds, targets, masks=None):
        if masks is None:
            masks = jnp.ones_like(preds[..., 0])
        self.sum_squared_error.append(
            float(jnp.sum(((preds - targets) * masks[..., None]) ** 2))
        )
        self.total.append(float(masks.sum()) * 3.0)

    def compute(self) -> float:
        sse = np.array(self.sum_squared_error)
        tot = np.array(self.total)
        return float((-10.0 * np.log(sse / tot)).mean() / np.log(10.0))


class mSSIM:
    """Per-image masked SSIM, averaged (metrics.py:127-217)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.similarity = []

    def __len__(self):
        return len(self.similarity)

    def update(self, preds, targets, masks=None):
        if preds.ndim == 4:
            for i in range(preds.shape[0]):
                self.similarity.append(
                    float(masked_ssim(
                        preds[i], targets[i],
                        None if masks is None else masks[i],
                    ))
                )
        else:
            self.similarity.append(float(masked_ssim(preds, targets, masks)))

    def compute(self) -> float:
        return float(np.mean(self.similarity))


class PCK:
    def __init__(self):
        self.reset()

    def reset(self):
        self.correct = []
        self.total = []

    def __len__(self):
        return len(self.total)

    def update(self, preds, targets, threshold):
        ok = jnp.linalg.norm(preds - targets, axis=-1) < threshold
        self.correct.append(float(jnp.sum(ok)))
        self.total.append(preds.shape[0])

    def compute(self) -> float:
        return float(
            np.mean(np.array(self.correct) / np.maximum(np.array(self.total), 1e-8))
        )
