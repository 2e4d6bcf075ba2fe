"""Loss library: masked/quantile-trimmed photometric losses, SSIM, motion regs.

TPU-native counterpart of /root/reference/flow3d/loss_utils.py. The
reference trims outliers with boolean indexing (dynamic shapes); here
trimming is a masked weighting with a masked quantile computed by
sort + interpolated gather, so every loss is fixed-shape and jit-stable.
SSIM follows pytorch_msssim defaults (11x11 gaussian window, sigma 1.5,
K1=0.01, K2=0.03) used by the trainer (trainer.py:93).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deblur4dgs_tpu.ops.lie import _safe_norm

# ---------------------------------------------------------------------------
# Quantile-trimmed masked losses (loss_utils.py:7-68)
# ---------------------------------------------------------------------------


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Linear-interpolated quantile of x restricted to mask (torch-compatible)."""
    v = jnp.sort(jnp.where(mask, x, jnp.inf).ravel())
    n = jnp.maximum(jnp.sum(mask), 1)
    f = q * (n - 1).astype(jnp.float32)
    lo = jnp.floor(f).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = f - lo
    return v[lo] * (1.0 - frac) + v[hi] * frac


def _masked_reduce(per_elem, mask, normalize, quantile):
    """per_elem: (...) per-pixel loss (channel-mean already applied);
    mask: same shape weights. Mirrors masked_l1/mse_loss reduction."""
    if quantile < 1.0:
        thr = masked_quantile(per_elem, jnp.ones_like(per_elem, bool), quantile) \
            if mask is None else masked_quantile(per_elem, mask > 0, quantile)
        qmask = (per_elem < thr).astype(per_elem.dtype)
    else:
        qmask = jnp.ones_like(per_elem)
    if mask is None:
        return jnp.sum(per_elem * qmask) / jnp.maximum(jnp.sum(qmask), 1e-8)
    w = mask * qmask
    if normalize:
        return jnp.sum(per_elem * w) / (jnp.sum(w) + 1e-8)
    return jnp.mean(per_elem * w)


def masked_l1_loss(pred, gt, mask=None, normalize=True, quantile=1.0):
    per = jnp.mean(jnp.abs(pred - gt), axis=-1)
    m = None if mask is None else mask.reshape(per.shape)
    return _masked_reduce(per, m, normalize, quantile)


def masked_mse_loss(pred, gt, mask=None, normalize=True, quantile=1.0):
    per = jnp.mean((pred - gt) ** 2, axis=-1)
    m = None if mask is None else mask.reshape(per.shape)
    return _masked_reduce(per, m, normalize, quantile)


def masked_huber_loss(pred, gt, delta, mask=None, normalize=True):
    err = pred - gt
    abs_err = jnp.abs(err)
    per = jnp.where(
        abs_err <= delta, 0.5 * err**2, delta * (abs_err - 0.5 * delta)
    )
    if mask is None:
        return jnp.mean(per)
    m = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (per.ndim - mask.ndim)), per.shape)
    if normalize:
        return jnp.sum(per * m) / (jnp.sum(m) * 1.0 + 1e-8)
    return jnp.mean(per * m)


def compute_gradient_loss(pred, gt, mask, quantile=0.98):
    """Edge-aware depth gradient loss (loss_utils.py:71-90).

    pred/gt: (H, W) or (H, W, D); mask: (H, W)."""
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]
    mask = mask.astype(pred.dtype)
    mask_x = mask[:, 1:] * mask[:, :-1]
    mask_y = mask[1:, :] * mask[:-1, :]
    pgx = pred[:, 1:] - pred[:, :-1]
    pgy = pred[1:, :] - pred[:-1, :]
    ggx = gt[:, 1:] - gt[:, :-1]
    ggy = gt[1:, :] - gt[:-1, :]
    lx = masked_l1_loss(pgx, ggx, mask=mask_x, quantile=quantile)
    ly = masked_l1_loss(pgy, ggy, mask=mask_y, quantile=quantile)
    return lx + ly


# ---------------------------------------------------------------------------
# SSIM (pytorch_msssim-compatible)
# ---------------------------------------------------------------------------


def _gaussian_window(size=11, sigma=1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _blur_matrix(n, win):
    """(n - size + 1, n) banded matrix applying `win` with VALID padding.

    `win` is static, so XLA constant-folds the whole matrix at compile
    time.
    """
    size = win.shape[0]
    m = n - size + 1
    rows = jnp.arange(m, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]
    k = cols - rows
    return jnp.where(
        (k >= 0) & (k < size), win[jnp.clip(k, 0, size - 1)], 0.0
    )


def _blur(img, win):
    """Separable gaussian filter, valid padding. img: (H, W, C).

    Implemented as two banded-matrix matmuls instead of 1-feature
    convolutions: single-channel conv_general_dilated leaves the MXU idle
    and cost ~5% of a 720p train step; dense (H', H) x (H, W*C) matmuls
    ride the MXU (the zeros are free — it's bandwidth-bound either way).
    """
    H, W, C = img.shape
    bh = _blur_matrix(H, win)
    bw = _blur_matrix(W, win)
    hi = jnp.einsum(
        "yh,hwc->ywc", bh, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "ywc,vw->yvc", hi, bw, precision=jax.lax.Precision.HIGHEST
    )


def ssim(img1, img2, data_range=1.0, win_size=11, sigma=1.5, K1=0.01, K2=0.03):
    """Mean SSIM over an (H, W, C) image pair.

    Images smaller than the window shrink it to the largest odd size that
    fits (the valid-padded blur would otherwise produce an EMPTY stats
    array whose mean is NaN — a silent NaN loss value on tiny train
    images; the reference's pytorch_msssim never sees images < 11 px).
    """
    win_size = min(win_size, img1.shape[0], img1.shape[1])
    if win_size % 2 == 0:
        win_size -= 1
    win = _gaussian_window(win_size, sigma)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    # One fused blur over [i1, i2, i1^2, i2^2, i1*i2] stacked on channels.
    stats = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    C = img1.shape[-1]
    blurred = _blur(stats, win)
    mu1, mu2, e11, e22, e12 = (
        blurred[..., i * C : (i + 1) * C] for i in range(5)
    )
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = e11 - mu1_sq
    s2 = e22 - mu2_sq
    s12 = e12 - mu12
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    m = ((2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)) * cs
    return jnp.mean(m)


def ssim_loss(img1, img2, **kw):
    return 1.0 - ssim(img1, img2, **kw)


# ---------------------------------------------------------------------------
# Motion regularizers (loss_utils.py:118-157)
# ---------------------------------------------------------------------------


def compute_accel_loss(x):
    """x: (K, T, d) — central-difference acceleration norm.

    Uses a zero-safe norm: at exactly-zero acceleration (e.g. identity
    bases at init) jnp.linalg.norm has a NaN gradient."""
    accel = 2 * x[:, 1:-1] - x[:, :-2] - x[:, 2:]
    return jnp.mean(_safe_norm(accel))


def compute_se3_smoothness_loss(rots, transls, weight_rot=1.0, weight_transl=2.0):
    return (
        compute_accel_loss(rots) * weight_rot
        + compute_accel_loss(transls) * weight_transl
    )


def compute_z_acc_loss(means_ts_nb: jnp.ndarray, w2cs: jnp.ndarray):
    """means_ts_nb: (G, 3, B, 3) fg means at (t-1, t, t+1); w2cs: (B, 4, 4)."""
    camera_center = jnp.linalg.inv(w2cs)[:, :3, 3]  # (B, 3)
    ray = means_ts_nb[:, 1] - camera_center  # (G, B, 3)
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-8)
    d01 = jnp.sum((means_ts_nb[:, 1] - means_ts_nb[:, 0]) * ray, axis=-1)
    d12 = jnp.sum((means_ts_nb[:, 2] - means_ts_nb[:, 1]) * ray, axis=-1)
    return jnp.mean(d01**2) + jnp.mean(d12**2)


def scale_variance_loss(log_scales: jnp.ndarray, mask=None):
    """Per-gaussian variance of the 3 log-scales (trainer.py:418-421)."""
    var = jnp.var(log_scales, axis=-1)
    if mask is None:
        return jnp.mean(var)
    m = mask.astype(var.dtype)
    return jnp.sum(var * m) / (jnp.sum(m) + 1e-8)


def tv_loss(x):
    """Total variation of (H, W, C)."""
    h = jnp.mean((x[1:, :] - x[:-1, :]) ** 2)
    w = jnp.mean((x[:, 1:] - x[:, :-1]) ** 2)
    return 2.0 * (h + w)
