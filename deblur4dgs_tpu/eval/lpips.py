"""LPIPS perceptual similarity (counterpart of the vendored richzhang
package at /root/reference/models/: PerceptualLoss -> DistModel -> PNetLin).

Pipeline (networks_basic.py PNetLin semantics):
  1. scale inputs from [0,1] (normalize=True) to [-1,1], then shift/scale
     by the fixed ScalingLayer constants;
  2. backbone (alex by default) relu features;
  3. channel-unit-normalize each feature map;
  4. squared difference -> learned 1x1 linear heads (lin0..lin4, no bias)
     -> spatial mean -> sum over layers.

Weights: supply the torch LPIPS checkpoint (backbone + lin heads) and
convert with ``load_lpips_torch``; random init is for tests only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.models.backbones import (
    alexnet_features,
    init_alexnet,
    load_alexnet_torch,
)

# richzhang ScalingLayer constants
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

_ALEX_CHANNELS = [64, 192, 384, 256, 256]


def init_lpips(key):
    k1, k2 = jax.random.split(key)
    lins = [
        jax.random.uniform(k, (1, 1, c, 1), jnp.float32, 0.0, 0.1)
        for k, c in zip(jax.random.split(k2, 5), _ALEX_CHANNELS)
    ]
    return {"net": init_alexnet(k1), "lins": lins}


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (n + eps)


def lpips(params, img1, img2, normalize=True, spatial=False):
    """img1/img2: (B, H, W, 3). normalize=True expects [0, 1] inputs.

    Returns (B,) scores, or (B, H, W, 1) upsampled maps if spatial."""
    if normalize:
        img1 = 2.0 * img1 - 1.0
        img2 = 2.0 * img2 - 1.0
    x = (img1 - _SHIFT) / _SCALE
    y = (img2 - _SHIFT) / _SCALE
    fx = alexnet_features(params["net"], x)
    fy = alexnet_features(params["net"], y)
    total = None
    B, H, W, _ = img1.shape
    for fa, fb, lin in zip(fx, fy, params["lins"]):
        d = (_unit_normalize(fa) - _unit_normalize(fb)) ** 2
        v = jax.lax.conv_general_dilated(
            d, lin, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if spatial:
            v = jax.image.resize(v, (B, H, W, 1), "bilinear")
        else:
            v = jnp.mean(v, axis=(1, 2))
        total = v if total is None else total + v
    return total[..., 0] if not spatial else total


def masked_lpips(params, pred, target, mask):
    """mLPIPS semantics (metrics.py:250-272): spatial LPIPS on mask-
    multiplied images, averaged over masked pixels."""
    scores = lpips(
        params, (pred * mask[..., None]), (target * mask[..., None]),
        normalize=True, spatial=True,
    )[..., 0]
    return jnp.sum(scores * mask) / jnp.maximum(mask.sum(), 1.0)


def load_lpips_torch(backbone_sd, lin_sd) -> dict:
    """Convert torch state dicts: torchvision alexnet features + richzhang
    lin heads ('lin{i}.model.1.weight' with shape (1, C, 1, 1))."""
    lins = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin_sd:
                w = np.asarray(lin_sd[key])
                break
        lins.append(jnp.asarray(w.transpose(2, 3, 1, 0)))
    return {"net": load_alexnet_torch(backbone_sd), "lins": lins}
