"""AlexNet / VGG19 feature backbones in JAX + torch weight converters.

Support the LPIPS metric (vendored richzhang package in the reference,
/root/reference/models/) and the VGG perceptual loss
(/root/reference/flow3d/loss_utils.py:198-337). The image ships no
torchvision, so pretrained weights must be supplied as torch state-dict
files and converted with the helpers here; random init is only useful for
shape/parity tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(p, x, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _init_conv(key, cin, cout, k):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k * k)
    return {
        "w": jax.random.uniform(k1, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


# ---------------------------------------------------------------------------
# AlexNet (torchvision .features layout; LPIPS taps the 5 relu outputs)
# ---------------------------------------------------------------------------

_ALEX_CFG = [  # (cin, cout, kernel, stride, padding)
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]


def init_alexnet(key):
    keys = jax.random.split(key, len(_ALEX_CFG))
    return [
        _init_conv(k, cin, cout, ks)
        for k, (cin, cout, ks, _, _) in zip(keys, _ALEX_CFG)
    ]


def alexnet_features(params, x):
    """x: (B, H, W, 3) -> list of 5 relu feature maps (LPIPS taps)."""
    feats = []
    for i, (p, (_, _, k, s, pad)) in enumerate(zip(params, _ALEX_CFG)):
        x = jax.nn.relu(conv2d(p, x, stride=s, padding=pad))
        feats.append(x)
        if i in (0, 1):  # maxpool after relu1 and relu2
            x = maxpool(x)
    return feats


def load_alexnet_torch(state_dict) -> list:
    """torchvision alexnet state dict ('features.{0,3,6,8,10}.weight')."""
    out = []
    for idx in (0, 3, 6, 8, 10):
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        out.append(
            {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
        )
    return out


# ---------------------------------------------------------------------------
# VGG19 (torchvision .features layout)
# ---------------------------------------------------------------------------

# conv channel plan per block (loss_utils.py:198-270 slices the torchvision
# vgg19 features at these boundaries)
_VGG_PLAN = [
    (3, 64), (64, 64),
    (64, 128), (128, 128),
    (128, 256), (256, 256), (256, 256), (256, 256),
    (256, 512), (512, 512), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512), (512, 512),
]
_VGG_POOL_AFTER = {1, 3, 7, 11}  # pool after these conv indices (0-based)
_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def init_vgg19(key):
    keys = jax.random.split(key, len(_VGG_PLAN))
    return [
        _init_conv(k, cin, cout, 3) for k, (cin, cout) in zip(keys, _VGG_PLAN)
    ]


def vgg19_features(params, x):
    """x: (B, H, W, 3) -> dict of all relu{i}_{j} feature maps."""
    names = [
        "relu1_1", "relu1_2", "relu2_1", "relu2_2",
        "relu3_1", "relu3_2", "relu3_3", "relu3_4",
        "relu4_1", "relu4_2", "relu4_3", "relu4_4",
        "relu5_1", "relu5_2", "relu5_3", "relu5_4",
    ]
    out = {}
    for i, (p, name) in enumerate(zip(params, names)):
        x = jax.nn.relu(conv2d(p, x, padding=1))
        out[name] = x
        if i in _VGG_POOL_AFTER:
            x = maxpool(x, k=2, s=2)
    return out


def load_vgg19_torch(state_dict) -> list:
    out = []
    for idx in _VGG_TORCH_IDX:
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        out.append(
            {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
        )
    return out


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def vgg_perceptual_loss(params, img1, img2):
    """VGGLoss.forward (loss_utils.py:321-337): L1 on relu3_2/relu4_2 (x1)
    and relu5_2 (x2), divided by 4. imgs: (B, H, W, 3) in [0, 1]."""
    x = (img1 - IMAGENET_MEAN) / IMAGENET_STD
    y = (img2 - IMAGENET_MEAN) / IMAGENET_STD
    fx = vgg19_features(params, x)
    fy = vgg19_features(params, y)
    loss = 0.0
    for name, w in (("relu3_2", 1.0), ("relu4_2", 1.0), ("relu5_2", 2.0)):
        loss += w * jnp.mean(jnp.abs(fx[name] - fy[name]))
    return loss / 4.0
