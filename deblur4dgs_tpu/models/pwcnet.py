"""PWC-Net optical flow in JAX (counterpart of
/root/reference/flow3d/models/pwcnet.py + the CuPy correlation kernels in
flow3d/models/external/pwcnet/correlation/correlation.py).

The CUDA cost-volume kernels become a vectorized 81-way shifted-product
(radius-4 displacement window, channel-mean normalization — matching
kernel_Correlation_updateOutput). Used frozen for the exposure
sub-frame AlignedLoss (loss_utils.py:161-189); only inference + input
gradients are needed.

Weights: the image has no torchvision/pretrained checkpoints. Architecture
matches the reference exactly; ``load_torch_weights`` converts the
reference's ``pwcnet-network-default.pth`` layout when a user supplies it.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(p, x, stride=1, padding=1, dilation=1):
    """NHWC conv. p: {w: (kh, kw, cin, cout), b: (cout,)}."""
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def conv_transpose2d(p, x):
    """kernel 4, stride 2, padding 1 deconv (doubles H, W).

    Kernel layout (kh, kw, cin, cout); torch ConvTranspose2d weights are
    converted by spatial flip + channel transpose (see load_torch_weights).
    """
    # torch ConvTranspose2d(k=4, s=2, p=1) == input dilated by 2, padded by
    # k-1-p = 2, plain conv with the (already spatially-flipped) kernel.
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def correlation(f1, f2, radius=4):
    """81-channel local cost volume (correlation.py:35-103 semantics):
    out[..., k] = mean_c f1[c] * f2_shifted(dy, dx)[c], zero padded.
    f1, f2: (B, H, W, C) -> (B, H, W, (2r+1)^2)."""
    B, H, W, C = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    outs = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy, dx, 0), (B, H, W, C)
            )
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def backwarp(x, flow):
    """Bilinear warp of (B, H, W, C) by flow (B, H, W, 2) in pixels, with a
    validity mask channel (pwcnet.py:11-56). Returns (warped, mask).

    The reference normalizes flow by (W-1)/2 but samples through
    grid_sample(align_corners=False) whose grid unit is W/2 pixels
    (pwcnet.py:23-27), so its effective pixel displacement is
    flow * W/(W-1) — reproduced here exactly (pinned by the golden
    fixture test against the executed reference forward)."""
    B, H, W, C = x.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = gx[None] + flow[..., 0] * (W / (W - 1.0))
    py = gy[None] + flow[..., 1] * (H / (H - 1.0))

    x_aug = jnp.concatenate([x, jnp.ones((B, H, W, 1))], axis=-1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def gather(yc, xc):
        inb = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
        yc = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        v = jax.vmap(lambda img, yy, xx: img[yy, xx])(x_aug, yc, xc)
        return v * inb[..., None]

    out = (
        gather(y0, x0) * (1 - fx) * (1 - fy)
        + gather(y0, x0 + 1) * fx * (1 - fy)
        + gather(y0 + 1, x0) * (1 - fx) * fy
        + gather(y0 + 1, x0 + 1) * fx * fy
    )
    mask = (out[..., -1:] > 0.999).astype(x.dtype)
    return out[..., :-1] * mask, mask


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------

_EXTRACTOR_DIMS = [(3, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]
_DEC_CURRENT = {6: 81, 5: 81 + 128 + 4, 4: 81 + 96 + 4, 3: 81 + 64 + 4, 2: 81 + 32 + 4}
_DEC_PREV = {5: 81, 4: 81 + 128 + 4, 3: 81 + 96 + 4, 2: 81 + 64 + 4}
_BACKWARP_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def _init_conv(key, cin, cout, k=3):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k * k)
    return {
        "w": jax.random.uniform(k1, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def init_pwcnet(key) -> dict:
    keys = iter(jax.random.split(key, 128))
    params: dict[str, Any] = {"extractor": [], "decoders": {}, "refiner": []}
    for cin, cout in _EXTRACTOR_DIMS:
        params["extractor"].append(
            [
                _init_conv(next(keys), cin, cout),
                _init_conv(next(keys), cout, cout),
                _init_conv(next(keys), cout, cout),
            ]
        )
    for lvl in (6, 5, 4, 3, 2):
        cur = _DEC_CURRENT[lvl]
        d = {
            "one": _init_conv(next(keys), cur, 128),
            "two": _init_conv(next(keys), cur + 128, 128),
            "thr": _init_conv(next(keys), cur + 256, 96),
            "fou": _init_conv(next(keys), cur + 352, 64),
            "fiv": _init_conv(next(keys), cur + 416, 32),
            "six": _init_conv(next(keys), cur + 448, 2),
        }
        if lvl < 6:
            d["upflow"] = _init_conv(next(keys), 2, 2, k=4)
            d["upfeat"] = _init_conv(next(keys), _DEC_PREV[lvl] + 448, 2, k=4)
        params["decoders"][lvl] = d
    refiner_dims = [
        (565, 128, 1), (128, 128, 2), (128, 128, 4), (128, 96, 8),
        (96, 64, 16), (64, 32, 1), (32, 2, 1),
    ]
    for cin, cout, _ in refiner_dims:
        params["refiner"].append(_init_conv(next(keys), cin, cout))
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _extract(params, x):
    feats = []
    for level in params["extractor"]:
        x = lrelu(conv2d(level[0], x, stride=2))
        x = lrelu(conv2d(level[1], x))
        x = lrelu(conv2d(level[2], x))
        feats.append(x)
    return feats


def _decode(d, lvl, f1, f2, prev):
    if prev is None:
        vol = lrelu(correlation(f1, f2))
        feat = vol
        flow_in = None
    else:
        flow_in = conv_transpose2d(d["upflow"], prev["flow"])
        feat_up = conv_transpose2d(d["upfeat"], prev["feat"])
        warped, _ = backwarp(f2, flow_in * _BACKWARP_SCALE[lvl])
        vol = lrelu(correlation(f1, warped))
        feat = jnp.concatenate([vol, f1, flow_in, feat_up], axis=-1)
    feat = jnp.concatenate([lrelu(conv2d(d["one"], feat)), feat], -1)
    feat = jnp.concatenate([lrelu(conv2d(d["two"], feat)), feat], -1)
    feat = jnp.concatenate([lrelu(conv2d(d["thr"], feat)), feat], -1)
    feat = jnp.concatenate([lrelu(conv2d(d["fou"], feat)), feat], -1)
    feat = jnp.concatenate([lrelu(conv2d(d["fiv"], feat)), feat], -1)
    flow = conv2d(d["six"], feat)
    return {"flow": flow, "feat": feat}


def _refine(params, feat):
    dils = [1, 2, 4, 8, 16, 1, 1]
    x = feat
    for i, (p, dil) in enumerate(zip(params["refiner"], dils)):
        x = conv2d(p, x, padding=dil, dilation=dil)
        if i < len(params["refiner"]) - 1:
            x = lrelu(x)
    return x


def pwcnet_raw_flow(params, first, second):
    """Network.forward (pwcnet.py:239-249): coarse-to-fine flow at 1/4 res."""
    f1 = _extract(params, first)
    f2 = _extract(params, second)
    est = _decode(params["decoders"][6], 6, f1[-1], f2[-1], None)
    est = _decode(params["decoders"][5], 5, f1[-2], f2[-2], est)
    est = _decode(params["decoders"][4], 4, f1[-3], f2[-3], est)
    est = _decode(params["decoders"][3], 3, f1[-4], f2[-4], est)
    est = _decode(params["decoders"][2], 2, f1[-5], f2[-5], est)
    return est["flow"] + _refine(params, est["feat"])


def pwcnet_flow(params, source, target):
    """PWCNet.forward (pwcnet.py:266-299): resize to /64 multiples, run
    net(target, source), upscale x20 and rescale to input size.

    source/target: (B, H, W, 3) in [0, 1]. Returns flow (B, H, W, 2)."""
    B, H, W, _ = source.shape
    Hp = int(math.ceil(H / 64.0) * 64)
    Wp = int(math.ceil(W / 64.0) * 64)
    s = _resize(source, Hp, Wp)
    t = _resize(target, Hp, Wp)
    flow = pwcnet_raw_flow(params, t, s)
    flow = 20.0 * _resize(flow, H, W)
    return flow * jnp.asarray([W / Wp, H / Hp])


def make_aligned_loss_fn(params):
    """AlignedLoss flow_fn (loss_utils.py:161-189): given (pred, target)
    (H, W, 3), returns (aligned_pred, flow_mask) with the flow net frozen."""

    def flow_fn(pred, target):
        flow = jax.lax.stop_gradient(
            pwcnet_flow(params, pred[None], target[None])
        )
        aligned, mask = backwarp(pred[None], flow)
        return aligned[0], mask[0]

    return flow_fn


# ---------------------------------------------------------------------------
# Torch weight conversion
# ---------------------------------------------------------------------------


def load_torch_weights(path: str) -> dict:
    """Convert the reference's pwcnet-network-default.pth into our pytree."""
    import torch

    return load_torch_state(torch.load(path, map_location="cpu"))


def load_torch_state(sd) -> dict:
    """Convert a torch PWC-Net state dict (tensors or ndarrays) into our
    pytree.

    Torch convs are (cout, cin, kh, kw); ours are (kh, kw, cin, cout).
    ConvTranspose2d stores (cin, cout, kh, kw); with transpose_kernel=True
    our HWIO layout wants (kh, kw, cout_ours=cout, cin...) — handled below.
    """
    sd = {k.replace("module", "net"): np.asarray(v) for k, v in sd.items()}

    def cv(prefix):
        return {
            "w": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)),
            "b": sd[prefix + ".bias"],
        }

    def cvt(prefix):
        # torch ConvTranspose2d stores (cin, cout, kh, kw); equivalent
        # lax.conv_transpose (HWIO, transpose_kernel=False) kernel is the
        # spatially-flipped (kh, kw, cin, cout) tensor.
        w = sd[prefix + ".weight"][:, :, ::-1, ::-1]
        return {
            "w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "b": sd[prefix + ".bias"],
        }

    params: dict[str, Any] = {"extractor": [], "decoders": {}, "refiner": []}
    names = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]
    for n in names:
        params["extractor"].append(
            [cv(f"netExtractor.{n}.{i}") for i in (0, 2, 4)]
        )
    lvl_names = {6: "netSix", 5: "netFiv", 4: "netFou", 3: "netThr", 2: "netTwo"}
    for lvl, n in lvl_names.items():
        d = {
            "one": cv(f"{n}.netOne.0"),
            "two": cv(f"{n}.netTwo.0"),
            "thr": cv(f"{n}.netThr.0"),
            "fou": cv(f"{n}.netFou.0"),
            "fiv": cv(f"{n}.netFiv.0"),
            "six": cv(f"{n}.netSix.0"),
        }
        if lvl < 6:
            d["upflow"] = cvt(f"{n}.netUpflow")
            d["upfeat"] = cvt(f"{n}.netUpfeat")
        params["decoders"][lvl] = d
    for i in range(7):
        params["refiner"].append(cv(f"netRefiner.netMain.{2*i}"))
    return jax.tree.map(jnp.asarray, params)
