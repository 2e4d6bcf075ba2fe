"""Data-layer helpers (counterpart of /root/reference/flow3d/data/utils.py):
coordinate normalization, TAPIR track-info parsing, track unprojection,
depth -> point -> normal, masked median blur.

numpy/jnp only; these run once at dataset-load time on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_coords(coords, h, w):
    """Pixel coords -> [-1, 1] grid coords (utils.py:25-33)."""
    assert coords.shape[-1] == 2
    return coords / jnp.asarray([w - 1.0, h - 1.0]) * 2.0 - 1.0


def parse_tapir_track_info(occlusions, expected_dist):
    """TAPIR occlusion/uncertainty logits -> visible/invisible/confidence
    masks (utils.py:53-66)."""
    visibility = 1.0 - jax.nn.sigmoid(occlusions)
    confidence = 1.0 - jax.nn.sigmoid(expected_dist)
    valid_visible = visibility * confidence > 0.5
    valid_invisible = (1.0 - visibility) * confidence > 0.5
    confidence = confidence * (valid_visible | valid_invisible)
    return valid_visible, valid_invisible, confidence


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) or (H, W, C) at float pixel coords (N, 2) with border
    padding (torch grid_sample align_corners=True equivalent for pixel
    coords)."""
    H, W = img.shape[:2]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = jnp.clip(xy[:, 0], 0.0, W - 1.0)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out[..., 0] if squeeze else out


def get_tracks_3d_for_query_frame(
    query_index: int,
    query_img: jnp.ndarray,  # (H, W, 3)
    tracks_2d: jnp.ndarray,  # (N, T, 4): xy + occlusion + expected_dist
    depths: jnp.ndarray,  # (T, H, W)
    masks: jnp.ndarray,  # (T, H, W)
    inv_Ks: jnp.ndarray,  # (T, 3, 3)
    c2ws: jnp.ndarray,  # (T, 4, 4)
):
    """Unproject TAPIR 2D tracks to 3D (utils.py:69-131 semantics).

    Returns (tracks_3d (N,T,3), colors (N,3), visibles, invisibles,
    confidences (N,T))."""
    T, H, W = depths.shape
    t2d = jnp.swapaxes(tracks_2d, 0, 1)  # (T, N, 4)
    xy, occs, dists = t2d[..., :2], t2d[..., 2], t2d[..., 3]
    visibles, invisibles, confidences = parse_tapir_track_info(occs, dists)

    track_depths = jax.vmap(bilinear_sample)(depths, xy)  # (T, N)
    xy_h = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
    pts_cam = jnp.einsum("tij,tnj->tni", inv_Ks, xy_h) * track_depths[..., None]
    pts_h = jnp.concatenate([pts_cam, jnp.ones_like(pts_cam[..., :1])], -1)
    tracks_3d = jnp.einsum("tij,tnj->tni", c2ws, pts_h)[..., :3]

    colors = bilinear_sample(query_img, xy[query_index])  # (N, 3)
    return (
        jnp.swapaxes(tracks_3d, 0, 1),
        colors,
        jnp.swapaxes(visibles, 0, 1),
        jnp.swapaxes(invisibles, 0, 1),
        jnp.swapaxes(confidences, 0, 1),
    )


def depth_to_points_world(
    depth: jnp.ndarray, K: jnp.ndarray, w2c: jnp.ndarray
) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) world points (utils.py depth2point_world)."""
    H, W = depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)  # (H, W, 3)
    cam = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K), pix) * depth[..., None]
    c2w = jnp.linalg.inv(w2c)
    return jnp.einsum("ij,hwj->hwi", c2w[:3, :3], cam) + c2w[:3, 3]


def normal_from_depth_image(
    depth: jnp.ndarray, K: jnp.ndarray, w2c: jnp.ndarray
) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) world-space normals via central differences
    of the unprojected point cloud (utils.py:331-360)."""
    xyz = depth_to_points_world(depth, K, w2c)
    top = xyz[:-2, 1:-1]
    bottom = xyz[2:, 1:-1]
    left = xyz[1:-1, :-2]
    right = xyz[1:-1, 2:]
    n = jnp.cross(right - left, top - bottom)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def masked_median_blur(imgs: np.ndarray, masks: np.ndarray, ksize: int = 11):
    """Median filter applied only where masked, for depth cleanup
    (utils.py:192-250 analog). imgs: (T, H, W); masks: (T, H, W)."""
    import scipy.ndimage as ndi

    out = imgs.copy()
    for i in range(imgs.shape[0]):
        med = ndi.median_filter(imgs[i], size=ksize)
        m = masks[i] > 0.5
        out[i][m] = med[m]
    return out
