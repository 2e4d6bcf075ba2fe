"""Pure-JAX reference (oracle) Gaussian rasterizer.

Slow but trivially-correct differentiable compositor used as the numerical
oracle for the Pallas tile kernels (SURVEY.md §7 build order step 2). Works
on any backend; intended for tiny scenes in tests.

Compositing semantics (shared by this oracle and the Pallas kernel):
  * gaussians composited in front-to-back depth order
  * alpha = min(0.999, opacity * exp(-sigma)),
    sigma = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy with conic (a, b, c)
  * alphas below 1/255 are dropped (matching gsplat's cutoff)
  * NO early termination at T < 1e-4: unlike the CUDA reference
    (a perf shortcut, not semantics), we composite everything. The color
    difference vs gsplat is bounded by 1e-4 * |color|.
  * out = sum_i w_i * channel_i + T_final * background, w_i = alpha_i * T_i,
    T_i = prod_{j<i} (1 - alpha_j); alpha_out = 1 - T_final
  * pixel centers at (px + 0.5, py + 0.5)

Transmittance is computed in log space (cumsum of log1p(-alpha)) which makes
the whole compositor a cumsum + matmul — the formulation the Pallas kernel
tiles onto the VPU/MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from deblur4dgs_tpu.ops.projection import Projected, project

ALPHA_CLAMP = 0.999
ALPHA_CUTOFF = 1.0 / 255.0


def composite_pixels(
    pix_xy: jnp.ndarray,  # (P, 2) pixel-center coords
    means2d: jnp.ndarray,  # (G, 2) depth-sorted, front first
    conics: jnp.ndarray,  # (G, 3)
    opacities: jnp.ndarray,  # (G,)
    alive: jnp.ndarray,  # (G,) bool — invalid/padded gaussians contribute 0
    channels: jnp.ndarray,  # (G, D)
    background: jnp.ndarray,  # (D,)
    radii: jnp.ndarray | None = None,  # (G,) bounding-box cutoff (see below)
):
    """Returns (out (P, D), alpha (P,)). Gaussians must be pre-sorted by depth.

    When ``radii`` is given, contributions outside the |dx|,|dy| <= radius
    bounding box are dropped — the same per-pixel cutoff the tiled Pallas
    path applies, making oracle and tiled results bitwise-comparable.
    """
    d = pix_xy[:, None, :] - means2d[None, :, :]  # (P, G, 2)
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy  # (P, G)
    alpha = opacities[None, :] * jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(alpha, ALPHA_CLAMP)
    alpha = jnp.where((sigma < 0) | (alpha < ALPHA_CUTOFF) | ~alive[None, :], 0.0, alpha)
    if radii is not None:
        inbox = (jnp.abs(dx) <= radii[None, :]) & (jnp.abs(dy) <= radii[None, :])
        alpha = jnp.where(inbox, alpha, 0.0)

    log_one_minus = jnp.log1p(-alpha)  # (P, G)
    logT = jnp.cumsum(log_one_minus, axis=-1)
    # T_i = transmittance *before* gaussian i.
    T = jnp.exp(logT - log_one_minus)
    w = alpha * T  # (P, G)
    T_final = jnp.exp(logT[:, -1])
    out = w @ channels + T_final[:, None] * background[None, :]
    return out, 1.0 - T_final


def rasterize_ref(
    proj: Projected,
    opacities: jnp.ndarray,  # (G,)
    channels: jnp.ndarray,  # (G, D)
    background: jnp.ndarray,  # (D,)
    img_wh: tuple[int, int],
    use_radius_cutoff: bool = True,
    pix_chunk: int | None = None,
):
    """Rasterize projected gaussians to a full image.

    Pixels are processed in lax.map chunks bounding the (P, G) working set
    (the dense mask is the oracle's memory hog — a 512x288 render of 11k
    gaussians would otherwise materialize several (147k, 11k) arrays).
    Per-pixel math is unchanged by the chunking.

    Returns (img (H, W, D), alpha (H, W)).
    """
    import jax

    W, H = img_wh
    key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(key, stable=True)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    ops = opacities[order]
    alive = proj.valid[order]
    chans = channels[order]
    radii = proj.radii[order] if use_radius_cutoff else None

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (P, 2), x first
    P = H * W
    G = means2d.shape[0]
    D = channels.shape[-1]
    if pix_chunk is None:
        pix_chunk = max(min(P, (1 << 26) // max(G, 1)), 256)

    if P <= pix_chunk:
        out, alpha = composite_pixels(
            pix, means2d, conics, ops, alive, chans, background, radii
        )
        return out.reshape(H, W, D), alpha.reshape(H, W)

    nb = -(-P // pix_chunk)
    pad = nb * pix_chunk - P
    pix_p = jnp.pad(pix, ((0, pad), (0, 0))).reshape(nb, pix_chunk, 2)
    out, alpha = jax.lax.map(
        lambda p: composite_pixels(
            p, means2d, conics, ops, alive, chans, background, radii
        ),
        pix_p,
    )
    out = out.reshape(nb * pix_chunk, D)[:P]
    alpha = alpha.reshape(nb * pix_chunk)[:P]
    return out.reshape(H, W, D), alpha.reshape(H, W)


def render_ref(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    channels: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    img_wh: tuple[int, int],
    background: jnp.ndarray | float = 0.0,
):
    """Project + rasterize in one call (oracle end-to-end path)."""
    D = channels.shape[-1]
    if not hasattr(background, "shape") or background.shape == ():
        background = jnp.full((D,), background, dtype=jnp.float32)
    proj = project(means, quats, scales, viewmat, K, img_wh)
    return rasterize_ref(proj, opacities, channels, background, img_wh)
