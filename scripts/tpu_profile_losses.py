"""Time each dynamic-branch loss term fwd+bwd at 720p with fake inputs."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import deblur4dgs_tpu.train.losses as L
from deblur4dgs_tpu.train.trainer import dilate_mask, downsample_area, rgb_l1_ssim

W, H = 1280, 720
G = 100_000
Bt = 2


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.time()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(H, W)) < 0.3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(2, 8, (H, W, 1)).astype(np.float32))
    tracks3d = jnp.asarray(
        rng.normal(size=(H, W, Bt, 3)).astype(np.float32)
    )
    Ks = jnp.broadcast_to(
        jnp.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]]),
        (Bt, 3, 3),
    )
    P = 256
    q = jnp.asarray(
        np.stack([rng.integers(0, W, P), rng.integers(0, H, P)], -1).astype(
            np.int32
        )
    )

    timeit("dilate_mask 9x9", jax.jit(dilate_mask), mask)

    f = jax.jit(jax.grad(lambda a, b: rgb_l1_ssim(a[None], b[None])))
    timeit("rgb_l1_ssim fwd+bwd", f, img, gt)

    f = jax.jit(
        jax.grad(
            lambda a, b: rgb_l1_ssim(a[None], b[None], mask[None, ..., None])
        )
    )
    timeit("rgb_l1_ssim masked fwd+bwd", f, img, gt)

    def track_loss(t3d):
        pred = t3d.reshape(H * W, Bt, 3).transpose(1, 0, 2)
        h = jnp.einsum("bij,bpj->bpi", Ks, pred)
        md = jnp.maximum(h[..., 2:], 1e-2)
        p2 = h[..., :2] / md
        flat = q[:, 1] * W + q[:, 0]
        at_q = p2[:, flat]
        return jnp.mean(jnp.abs(at_q)) + jnp.mean(1.0 / md[:, flat, 0])

    timeit("track chain fwd+bwd", jax.jit(jax.grad(track_loss)), tracks3d)

    def depth_losses(d):
        disp = 1.0 / jnp.maximum(d, 1e-2)
        tgt = 1.0 / jnp.maximum(depth, 1e-2)
        return L.masked_l1_loss(disp, tgt, mask=mask, quantile=0.98)

    timeit("depth inv-l1 q.98 fwd+bwd", jax.jit(jax.grad(depth_losses)), depth)

    def mask_loss(acc, m):
        return jnp.mean((acc - 1.0) ** 2) + L.masked_l1_loss(
            m, mask[..., None], quantile=0.98
        )

    timeit(
        "mask loss fwd+bwd",
        jax.jit(jax.grad(mask_loss, argnums=(0, 1))),
        depth, mask[..., None],
    )

    def multires(sharp):
        md = downsample_area(mask[..., None], 4)
        sd = downsample_area(sharp, 4) * md
        bd = downsample_area(gt, 4) * md
        return jnp.mean(jnp.abs(sd - jax.lax.stop_gradient(bd)))

    timeit("multires fwd+bwd", jax.jit(jax.grad(multires)), img)

    # exposure stack reductions over S=11 (mean/max/min accumulations)
    stack = jnp.asarray(rng.uniform(0, 1, (11, H, W, 12)).astype(np.float32))

    def reduce_stack(s):
        return (
            jnp.mean(s)
            + jnp.mean(jnp.max(s[..., 3:4], 0))
            + jnp.mean(jnp.min(s[..., -1:], 0))
        )

    timeit("S-stack reductions fwd+bwd", jax.jit(jax.grad(reduce_stack)), stack)

    # density-stat tap accumulation shape
    taps = jnp.asarray(rng.normal(size=(1, 11, G, 2)).astype(np.float32))
    radii = jnp.asarray(
        rng.uniform(0, 20, (1, 11, G)).astype(np.float32)
    )

    def stats(t):
        g = t * jnp.array([W / 2.0, H / 2.0])
        n = jnp.linalg.norm(g, axis=-1)
        vis = radii > 0
        return jnp.sum(jnp.where(vis, n, 0.0))

    timeit("density stats", jax.jit(stats), taps)


if __name__ == "__main__":
    main()
