"""Per-stage TPU timing of the rasterization pipeline at 720p."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import functools

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize import composite_tiles, rasterize
from deblur4dgs_tpu.ops.tiling import bin_gaussians_pairs, pack_and_gather

W, H = 1280, 720
G = 100_000
CAP = 1024
K = jnp.array([[1000.0, 0.0, W / 2], [0.0, 1000.0, H / 2], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    means = rng.uniform(-1, 1, (G, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 8.0, G)
    quats = jnp.asarray(rng.normal(size=(G, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.uniform(-5.5, -3.5, (G, 3))).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, G).astype(np.float32))
    chans = jnp.asarray(rng.uniform(0, 1, (G, 3)).astype(np.float32))
    means = jnp.asarray(means)

    proj_fn = jax.jit(lambda m, q, s: project(m, q, s, EYE4, K, (W, H)))
    proj = timeit("project", proj_fn, means, quats, scales)

    bin_fn = jax.jit(
        functools.partial(bin_gaussians_pairs, img_wh=(W, H), cap=CAP)
    )
    binning = timeit("bin (sort+scatter)", bin_fn, proj)

    gather_fn = jax.jit(
        functools.partial(pack_and_gather, img_wh=(W, H), cap=CAP)
    )
    tb = timeit("bin+pack+gather", gather_fn, proj, opac, chans)
    print(f"  avg count/tile: {float(tb.counts.mean()):.0f}  max: {int(tb.counts.max())}  overflow tiles: {int((tb.raw_counts > CAP).sum())}")

    tiles_x = int(tb.tiles_xy[0])
    comp_fn = jax.jit(
        lambda td, c: composite_tiles(td, c, tiles_x, 3)
    )
    timeit("pallas fwd composite", comp_fn, tb.tile_data, tb.counts)

    def comp_bwd(td, c):
        def loss(td):
            acc, tf = composite_tiles(td, c, tiles_x, 3)
            return jnp.sum(acc) + jnp.sum(tf)
        return jax.grad(loss)(td)

    timeit("pallas fwd+bwd composite", jax.jit(comp_bwd), tb.tile_data, tb.counts)

    full_fwd = jax.jit(
        lambda m, q, s, o, c: rasterize(
            project(m, q, s, EYE4, K, (W, H)), o, c, jnp.zeros(3), (W, H),
            cap=CAP,
        )[0]
    )
    timeit("full raster fwd", full_fwd, means, quats, scales, opac, chans)

    def full_bwd(m, q, s, o, c):
        def loss(args):
            m, q, s, o, c = args
            img, alpha, _ = rasterize(
                project(m, q, s, EYE4, K, (W, H)), o, c, jnp.zeros(3), (W, H),
                cap=CAP,
            )
            return jnp.mean(img**2) + jnp.mean(alpha)
        return jax.grad(loss)((m, q, s, o, c))

    timeit("full raster fwd+bwd", jax.jit(full_bwd), means, quats, scales, opac, chans)


if __name__ == "__main__":
    main()
