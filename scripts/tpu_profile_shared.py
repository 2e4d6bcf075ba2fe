"""Per-stage TPU timing of the exposure-shared (split) render path.

Mirrors the bench configuration: 100k gaussians, 720p, S=11 sub-frames,
CAP=1024, nchan=11 (rgb+mask+6 track ch+depth).
"""

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
from deblur4dgs_tpu.ops.rasterize import (
    composite_tiles_split,
    rasterize_split,
)
from deblur4dgs_tpu.ops.tiling import (
    bin_gaussians_union,
    num_tiles,
    pack_dyn,
    pack_dyn_all,
    pack_static,
    pad_tiles,
)

W, H = 1280, 720
G = 100_000
S = 11
CAP = 1024
NCH = 11  # rgb3 + mask1 + tracks6 + depth1
K = jnp.array([[1000.0, 0.0, W / 2], [0.0, 1000.0, H / 2], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


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
    means = rng.uniform(-1, 1, (G, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 8.0, G)
    means = jnp.asarray(means)
    quats = jnp.asarray(rng.normal(size=(G, 4)).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.uniform(-5.5, -3.5, (G, 3))).astype(np.float32)
    )
    opac = jnp.asarray(rng.uniform(0.3, 0.9, G).astype(np.float32))
    chans = jnp.asarray(rng.uniform(0, 1, (G, NCH - 1)).astype(np.float32))
    # S slightly-perturbed camera poses (exposure window)
    jitters = 0.002 * rng.normal(size=(S, 3)).astype(np.float32)

    @jax.jit
    def proj_all(means):
        def one(dt):
            w2c = EYE4.at[:3, 3].add(dt)
            return project(means, quats, scales, w2c, K, (W, H))

        return jax.vmap(one)(jnp.asarray(jitters))

    projs = timeit("project x11 (vmap)", proj_all, means)

    bin_fn = jax.jit(
        functools.partial(bin_gaussians_union, img_wh=(W, H), cap=CAP)
    )
    shared = timeit("bin_union (sort+scatter)", bin_fn, projs)
    gather_idx, counts, raw, order = shared
    print(
        f"  avg count/tile: {float(counts.mean()):.0f}  max: {int(counts.max())}"
        f"  overflow tiles: {int((raw > CAP).sum())}"
    )

    ps_fn = jax.jit(lambda o, c: pack_static(o, c, gather_idx, order))
    st_data = timeit("pack_static (1x/window)", ps_fn, opac, chans)

    proj0 = jax.tree.map(lambda x: x[0], projs)
    pd_fn = jax.jit(
        lambda p: pack_dyn(p, gather_idx, order, True)
    )
    dyn0 = timeit("pack_dyn (per sub-frame)", pd_fn, proj0)

    pda_fn = jax.jit(
        lambda p: pack_dyn_all(p, gather_idx, order, True)
    )
    dyn_all = timeit("pack_dyn_all (1x/window)", pda_fn, projs)

    tiles_x, tiles_y = num_tiles((W, H))
    Tp = pad_tiles(tiles_x * tiles_y)
    cpad = jnp.concatenate(
        [counts, jnp.zeros((Tp - counts.shape[0],), jnp.int32)]
    )

    tids = jnp.arange(Tp, dtype=jnp.int32)
    comp_fn = jax.jit(
        lambda d, s: composite_tiles_split(d, s, cpad, tids, tiles_x, NCH, True)
    )
    timeit("split fwd composite (1 subfr)", comp_fn, dyn0, st_data)

    def comp_bwd(d, s):
        def loss(d, s):
            acc, tf = composite_tiles_split(
                d, s, cpad, tids, tiles_x, NCH, True
            )
            return jnp.sum(acc) + jnp.sum(tf)

        return jax.grad(loss, argnums=(0, 1))(d, s)

    timeit("split fwd+bwd composite (1 subfr)", jax.jit(comp_bwd), dyn0, st_data)

    # Full window: scan over S with per-sub-frame pack_dyn (current path)
    bg = jnp.zeros((NCH,))

    @jax.jit
    def window_per_sub(means, opac, chans):
        projs = proj_all(means)
        shared = bin_gaussians_union(projs, (W, H), CAP)
        st = pack_static(opac, chans, shared[0], shared[3])

        def sub(c, proj):
            img, alpha = rasterize_split(
                proj, st, shared, bg, (W, H), include_depth=True
            )
            return c + jnp.sum(img) + jnp.sum(alpha), None

        out, _ = jax.lax.scan(sub, 0.0, projs)
        return out

    timeit("window fwd (scan pack_dyn)", window_per_sub, means, opac, chans, n=3)

    @jax.jit
    def window_wide(means, opac, chans):
        projs = proj_all(means)
        shared = bin_gaussians_union(projs, (W, H), CAP)
        st = pack_static(opac, chans, shared[0], shared[3])
        dyn_all = pack_dyn_all(projs, shared[0], shared[3], True)

        def sub(c, dyn):
            img, alpha = rasterize_split(
                None, st, shared, bg, (W, H), include_depth=True,
                dyn_data=dyn,
            )
            return c + jnp.sum(img) + jnp.sum(alpha), None

        out, _ = jax.lax.scan(sub, 0.0, dyn_all)
        return out

    @jax.jit
    def window_fwdbwd(means, opac, chans):
        return jax.grad(window_per_sub)(means, opac, chans)

    timeit("window fwd+bwd (scan pack_dyn)", window_fwdbwd, means, opac, chans, n=3)

    timeit("window fwd (wide gather)", window_wide, means, opac, chans, n=3)

    @jax.jit
    def window_wide_bwd(means, opac, chans):
        return jax.grad(window_wide)(means, opac, chans)

    timeit("window fwd+bwd (wide gather)", window_wide_bwd, means, opac, chans, n=3)

    from deblur4dgs_tpu.ops.rasterize import rasterize_split_buckets
    from deblur4dgs_tpu.ops.tiling import (
        bucket_tiles,
        default_bucket_spec,
        packed_dyn_table,
        packed_static_table,
    )

    spec = default_bucket_spec(tiles_x * tiles_y, CAP)
    print("bucket spec:", spec)

    @jax.jit
    def window_bucketed(means, opac, chans):
        projs = proj_all(means)
        shared = bin_gaussians_union(projs, (W, H), CAP)
        buckets = bucket_tiles(shared[0], shared[1], shared[2], G, spec)
        st_tbl = packed_static_table(opac, chans, shared[3])
        dyn_tbl = packed_dyn_table(projs, shared[3], True)
        st_list = tuple(
            pack_static(opac, chans, gi, shared[3], st_tbl)
            for gi in buckets.gather_idx
        )
        dyn_lists = tuple(
            pack_dyn_all(projs, gi, shared[3], True, dyn_tbl)
            for gi in buckets.gather_idx
        )
        out = 0.0
        for s in range(S):
            img, alpha = rasterize_split_buckets(
                buckets, st_list, tuple(d[s] for d in dyn_lists), bg,
                (W, H), include_depth=True,
            )
            out = out + jnp.sum(img) + jnp.sum(alpha)
        return out

    timeit("window fwd (bucketed)", window_bucketed, means, opac, chans, n=3)

    @jax.jit
    def window_bucketed_bwd(means, opac, chans):
        return jax.grad(window_bucketed)(means, opac, chans)

    timeit("window fwd+bwd (bucketed)", window_bucketed_bwd, means, opac, chans, n=3)


if __name__ == "__main__":
    main()
