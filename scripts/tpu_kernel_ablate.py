"""Ablate the split fwd compositor kernel body to locate its cost on TPU.

Variants: full, no-exp, no-cumprod, no-dot, load-only. Run at the bench
shape (3600 tiles, CAP=1024, nchan=12, counts ~ bench distribution).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deblur4dgs_tpu.ops.rasterize import (
    CHUNK,
    P,
    _lane_cumprod_exclusive,
)
from deblur4dgs_tpu.ops.tiling import TILE, TILE_BLOCK

TILES_X, TILES_Y = 80, 45
T = TILES_X * TILES_Y
TP = -(-T // TILE_BLOCK) * TILE_BLOCK
CAP = 1024
NCH = 11
FD = 7  # mx,my,ca,cb,cc,r,depth
FS = 1 + NCH - 1  # opacity + 10 static channels


def make_unrolled_kernel(use_mm_scan):
    """Python-unrolled chunk loop: static slices, pl.when count guards."""
    from deblur4dgs_tpu.ops.rasterize import _scan_masks, _transmittance

    def kernel(counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref):
        _, u_excl = _scan_masks()
        tb = pl.program_id(0)
        for bt in range(TILE_BLOCK):
            t = tb * TILE_BLOCK + bt
            count = counts_ref[t]
            tx = (t % TILES_X).astype(jnp.float32)
            ty = (t // TILES_X).astype(jnp.float32)
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
            py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5
            accum = jnp.zeros((P, NCH), jnp.float32)
            Tc = jnp.ones((P, 1), jnp.float32)
            for ci in range(CAP // CHUNK):
                ddyn = dyn_ref[bt, :, ci * CHUNK : (ci + 1) * CHUNK]
                dst = st_ref[bt, :, ci * CHUNK : (ci + 1) * CHUNK]
                op = dst[0:1, :]
                mx = ddyn[0:1, :]
                my = ddyn[1:2, :]
                ca = ddyn[2:3, :]
                cb = ddyn[3:4, :]
                cc = ddyn[4:5, :]
                r = ddyn[5:6, :]
                dx = px - mx
                dy = py - my
                sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                alpha_raw = op * jnp.exp(-jnp.maximum(sigma, 0.0))
                live = (
                    (jnp.abs(dx) <= r)
                    & (jnp.abs(dy) <= r)
                    & (sigma >= 0.0)
                    & (alpha_raw >= 1.0 / 255.0)
                )
                alpha = jnp.where(live, jnp.minimum(alpha_raw, 0.999), 0.0)
                on = (ci * CHUNK < count).astype(jnp.float32)
                alpha = alpha * on  # dead chunks contribute nothing
                one_minus = 1.0 - alpha
                if use_mm_scan:
                    ex = _transmittance(alpha, u_excl)
                else:
                    ex = _lane_cumprod_exclusive(one_minus)
                T = Tc * ex
                w = alpha * T
                chans = jnp.concatenate(
                    [dst[1:FS, :], ddyn[6:7, :]], axis=0
                )
                accum = accum + jax.lax.dot_general(
                    w, chans, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                Tc = T[:, -1:] * one_minus[:, -1:]
            accum_ref[bt] = accum
            tfin_ref[bt] = Tc

    return kernel


def make_unrolled_when_kernel():
    """Unrolled with pl.when guards: dead chunks skip compute entirely."""
    from deblur4dgs_tpu.ops.rasterize import _scan_masks, _transmittance

    def kernel(counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref):
        _, u_excl = _scan_masks()
        tb = pl.program_id(0)
        for bt in range(TILE_BLOCK):
            t = tb * TILE_BLOCK + bt
            count = counts_ref[t]
            tx = (t % TILES_X).astype(jnp.float32)
            ty = (t // TILES_X).astype(jnp.float32)
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
            py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5
            accum_ref[bt] = jnp.zeros((P, NCH), jnp.float32)
            tfin_ref[bt] = jnp.ones((P, 1), jnp.float32)
            for ci in range(CAP // CHUNK):

                @pl.when(ci * CHUNK < count)
                def _(bt=bt, ci=ci, px=px, py=py):
                    ddyn = dyn_ref[bt, :, ci * CHUNK : (ci + 1) * CHUNK]
                    dst = st_ref[bt, :, ci * CHUNK : (ci + 1) * CHUNK]
                    op = dst[0:1, :]
                    mx = ddyn[0:1, :]
                    my = ddyn[1:2, :]
                    ca = ddyn[2:3, :]
                    cb = ddyn[3:4, :]
                    cc = ddyn[4:5, :]
                    r = ddyn[5:6, :]
                    dx = px - mx
                    dy = py - my
                    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                    alpha_raw = op * jnp.exp(-jnp.maximum(sigma, 0.0))
                    live = (
                        (jnp.abs(dx) <= r)
                        & (jnp.abs(dy) <= r)
                        & (sigma >= 0.0)
                        & (alpha_raw >= 1.0 / 255.0)
                    )
                    alpha = jnp.where(live, jnp.minimum(alpha_raw, 0.999), 0.0)
                    one_minus = 1.0 - alpha
                    ex = _transmittance(alpha, u_excl)
                    Tc = tfin_ref[bt]
                    T = Tc * ex
                    w = alpha * T
                    chans = jnp.concatenate(
                        [dst[1:FS, :], ddyn[6:7, :]], axis=0
                    )
                    accum_ref[bt] += jax.lax.dot_general(
                        w, chans, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tfin_ref[bt] = T[:, -1:] * one_minus[:, -1:]

    return kernel


def make_kernel(variant):
    if variant == "unroll-mm":
        return make_unrolled_kernel(True)
    if variant == "unroll-hs":
        return make_unrolled_kernel(False)
    if variant == "unroll-when":
        return make_unrolled_when_kernel()

    def kernel(counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref):
        tb = pl.program_id(0)
        for bt in range(TILE_BLOCK):
            t = tb * TILE_BLOCK + bt
            count = counts_ref[t]
            nchunks = pl.cdiv(count, CHUNK)
            tx = (t % TILES_X).astype(jnp.float32)
            ty = (t // TILES_X).astype(jnp.float32)
            pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
            py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5
            accum_ref[bt] = jnp.zeros((P, NCH), jnp.float32)

            def body(ci, Tc, bt=bt, px=px, py=py):
                off = pl.multiple_of(ci * CHUNK, CHUNK)
                ddyn = dyn_ref[bt, :, pl.ds(off, CHUNK)]
                dst = st_ref[bt, :, pl.ds(off, CHUNK)]
                if variant == "load-only":
                    accum_ref[bt] += jnp.sum(ddyn) + jnp.sum(dst)
                    return Tc
                op = dst[0:1, :]
                mx = ddyn[0:1, :]
                my = ddyn[1:2, :]
                ca = ddyn[2:3, :]
                cb = ddyn[3:4, :]
                cc = ddyn[4:5, :]
                r = ddyn[5:6, :]
                dx = px - mx
                dy = py - my
                sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                if variant == "no-exp":
                    alpha_raw = op * (1.0 / (1.0 + jnp.maximum(sigma, 0.0)))
                else:
                    alpha_raw = op * jnp.exp(-jnp.maximum(sigma, 0.0))
                live = (
                    (jnp.abs(dx) <= r)
                    & (jnp.abs(dy) <= r)
                    & (sigma >= 0.0)
                    & (alpha_raw >= 1.0 / 255.0)
                )
                alpha = jnp.where(live, jnp.minimum(alpha_raw, 0.999), 0.0)
                one_minus = 1.0 - alpha
                if variant == "no-cumprod":
                    Tr = Tc
                else:
                    ex = _lane_cumprod_exclusive(one_minus)
                    Tr = Tc * ex
                w = alpha * Tr
                chans = jnp.concatenate(
                    [dst[1:FS, :], ddyn[6:7, :]], axis=0
                )
                if variant == "no-dot":
                    accum_ref[bt] += jnp.sum(w)[None, None]
                else:
                    accum_ref[bt] += jax.lax.dot_general(
                        w, chans, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                if variant == "no-cumprod":
                    return Tr * one_minus[:, -1:]
                return Tr[:, -1:] * one_minus[:, -1:]

            Tfin = jax.lax.fori_loop(
                0, nchunks, body, jnp.ones((P, 1), jnp.float32)
            )
            tfin_ref[bt] = Tfin

    return kernel


def run_variant(variant, counts, dyn, st, n=20):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TP // TILE_BLOCK,),
        in_specs=[
            pl.BlockSpec((TILE_BLOCK, FD, CAP), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BLOCK, FS, CAP), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_BLOCK, P, NCH), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BLOCK, P, 1), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    fn = jax.jit(
        lambda c, d, s: pl.pallas_call(
            make_kernel(variant),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((TP, P, NCH), jnp.float32),
                jax.ShapeDtypeStruct((TP, P, 1), jnp.float32),
            ],
        )(c, d, s)
    )
    out = fn(counts, dyn, st)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(counts, dyn, st)
    jax.block_until_ready(out)
    print(f"{variant:12s} {(time.time()-t0)/n*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    # counts distribution like the bench: mean 210, some full tiles
    counts = np.minimum(
        rng.gamma(1.2, 180, TP).astype(np.int32), CAP
    )
    counts = jnp.asarray(counts)
    print(f"avg count {float(counts.mean()):.0f}")
    dyn = rng.normal(size=(TP, FD, CAP)).astype(np.float32)
    dyn[:, 5, :] = 30.0  # radius: keep everything in-box
    dyn[:, 0, :] = rng.uniform(0, 1280, (TP, CAP))
    dyn[:, 1, :] = rng.uniform(0, 720, (TP, CAP))
    dyn[:, 2, :] = 0.05
    dyn[:, 3, :] = 0.0
    dyn[:, 4, :] = 0.05
    st = rng.uniform(0.1, 0.9, (TP, FS, CAP)).astype(np.float32)
    dyn = jnp.asarray(dyn)
    st = jnp.asarray(st)

    for v in ["full", "unroll-mm", "unroll-when", "load-only"]:
        run_variant(v, counts, dyn, st)


if __name__ == "__main__":
    main()
