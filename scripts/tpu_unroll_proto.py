"""Prototype: unrolled-chunk split compositor kernels vs the while-loop ones.

Measures fwd and fwd+bwd at the bench bucket shapes and checks numerics
against the current composite_tiles_split.
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
    _alpha_from_split,
    _scan_masks,
    _transmittance,
    composite_tiles_split,
)
from deblur4dgs_tpu.ops.tiling import TILE, TILE_BLOCK

TILES_X = 80
NCHAN = 11
DEPTH_IN_DYN = True
FD = 7
FS = 1 + NCHAN - 1  # op + 10 static channels


def _fwd_kernel_unrolled(
    tile_ids_ref, counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref,
    *, tiles_x, cap, nchan, depth_in_dyn,
):
    n_static = nchan - (1 if depth_in_dyn else 0)
    _, u_excl = _scan_masks()
    tb = pl.program_id(0)
    nchunks = cap // CHUNK
    for bt in range(TILE_BLOCK):
        tpos = tb * TILE_BLOCK + bt
        count = counts_ref[tpos]
        t = tile_ids_ref[tpos]
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
        py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5

        accum = jnp.zeros((nchan, P), jnp.float32)
        Tc = jnp.ones((P, 1), jnp.float32)
        for ci in range(nchunks):
            off = ci * CHUNK
            ddyn = dyn_ref[bt, :, off : off + CHUNK]
            dst = st_ref[bt, :, off : off + CHUNK]
            op = dst[0:1, :]
            alpha, _, _, _ = _alpha_from_split(ddyn, op, px, py)
            on = (off < count).astype(jnp.float32)
            alpha = alpha * on
            one_minus = 1.0 - alpha
            ex = _transmittance(alpha, u_excl)
            T = Tc * ex
            w = alpha * T
            chans = dst[1 : 1 + n_static, :]
            if depth_in_dyn:
                chans = jnp.concatenate([chans, ddyn[6:7, :]], axis=0)
            accum = accum + jax.lax.dot_general(
                chans, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Tc = T[:, -1:] * one_minus[:, -1:]
        accum_ref[bt] = accum
        from deblur4dgs_tpu.ops.rasterize import _col_to_row

        tfin_ref[pl.ds(bt, 1)] = _col_to_row(Tc)


def _fwd_kernel_unrolled_when(
    tile_ids_ref, counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref,
    *, tiles_x, cap, nchan, depth_in_dyn,
):
    """pl.when-guarded: dead chunks skip compute via refs as carries."""
    from deblur4dgs_tpu.ops.rasterize import _col_to_row, _row_to_col

    n_static = nchan - (1 if depth_in_dyn else 0)
    _, u_excl = _scan_masks()
    tb = pl.program_id(0)
    nchunks = cap // CHUNK
    for bt in range(TILE_BLOCK):
        tpos = tb * TILE_BLOCK + bt
        count = counts_ref[tpos]
        t = tile_ids_ref[tpos]
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
        py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5

        accum_ref[bt] = jnp.zeros((nchan, P), jnp.float32)
        tfin_ref[pl.ds(bt, 1)] = jnp.ones((1, P), jnp.float32)
        for ci in range(nchunks):

            @pl.when(ci * CHUNK < count)
            def _(bt=bt, ci=ci, px=px, py=py):
                off = ci * CHUNK
                ddyn = dyn_ref[bt, :, off : off + CHUNK]
                dst = st_ref[bt, :, off : off + CHUNK]
                op = dst[0:1, :]
                alpha, _, _, _ = _alpha_from_split(ddyn, op, px, py)
                one_minus = 1.0 - alpha
                ex = _transmittance(alpha, u_excl)
                Tc = _row_to_col(tfin_ref[pl.ds(bt, 1)])
                T = Tc * ex
                w = alpha * T
                chans = dst[1 : 1 + n_static, :]
                if depth_in_dyn:
                    chans = jnp.concatenate([chans, ddyn[6:7, :]], axis=0)
                accum_ref[bt] += jax.lax.dot_general(
                    chans, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tfin_ref[pl.ds(bt, 1)] = _col_to_row(
                    T[:, -1:] * one_minus[:, -1:]
                )


def make_fwd(kernel_fn, Tp, cap, nchan):
    kernel = functools.partial(
        kernel_fn, tiles_x=TILES_X, cap=cap, nchan=nchan,
        depth_in_dyn=DEPTH_IN_DYN,
    )
    TB = TILE_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((TB, FD, cap), lambda t, *s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, FS, cap), lambda t, *s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, nchan, P), lambda t, *s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P), lambda t, *s: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, nchan, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, P), jnp.float32),
        ],
    )


def bucket_data(rng, n_tiles, cap, count_lo, count_hi):
    Tp = -(-n_tiles // TILE_BLOCK) * TILE_BLOCK
    dyn = np.zeros((Tp, FD, cap), np.float32)
    # means near tile centers, conservative conics, radius covering tile
    dyn[:, 0, :] = rng.uniform(0, TILES_X * TILE, (Tp, cap))
    dyn[:, 1, :] = rng.uniform(0, 45 * TILE, (Tp, cap))
    dyn[:, 2, :] = rng.uniform(0.01, 0.1, (Tp, cap))
    dyn[:, 3, :] = 0.0
    dyn[:, 4, :] = rng.uniform(0.01, 0.1, (Tp, cap))
    dyn[:, 5, :] = 40.0
    dyn[:, 6, :] = rng.uniform(1, 10, (Tp, cap))
    st = rng.uniform(0.05, 0.9, (Tp, FS, cap)).astype(np.float32)
    counts = rng.integers(count_lo, count_hi + 1, (Tp,)).astype(np.int32)
    ids = rng.permutation(np.arange(3600))[:Tp].astype(np.int32)
    # re-center means into each tile's box so work is realistic
    txs = (ids % TILES_X) * TILE
    tys = (ids // TILES_X) * TILE
    dyn[:, 0, :] = txs[:, None] + rng.uniform(-8, 24, (Tp, cap))
    dyn[:, 1, :] = tys[:, None] + rng.uniform(-8, 24, (Tp, cap))
    return (
        jnp.asarray(dyn), jnp.asarray(st), jnp.asarray(counts),
        jnp.asarray(ids),
    )


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    spec = ((456, 1024, 513, 1024), (456, 512, 257, 512),
            (904, 256, 129, 256), (1800, 128, 1, 128))
    data = [bucket_data(rng, nt, cap, lo, hi) for nt, cap, lo, hi in spec]

    # numerics check on the 512 bucket
    dyn, st, cnt, ids = data[1]
    ref = composite_tiles_split(dyn, st, cnt, ids, TILES_X, NCHAN, True)
    for name, kfn in (
        ("unrolled", _fwd_kernel_unrolled),
        ("unrolled-when", _fwd_kernel_unrolled_when),
    ):
        f = make_fwd(kfn, dyn.shape[0], 512, NCHAN)
        out = f(ids, cnt, dyn, st)
        da = float(jnp.max(jnp.abs(out[0] - ref[0])))
        dt = float(jnp.max(jnp.abs(out[1] - ref[1])))
        print(f"{name}: max|d accum|={da:.2e} max|d tfin|={dt:.2e}")

    # timing: full bucket sweep fwd
    for name, make in (
        ("while(cur)", None),
        ("unrolled", _fwd_kernel_unrolled),
        ("unrolled-when", _fwd_kernel_unrolled_when),
    ):
        total = 0.0
        for (dyn, st, cnt, ids), (nt, cap, lo, hi) in zip(data, spec):
            if make is None:
                fn = functools.partial(
                    composite_tiles_split, tiles_x=TILES_X, nchan=NCHAN,
                    depth_in_dyn=True,
                )
                ms = timeit(lambda d=dyn, s=st, c=cnt, i=ids: fn(d, s, c, i))
            else:
                f = jax.jit(make_fwd(make, dyn.shape[0], cap, NCHAN))
                ms = timeit(f, ids, cnt, dyn, st)
            total += ms
        print(f"{name:16s} fwd sweep {total:7.2f} ms")


if __name__ == "__main__":
    main()
