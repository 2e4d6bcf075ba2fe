"""Prototype: sub-frame-fused split compositor (all S=11 sub-frames in one
kernel, shared static payload + shared chunk loop) vs S separate sweeps.
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
    EARLY_STOP_T,
    P,
    _alpha_from_split,
    _col_to_row,
    _row_to_col,
    _scan_masks,
    _transmittance,
    composite_tiles_split,
)
from deblur4dgs_tpu.ops.tiling import TILE, TILE_BLOCK

TILES_X = 80
NCHAN = 11
S = 11
FD = 7
FS = 1 + NCHAN - 1


def _fwd_kernel_fused(
    tile_ids_ref, counts_ref, dyn_ref, st_ref, accum_ref, tfin_ref,
    *, tiles_x, cap, nchan, depth_in_dyn, ns, tb_rows,
):
    """dyn: (TB, S, FD, cap); accum out: (TB, S, nchan, P); tfin: (TB, S, P)."""
    n_static = nchan - (1 if depth_in_dyn else 0)
    _, u_excl = _scan_masks()
    tb = pl.program_id(0)
    for bt in range(tb_rows):
        tpos = tb * tb_rows + bt
        count = counts_ref[tpos]
        t = tile_ids_ref[tpos]
        nchunks = pl.cdiv(count, CHUNK)

        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * TILE + (pid % TILE).astype(jnp.float32) + 0.5
        py = ty * TILE + (pid // TILE).astype(jnp.float32) + 0.5

        for s in range(ns):
            accum_ref[bt, s] = jnp.zeros((nchan, P), jnp.float32)

        def body(carry, bt=bt, px=px, py=py):
            ci = carry[0]
            Ts = carry[1]  # tuple of (P, 1) per sub-frame
            off = pl.multiple_of(ci * CHUNK, CHUNK)
            dst = st_ref[bt, :, pl.ds(off, CHUNK)]
            op = dst[0:1, :]
            st_chans = dst[1 : 1 + n_static, :]
            new_Ts = []
            for s in range(ns):
                ddyn = dyn_ref[bt, s, :, pl.ds(off, CHUNK)]
                alpha, _, _, _ = _alpha_from_split(ddyn, op, px, py)
                one_minus = 1.0 - alpha
                ex = _transmittance(alpha, u_excl)
                T = Ts[s] * ex
                w = alpha * T
                chans = st_chans
                if depth_in_dyn:
                    chans = jnp.concatenate([chans, ddyn[6:7, :]], axis=0)
                accum_ref[bt, s] += jax.lax.dot_general(
                    chans, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                new_Ts.append(T[:, -1:] * one_minus[:, -1:])
            return (ci + 1, tuple(new_Ts))

        def cond(carry):
            ci = carry[0]
            tmax = carry[1][0]
            for s in range(1, ns):
                tmax = jnp.maximum(tmax, carry[1][s])
            return (ci < nchunks) & (jnp.max(tmax) >= EARLY_STOP_T)

        init = (jnp.int32(0),
                tuple(jnp.ones((P, 1), jnp.float32) for _ in range(ns)))
        final = jax.lax.while_loop(cond, body, init)
        for s in range(ns):
            tfin_ref[bt, pl.ds(s, 1)] = _col_to_row(final[1][s])


def make_fused_fwd(Tp, cap, nchan, ns, tb):
    kernel = functools.partial(
        _fwd_kernel_fused, tiles_x=TILES_X, cap=cap, nchan=nchan,
        depth_in_dyn=True, ns=ns, tb_rows=tb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, ns, FD, cap), lambda t, *s: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, FS, cap), lambda t, *s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, ns, nchan, P), lambda t, *s: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ns, P), lambda t, *s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, ns, nchan, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, ns, P), jnp.float32),
        ],
    )


def bucket_data(rng, n_tiles, cap, count_lo, count_hi, tb):
    Tp = -(-n_tiles // tb) * tb
    dyn = np.zeros((Tp, S, FD, cap), np.float32)
    ids = rng.permutation(np.arange(3600))[:Tp].astype(np.int32)
    txs = (ids % TILES_X) * TILE
    tys = (ids // TILES_X) * TILE
    base_x = txs[:, None] + rng.uniform(-8, 24, (Tp, cap))
    base_y = tys[:, None] + rng.uniform(-8, 24, (Tp, cap))
    for s in range(S):
        dyn[:, s, 0, :] = base_x + rng.uniform(-1, 1, (Tp, cap))
        dyn[:, s, 1, :] = base_y + rng.uniform(-1, 1, (Tp, cap))
        dyn[:, s, 2, :] = rng.uniform(0.01, 0.1, (Tp, cap))
        dyn[:, s, 3, :] = 0.0
        dyn[:, s, 4, :] = rng.uniform(0.01, 0.1, (Tp, cap))
        dyn[:, s, 5, :] = 40.0
        dyn[:, s, 6, :] = rng.uniform(1, 10, (Tp, cap))
    st = rng.uniform(0.05, 0.9, (Tp, FS, cap)).astype(np.float32)
    counts = rng.integers(count_lo, count_hi + 1, (Tp,)).astype(np.int32)
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
    # (n_tiles, cap, lo, hi, TB_fused)
    spec = ((456, 1024, 513, 1024, 2), (456, 512, 257, 512, 4),
            (904, 256, 129, 256, 8), (1800, 128, 1, 128, 8))
    data = [bucket_data(rng, nt, cap, lo, hi, tb)
            for nt, cap, lo, hi, tb in spec]

    # numerics vs per-sub-frame compositor on the 512 bucket
    dyn, st, cnt, ids = data[1]
    f = jax.jit(make_fused_fwd(dyn.shape[0], 512, NCHAN, S, 4))
    out = f(ids, cnt, dyn, st)
    ref_acc = []
    ref_tf = []
    for s in range(S):
        a, t = composite_tiles_split(
            dyn[:, s], st, cnt, ids, TILES_X, NCHAN, True
        )
        ref_acc.append(a)
        ref_tf.append(t)
    ra = jnp.stack(ref_acc, 1)
    rt = jnp.stack(ref_tf, 1)
    print("fused: max|d accum|=%.2e max|d tfin|=%.2e" % (
        float(jnp.max(jnp.abs(out[0] - ra))),
        float(jnp.max(jnp.abs(out[1] - rt))),
    ))

    tot_sep = 0.0
    tot_fused = 0.0
    for (dyn, st, cnt, ids), (nt, cap, lo, hi, tb) in zip(data, spec):
        fn = functools.partial(
            composite_tiles_split, tiles_x=TILES_X, nchan=NCHAN,
            depth_in_dyn=True,
        )

        def sep(dyn=dyn, st=st, cnt=cnt, ids=ids, fn=fn):
            return [fn(dyn[:, s], st, cnt, ids) for s in range(S)]

        ms_sep = timeit(sep, n=5)
        f = jax.jit(make_fused_fwd(dyn.shape[0], cap, NCHAN, S, tb))
        ms_fused = timeit(f, ids, cnt, dyn, st, n=5)
        print(f"cap {cap:5d}: separate {ms_sep:7.2f} ms  fused {ms_fused:7.2f} ms")
        tot_sep += ms_sep
        tot_fused += ms_fused
    print(f"window fwd total: separate {tot_sep:.2f} ms  fused {tot_fused:.2f} ms")


if __name__ == "__main__":
    main()
