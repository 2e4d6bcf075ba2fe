"""Fused exposure-window compositor kernels vs the XLA reference.

composite_tiles_window runs ALL S sub-frames of a tile in one kernel sweep
(dyn (T, S, Fd, cap), shared static payload). Forward and custom-VJP
gradients must match the per-sub-frame XLA reference compositor (which has
no early termination); differences are bounded by the EARLY_STOP_T window
truncation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.ops.rasterize import (
    CHUNK,
    P,
    _composite_split_xla,
    _composite_window_xla,
    composite_tiles_split,
    composite_tiles_window,
)
from deblur4dgs_tpu.ops.tiling import TILE, TILE_BLOCK

TILES_X = 4
NCHAN = 5  # rgb + mask + depth
S = 3
FD = 7
FS = 1 + NCHAN - 1


def make_data(seed, n_tiles=8, cap=2 * CHUNK, lo=1, hi=None):
    rng = np.random.default_rng(seed)
    hi = hi or cap
    Tp = -(-n_tiles // TILE_BLOCK) * TILE_BLOCK
    ids = rng.permutation(np.arange(max(n_tiles, 12)))[:Tp].astype(np.int32)
    dyn = np.zeros((Tp, S, FD, cap), np.float32)
    txs = (ids % TILES_X) * TILE
    tys = (ids // TILES_X) * TILE
    base_x = txs[:, None] + rng.uniform(-4, 20, (Tp, cap))
    base_y = tys[:, None] + rng.uniform(-4, 20, (Tp, cap))
    for s in range(S):
        dyn[:, s, 0] = base_x + rng.uniform(-1, 1, (Tp, cap))
        dyn[:, s, 1] = base_y + rng.uniform(-1, 1, (Tp, cap))
        dyn[:, s, 2] = rng.uniform(0.02, 0.2, (Tp, cap))
        dyn[:, s, 3] = rng.uniform(-0.01, 0.01, (Tp, cap))
        dyn[:, s, 4] = rng.uniform(0.02, 0.2, (Tp, cap))
        dyn[:, s, 5] = 30.0
        dyn[:, s, 6] = rng.uniform(1.0, 9.0, (Tp, cap))
    st = rng.uniform(0.05, 0.7, (Tp, FS, cap)).astype(np.float32)
    counts = rng.integers(lo, hi + 1, (Tp,)).astype(np.int32)
    # pack invariant: slots beyond a tile's count are zero sentinel rows
    # (tiling gathers them from the zero table row)
    slot = np.arange(cap)[None, :]
    live = (slot < counts[:, None]).astype(np.float32)
    dyn *= live[:, None, None, :]
    st *= live[:, None, :]
    return (
        jnp.asarray(dyn), jnp.asarray(st), jnp.asarray(counts),
        jnp.asarray(ids),
    )


class TestWindowKernelForward:
    def test_matches_xla_reference(self):
        dyn, st, cnt, ids = make_data(0)
        acc_k, tf_k = composite_tiles_window(
            dyn, st, cnt, ids, TILES_X, NCHAN, True
        )
        acc_x, tf_x = _composite_window_xla(
            dyn, st, cnt, ids, TILES_X, NCHAN, True
        )
        np.testing.assert_allclose(acc_k, acc_x, atol=2e-4)
        np.testing.assert_allclose(tf_k, tf_x, atol=2e-4)

    def test_matches_per_subframe_kernels(self):
        dyn, st, cnt, ids = make_data(1)
        acc_k, tf_k = composite_tiles_window(
            dyn, st, cnt, ids, TILES_X, NCHAN, True
        )
        for s in range(S):
            acc_s, tf_s = composite_tiles_split(
                dyn[:, s], st, cnt, ids, TILES_X, NCHAN, True
            )
            # both kernels early-stop, but at different granularity
            # (window-max vs per-sub-frame transmittance)
            np.testing.assert_allclose(acc_k[:, s], acc_s, atol=3e-4)
            np.testing.assert_allclose(tf_k[:, s], tf_s, atol=3e-4)

    def test_no_depth_channel(self):
        dyn, st, cnt, ids = make_data(2)
        dyn6 = dyn[:, :, :6]
        acc_k, tf_k = composite_tiles_window(
            dyn6, st, cnt, ids, TILES_X, NCHAN - 1, False
        )
        acc_x, tf_x = _composite_window_xla(
            dyn6, st, cnt, ids, TILES_X, NCHAN - 1, False
        )
        np.testing.assert_allclose(acc_k, acc_x, atol=2e-4)

    def test_sentinel_counts_zero(self):
        dyn, st, cnt, ids = make_data(3)
        cnt = cnt.at[2].set(0)
        acc_k, tf_k = composite_tiles_window(
            dyn, st, cnt, ids, TILES_X, NCHAN, True
        )
        assert float(jnp.abs(acc_k[2]).max()) == 0.0
        np.testing.assert_allclose(tf_k[2], 1.0)


class TestWindowKernelGrads:
    def test_grads_match_xla(self):
        dyn, st, cnt, ids = make_data(4)

        def loss(fn, d, s):
            acc, tf = fn(d, s, cnt, ids, TILES_X, NCHAN, True)
            return jnp.sum(acc * 1.3) + jnp.sum(jnp.cos(tf))

        gk = jax.grad(lambda d, s: loss(composite_tiles_window, d, s),
                      argnums=(0, 1))(dyn, st)
        gx = jax.grad(lambda d, s: loss(_composite_window_xla, d, s),
                      argnums=(0, 1))(dyn, st)
        # fp32 suffix-from-total recomputation; tolerance scales with the
        # gradient magnitude (same bound as the per-sub-frame kernels)
        for a, b in zip(gk, gx):
            scale = float(jnp.max(jnp.abs(b))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
            )

    def test_static_grad_accumulates_over_subframes(self):
        dyn, st, cnt, ids = make_data(5)

        def loss_window(s):
            acc, tf = composite_tiles_window(
                dyn, s, cnt, ids, TILES_X, NCHAN, True
            )
            return jnp.sum(acc) + jnp.sum(tf)

        def loss_split(s):
            tot = 0.0
            for si in range(S):
                acc, tf = composite_tiles_split(
                    dyn[:, si], s, cnt, ids, TILES_X, NCHAN, True
                )
                tot = tot + jnp.sum(acc) + jnp.sum(tf)
            return tot

        gw = jax.grad(loss_window)(st)
        gs = jax.grad(loss_split)(st)
        scale = float(jnp.max(jnp.abs(gs))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(gw) / scale, np.asarray(gs) / scale, atol=5e-3
        )
