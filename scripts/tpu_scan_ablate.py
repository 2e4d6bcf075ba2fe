"""Ablate the window-compositor kernels' scan matmul precision on TPU.

Variants (timed on the tail-bucket bench shape, fwd + bwd):
  base     — current kernels (f32 scan matmuls)
  bf16     — scan matmul inputs cast to bf16 (1-pass MXU, f32 accumulate)
  hilo     — l1m/ws split into bf16 hi+lo, two 1-pass matmuls (~f32 exact)
  noexp    — transmittance without exp/log1p (wrong math; sizes the
             transcendental share of the VPU time)

Prints per-variant median ms for fwd and fwd+bwd, plus max |diff| of the
outputs vs base.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops import rasterize as R

T, S, Fd, CAP = 1824, 11, 7, 128
FS = 11  # opacity + 10 channels
NCHAN = 11
TILES_X = 80

def build():
    # Realistic-ish payload: gaussians near their tile centers. Fresh rng
    # per call so every variant times AND diffs on identical data.
    rng = np.random.default_rng(0)
    dyn = np.zeros((T, S, Fd, CAP), np.float32)
    tx = (np.arange(T) % TILES_X)[:, None, None] * 16.0
    ty = (np.arange(T) // TILES_X)[:, None, None] * 16.0
    dyn[:, :, 0] = tx + rng.uniform(-4, 20, (T, S, CAP))
    dyn[:, :, 1] = ty + rng.uniform(-4, 20, (T, S, CAP))
    dyn[:, :, 2] = rng.uniform(0.02, 0.3, (T, S, CAP))
    dyn[:, :, 3] = rng.uniform(-0.02, 0.02, (T, S, CAP))
    dyn[:, :, 4] = rng.uniform(0.02, 0.3, (T, S, CAP))
    dyn[:, :, 5] = rng.uniform(5, 30, (T, S, CAP))
    dyn[:, :, 6] = rng.uniform(2, 8, (T, S, CAP))
    st = np.zeros((T, FS, CAP), np.float32)
    st[:, 0] = rng.uniform(0.1, 0.9, (T, CAP))
    st[:, 1:] = rng.uniform(0, 1, (T, FS - 1, CAP))
    counts = rng.integers(40, CAP + 1, (T,)).astype(np.int32)
    tile_ids = np.arange(T, dtype=np.int32)
    return (
        jnp.asarray(dyn), jnp.asarray(st), jnp.asarray(counts),
        jnp.asarray(tile_ids),
    )


def variant_base():
    pass


def variant_bf16():
    u_incl, u_excl = R._scan_masks()
    ui = u_incl.astype(jnp.bfloat16)
    ue = u_excl.astype(jnp.bfloat16)

    def scan_masks():
        return ui, ue

    def mm_scan(x, mask):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), mask,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    R._scan_masks = scan_masks
    R._mm_scan = mm_scan
    R._transmittance = lambda a, ue: jnp.exp(mm_scan(jnp.log1p(-a), ue))


def variant_hilo():
    u_incl, u_excl = _ORIG_MASKS()
    ui = u_incl.astype(jnp.bfloat16)
    ue = u_excl.astype(jnp.bfloat16)

    def scan_masks():
        return ui, ue

    def mm_scan(x, mask):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda v: jax.lax.dot_general(
            v, mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return d(hi) + d(lo)

    R._scan_masks = scan_masks
    R._mm_scan = mm_scan
    R._transmittance = lambda a, ue: jnp.exp(mm_scan(jnp.log1p(-a), ue))


def variant_noexp():
    def transmittance(alpha, u_excl):
        return 1.0 - _ORIG_MM(alpha, u_excl) * 1e-3  # no exp/log1p

    R._transmittance = transmittance


_ORIG_MASKS = R._scan_masks
_ORIG_MM = R._mm_scan
_ORIG_TR = R._transmittance


def restore():
    R._scan_masks = _ORIG_MASKS
    R._mm_scan = _ORIG_MM
    R._transmittance = _ORIG_TR


def run(name, setup):
    restore()
    setup()
    dyn, st, counts, tile_ids = build()

    def f(dyn, st):
        acc, tf = R.composite_tiles_window(
            dyn, st, counts, tile_ids, TILES_X, NCHAN, True
        )
        return acc, tf

    def loss(dyn, st):
        acc, tf = f(dyn, st)
        return jnp.sum(acc * acc) + jnp.sum(tf)

    fj = jax.jit(f)
    gj = jax.jit(jax.grad(loss, argnums=(0, 1)))

    acc, tf = jax.block_until_ready(fj(dyn, st))
    g = jax.block_until_ready(gj(dyn, st))

    def med(fn, *a):
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1e3

    t_f = med(fj, dyn, st)
    t_g = med(gj, dyn, st)
    print(
        f"{name:6s} fwd {t_f:7.2f} ms   fwd+bwd {t_g:7.2f} ms", flush=True
    )
    return acc, tf, g


base = run("base", variant_base)
for name, setup in (
    ("bf16", variant_bf16),
    ("hilo", variant_hilo),
    ("noexp", variant_noexp),
):
    acc, tf, g = run(name, setup)
    d_acc = float(jnp.max(jnp.abs(acc - base[0])))
    d_g = float(
        max(jnp.max(jnp.abs(a - b)) for a, b in zip(g, base[2]))
    )
    print(f"       max|acc diff| {d_acc:.3e}  max|grad diff| {d_g:.3e}")
restore()
