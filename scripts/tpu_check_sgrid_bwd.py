"""Validate the (tiles, S)-grid window backward on real TPU.

Compares _composite_bwd_window (sgrid) against the legacy S-split kernel
and against XLA autodiff through _composite_window_xla on random inputs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops import rasterize as R

rng = np.random.default_rng(0)

T, S, cap, nchan = 16, 11, 256, 6
depth_in_dyn = True
Fd = 7
Fs = 1 + nchan - 1  # opacity + static channels
tiles_x = 4

# Random but composable data: means near tile centers, modest radii.
tile_ids = np.arange(T, dtype=np.int32)
counts = rng.integers(cap // 4, cap, size=(T,)).astype(np.int32)

tx = (tile_ids % tiles_x)[:, None, None] * 16
ty = (tile_ids // tiles_x)[:, None, None] * 16
mx = tx + rng.uniform(-4, 20, (T, S, cap))
my = ty + rng.uniform(-4, 20, (T, S, cap))
ca = rng.uniform(0.05, 0.5, (T, S, cap))
cc = rng.uniform(0.05, 0.5, (T, S, cap))
cb = rng.uniform(-0.1, 0.1, (T, S, cap))
r = rng.uniform(2.0, 12.0, (T, S, cap))
dep = rng.uniform(1.0, 9.0, (T, S, cap))
dyn = np.stack([mx, my, ca, cb, cc, r, dep], axis=2).astype(np.float32)

op = rng.uniform(0.05, 0.9, (T, 1, cap))
chans = rng.normal(size=(T, nchan - 1, cap))
st = np.concatenate([op, chans], axis=1).astype(np.float32)

dyn = jnp.asarray(dyn)
st = jnp.asarray(st)
counts_j = jnp.asarray(counts)
tile_ids_j = jnp.asarray(tile_ids)

gacc = jnp.asarray(rng.normal(size=(T, S, nchan, 256)).astype(np.float32))
gt = jnp.asarray(rng.normal(size=(T, S, 256)).astype(np.float32))

accum, tfin = R._composite_fwd_window(
    dyn, st, counts_j, tile_ids_j, tiles_x, nchan, depth_in_dyn
)

g_new = R._composite_bwd_window(
    dyn, st, counts_j, tile_ids_j, accum, tfin, gacc, gt, tiles_x,
    nchan, depth_in_dyn,
)
g_old = R._composite_bwd_window_ssplit(
    dyn, st, counts_j, tile_ids_j, accum, tfin, gacc, gt, tiles_x,
    nchan, depth_in_dyn,
)


def vjp_xla():
    def f(d, s):
        a, tf = R._composite_window_xla(
            d, s, counts_j, tile_ids_j, tiles_x, nchan, depth_in_dyn
        )
        return jnp.sum(a * gacc) + jnp.sum(tf * gt)

    return jax.grad(f, argnums=(0, 1))(dyn, st)


g_ref = vjp_xla()

for name, a, b in [
    ("gdyn new-vs-old", g_new[0], g_old[0]),
    ("gst  new-vs-old", g_new[1], g_old[1]),
    ("gdyn new-vs-xla", g_new[0], g_ref[0]),
    ("gst  new-vs-xla", g_new[1], g_ref[1]),
]:
    a = np.asarray(a)
    b = np.asarray(b)
    denom = np.maximum(np.abs(b).max(), 1e-6)
    print(f"{name}: max_abs_diff={np.abs(a - b).max():.3e} rel={np.abs(a - b).max() / denom:.3e}")

# Timing: new vs old backward.
import time

def timeit(fn, n=20):
    fn()[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3

t_new = timeit(lambda: R._composite_bwd_window(
    dyn, st, counts_j, tile_ids_j, accum, tfin, gacc, gt, tiles_x,
    nchan, depth_in_dyn))
t_old = timeit(lambda: R._composite_bwd_window_ssplit(
    dyn, st, counts_j, tile_ids_j, accum, tfin, gacc, gt, tiles_x,
    nchan, depth_in_dyn))
print(f"bwd sgrid {t_new:.3f} ms vs ssplit {t_old:.3f} ms (T={T}, cap={cap})")

# Bench-scale bucket shapes (from the 720p trace): (tiles, cap).
NCH = 11
for Tb, capb in [(1800, 128), (904, 256), (456, 512), (456, 1024)]:
    Tb = -(-Tb // 8) * 8
    tid = jnp.arange(Tb, dtype=jnp.int32)
    cnt = jnp.asarray(
        rng.integers(int(capb * 0.5), capb, size=(Tb,)).astype(np.int32)
    )
    d = jnp.asarray(rng.normal(size=(Tb, S, Fd, capb)).astype(np.float32))
    stb = jnp.asarray(
        rng.uniform(0.0, 0.9, size=(Tb, NCH, capb)).astype(np.float32)
    )
    ac = jnp.asarray(rng.normal(size=(Tb, S, NCH, 256)).astype(np.float32))
    tf = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(Tb, S, 256)).astype(np.float32)
    )
    ga = jnp.asarray(rng.normal(size=(Tb, S, NCH, 256)).astype(np.float32))
    gtb = jnp.asarray(rng.normal(size=(Tb, S, 256)).astype(np.float32))
    tn = timeit(lambda: R._composite_bwd_window(
        d, stb, cnt, tid, ac, tf, ga, gtb, 80, NCH, depth_in_dyn), n=10)
    to = timeit(lambda: R._composite_bwd_window_ssplit(
        d, stb, cnt, tid, ac, tf, ga, gtb, 80, NCH, depth_in_dyn), n=10)
    print(f"T={Tb:5d} cap={capb:5d}: sgrid {tn:7.3f} ms  ssplit {to:7.3f} ms")
