"""Multi-chip scaling benchmark: tile-sharded train step at 1..N devices.

Measures train rays/s at each device count and reports scaling efficiency
(BASELINE.md target: >= 80% at 2+ hosts). On this machine only one real
TPU chip is reachable, so N>1 runs require a pod slice; the harness also
runs functionally on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --max-devices 8 --tiny

Prints one JSON line per device count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-devices", type=int, default=len(jax.devices()))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (functional CPU-mesh run)")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import bench
    from deblur4dgs_tpu.parallel.mesh import make_mesh

    if args.tiny:
        bench.W, bench.H = 160, 128
        bench.NUM_FG, bench.NUM_BG = 400, 600
        bench.NUM_EXPOSURE = 3
        bench.TILE_CAP = 256

    results = []
    n = 1
    while n <= args.max_devices:
        mesh = make_mesh(n, axis="tile")
        state, step, batch, tracks = bench.build(tile_mesh=mesh)
        epoch = jnp.asarray(25)
        state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
        _ = float(loss)
        times = []
        for _i in range(args.steps):
            t0 = time.time()
            state, loss, _ = step(
                state, epoch, None, batch, tracks, None, None
            )
            _ = float(loss)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        rays = bench.W * bench.H / dt
        base = results[0]["rays_per_s"] if results else rays
        results.append({
            "devices": n,
            "step_ms": round(dt * 1e3, 1),
            "rays_per_s": round(rays, 1),
            "scaling_efficiency": round(rays / (base * n), 3),
        })
        print(json.dumps(results[-1]))
        n *= 2


if __name__ == "__main__":
    main()
