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


def run_multihost(n_procs: int, local_devices: int, steps: int) -> dict:
    """Timed multi-process run through the REAL jax.distributed entry.

    Launches n_procs copies of scripts/multihost_worker.py (the same
    worker tests/test_multihost.py proves equal to a single-process step)
    with MULTIHOST_STEPS set, so the scaling harness exercises the
    coordinator/rendezvous path rather than a single-controller mesh
    (VERDICT r3 item 7). Returns the aggregated JSON record."""
    import socket
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(n_procs):
        env = dict(
            os.environ,
            DEBLUR4DGS_DIST="1",
            DEBLUR4DGS_NUM_PROCESSES=str(n_procs),
            DEBLUR4DGS_PROCESS_ID=str(pid),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            MULTIHOST_CPU="1",
            MULTIHOST_LOCAL_DEVICES=str(local_devices),
            MULTIHOST_STEPS=str(steps),
        )
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {i} failed:\n{out[-3000:]}")
    rec = {"processes": n_procs, "devices": n_procs * local_devices}
    for line in outs[0].splitlines():
        if line.startswith("MULTIHOST_LOSS"):
            rec["loss"] = float(line.split()[2])
        if line.startswith("MULTIHOST_RAYS"):
            _, _, rays, ms = line.split()
            rec["rays_per_s"] = float(rays)
            rec["step_ms"] = float(ms)
    if "rays_per_s" not in rec:
        raise RuntimeError(f"no MULTIHOST_RAYS line:\n{outs[0][-2000:]}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-devices", type=int, default=len(jax.devices()))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (functional CPU-mesh run)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--multihost", type=int, default=0, metavar="P",
                    help="run P real processes (2 virtual CPU devices "
                         "each) through the jax.distributed entry instead "
                         "of a single-controller mesh")
    ap.add_argument("--local-devices", type=int, default=2)
    args = ap.parse_args()

    if args.multihost:
        rec = run_multihost(args.multihost, args.local_devices, args.steps)
        print(json.dumps(rec))
        return

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
