"""One process of a multi-host (multi-controller) training-step run.

Launched N times by tests/test_multihost.py (2 CPU processes x 2 virtual
devices each) — and usable manually on real multi-host TPU slices:

  DEBLUR4DGS_DIST=1 JAX_COORDINATOR_ADDRESS=host0:1234 \
  JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=<i> python scripts/multihost_worker.py

Each process calls maybe_init_distributed() (the pipeline's multi-host
entry, parallel/mesh.py), builds the global mesh over ALL hosts' devices,
assembles identical replicated inputs, and runs ONE full train step with
the exposure-sub-frame axis sharded across the global mesh — GSPMD turns
the sub-frame reductions and parameter-gradient psums into cross-process
collectives. Prints `MULTIHOST_LOSS <process_index> <loss>` so the
launcher can assert every process agrees with the single-process value.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MULTIHOST_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", int(os.environ.get("MULTIHOST_LOCAL_DEVICES", "2"))
    )

import jax.numpy as jnp
import numpy as np


def build_inputs(num_frames=8):
    """Deterministic scene + batches (identical on every process)."""
    from __graft_entry__ import _flagship_scene
    from deblur4dgs_tpu.train.trainer import FrameBatch, TrackBatch

    rng = np.random.default_rng(7)
    scene = _flagship_scene(num_fg=200, num_bg=300, num_frames=num_frames)
    W, H = 64, 48
    Kmat = jnp.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]])

    def fb(b):
        return FrameBatch(
            ts=jnp.arange(2, 2 + b, dtype=jnp.int32),
            w2cs=jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
            Ks=jnp.broadcast_to(Kmat, (b, 3, 3)),
            imgs=jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32)),
            masks=jnp.asarray(
                (rng.uniform(size=(b, H, W)) < 0.3).astype(np.float32)
            ),
            valid_masks=jnp.ones((b, H, W)),
            depths=jnp.asarray(rng.uniform(1, 5, (b, H, W)).astype(np.float32)),
        )

    P = 16
    tracks = TrackBatch(
        query_tracks_2d=jnp.asarray(
            np.stack([rng.integers(0, W, P), rng.integers(0, H, P)], -1)
            .astype(np.float32)
        ),
        target_ts=jnp.asarray([1, 3], jnp.int32),
        target_w2cs=jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
        target_Ks=jnp.broadcast_to(Kmat, (2, 3, 3)),
        target_tracks_2d=jnp.asarray(
            rng.uniform(0, W, (2, P, 2)).astype(np.float32)
        ),
        target_visibles=jnp.ones((2, P)),
        target_confidences=jnp.ones((2, P)),
        target_track_depths=jnp.asarray(
            rng.uniform(1, 5, (2, P)).astype(np.float32)
        ),
    )
    return scene, fb, tracks


def main():
    from deblur4dgs_tpu.configs import (
        LossesConfig,
        OptimizerConfig,
        RenderConfig,
        SceneLRConfig,
    )
    from deblur4dgs_tpu.parallel.mesh import (
        global_mesh,
        maybe_init_distributed,
        subframe_sharding,
    )
    from deblur4dgs_tpu.train.optimizers import make_optimizer
    from deblur4dgs_tpu.train.trainer import init_train_state, make_train_step

    ran = maybe_init_distributed()
    print(f"process {jax.process_index()}/{jax.process_count()} "
          f"distributed={ran} local_devices={jax.local_device_count()} "
          f"global_devices={jax.device_count()}", flush=True)

    mesh = global_mesh()
    n_dev = jax.device_count()
    scene, fb, tracks = build_inputs()

    lr, ocfg, lcfg = SceneLRConfig(), OptimizerConfig(), LossesConfig()
    # one sub-frame per global device; interpret-mode Pallas on CPU
    rcfg = RenderConfig(
        num_exposure=max(n_dev, 2), tile_cap=256, use_pallas=True
    )
    state = init_train_state(scene, lr, ocfg)
    step = make_train_step(
        make_optimizer(scene, lr, ocfg), lcfg, rcfg, "second", 8,
        has_static=True, has_dynamic=True, has_reg=True,
        subframe_sharding=subframe_sharding(mesh),
    )

    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())

    def globalize(tree):
        # identical host-local values on every process -> one replicated
        # global array per leaf
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)
            ),
            tree,
        )

    state = globalize(state)
    b1, b2, b3 = globalize((fb(3), fb(1), fb(3)))
    tracks = globalize(tracks)
    epoch = jax.make_array_from_process_local_data(repl, np.asarray(25))

    with mesh:
        state, loss, _ = step(state, epoch, b1, b2, tracks, b3, None)
        jax.block_until_ready(loss)

    # the loss is replicated: every process holds an addressable copy
    loss_host = float(np.asarray(loss.addressable_data(0)))
    print(f"MULTIHOST_LOSS {jax.process_index()} {loss_host:.6f}", flush=True)

    # Timed-bench mode (bench_scaling.py --multihost): after the compile
    # step above, run MULTIHOST_STEPS more steps through the SAME
    # jax.distributed code path and report per-step wall time — so the
    # scaling harness and the real multi-host entry cannot drift apart.
    n_steps = int(os.environ.get("MULTIHOST_STEPS", "0"))
    if n_steps > 0:
        import time

        times = []
        with mesh:
            for _ in range(n_steps):
                t0 = time.time()
                state, loss, _ = step(state, epoch, b1, b2, tracks, b3, None)
                jax.block_until_ready(loss)
                times.append(time.time() - t0)
        dt = float(np.median(times))
        rays = 64 * 48 / dt  # W * H of build_inputs, matching bench_scaling
        print(
            f"MULTIHOST_RAYS {jax.process_index()} {rays:.1f} {dt * 1e3:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
