"""PERF.md lever 2 A/B: max_tiles_per_gauss 32 vs 16.

Halving the tile-span bound halves the binning pair sort + list gathers,
but truncates tile coverage of gaussians whose bounding square spans more
than MT tiles (radius over ~2*sqrt(MT)*TILE/2 px). Measures, on real TPU:

  1. full train-step time at the bench shape (720p, 40k fg + 60k bg) for
     MT=32 and MT=16;
  2. rendering quality drift: PSNR between MT=16 and MT=32 renders of a
     realistic synthetic scene at 512x288 (exact reference = MT=32: its
     span covers every gaussian in the scene).

Decision rule printed at the end: adopt 16 only if PSNR(16 vs 32) > 45 dB
(no visible change) at both test scales.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def step_time(mt: int) -> float:
    os.environ["BENCH_MT"] = str(mt)  # read inside bench.build()
    import bench

    state, step, batch, tracks = bench.build()
    epoch = jnp.asarray(25)
    state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
    jax.block_until_ready(state)
    for _ in range(3):  # warmup
        state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
    float(loss)
    N = 10
    t0 = time.time()
    for _ in range(N):
        state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
    float(loss)
    return (time.time() - t0) / N


def quality(mt_test: int = 16, mt_ref: int = 32):
    from deblur4dgs_tpu.data import synthetic
    from deblur4dgs_tpu.models.move_model import init_move_model
    from deblur4dgs_tpu.models.scene import SceneModel, render

    psnrs = []
    for wh in [(512, 288), (1280, 720)]:
        sscene = synthetic.make_scene(
            seed=0, num_fg=2000, num_bg=9000, num_frames=8, img_wh=wh,
            exposure=0.45, cam_shake=0.03,
        )
        sm = SceneModel(
            fg=sscene.fg, bg=sscene.bg, bases=sscene.bases,
            move=init_move_model(jax.random.PRNGKey(0), num_frames=8),
        )

        def rend(mt):
            out = render(
                sm, 3, sscene.w2cs[3], sscene.Ks[3], wh, mode="blury",
                stage="second", return_mask=True, return_depth=True,
                num_exposure=7, cap=1024, max_tiles_per_gauss=mt,
            )
            return np.clip(np.asarray(out["img"]), 0, 1)

        a, b = rend(mt_test), rend(mt_ref)
        mse = float(((a - b) ** 2).mean())
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    return psnrs


def main():
    q = quality()
    t32 = step_time(32)
    t16 = step_time(16)
    result = {
        "step_ms_mt32": round(t32 * 1e3, 1),
        "step_ms_mt16": round(t16 * 1e3, 1),
        "speedup_ms": round((t32 - t16) * 1e3, 1),
        "psnr_16_vs_32_512x288": round(q[0], 1),
        "psnr_16_vs_32_1280x720": round(q[1], 1),
        "adopt_16": bool(min(q) > 45.0 and t16 < t32),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
