"""720p (1280x720) pipeline smoke on the REAL TPU (VERDICT r2 item 7).

The step is benched at 720p (bench.py) but the surrounding pipeline —
mid-training validation renders and especially the jitted 500-iteration
pose-opt scan (eval/validator.py make_pose_opt_fn) — had never executed
at that size. This runs a short train_low-shaped schedule at 1280x720 on
synthetic data (realistic gaussian counts) and reports per-stage wall
times plus the pose-opt per-frame time. Commit the log (docs/PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from deblur4dgs_tpu import pipeline as PL
from deblur4dgs_tpu.configs import OptimizerConfig, RenderConfig
from deblur4dgs_tpu.data import synthetic

t0 = time.time()


def tic(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


T = 6
scene = synthetic.make_scene(
    seed=0, num_fg=2000, num_bg=8000, num_frames=T, img_wh=(1280, 720),
    exposure=0.45, cam_shake=0.02, exp_shake=0.015,
)
data = synthetic.generate_dataset(
    scene, num_blur_samples=5, num_tracks=128, fast_renderer=True
)
adapter = synthetic.SyntheticSceneAdapter(scene, data)
val = synthetic.SyntheticSceneAdapter(scene, data, split="val")
tic("synthetic 720p scene ready")

cfg = PL.PipelineConfig(
    work_dir="/tmp/tpu_720p_smoke",
    num_fg=1500,
    num_bg=7000,
    num_motion_bases=4,
    static_epochs=2,
    dynamic_epochs=2,
    steps_per_epoch=4,
    initial_optim_iters=50,
    pose_opt_iters=500,  # the reference's full count (validator.py:437)
    validate_every=1,  # exercise 720p validation renders mid-training
    save_videos_every=0,
    resume=False,
    render=RenderConfig(num_exposure=7, tile_cap=1024, use_pallas=True),
    optim=OptimizerConfig(warmup_steps=4, control_every=8),
)

scene0, bg_scale = PL.initialize_scene(adapter, cfg)
tic("init done")
static_scene = PL.train_static_stage(
    adapter, scene0, cfg, bg_scale, val_view=val
)
tic("static stage done (incl. 720p bg-only validation)")
scene1, _ = PL.initialize_scene(adapter, cfg, static_scene=static_scene)
dyn_scene = PL.train_dynamic_stage(
    adapter, scene1, cfg, bg_scale, val_view=val
)
tic("dynamic stage done (incl. 720p validation)")

# pose-opt at the full 500 iters on 2 frames, timed separately
from deblur4dgs_tpu.eval.validator import Validator, make_pose_opt_fn
import jax.numpy as jnp

pose_opt = make_pose_opt_fn(
    (1280, 720), num_iters=cfg.pose_opt_iters,
    num_exposure=cfg.render.num_exposure, cap=cfg.render.tile_cap,
    use_pallas=cfg.render.use_pallas,
)
validator = Validator(dyn_scene, save_dir=cfg.work_dir)
times = []
for i in range(2):
    item = val.get_item(i)
    t1 = time.time()
    img, w2c_t, losses = validator.validate_frame_with_pose_opt(
        pose_opt, int(item["ts"]),
        jnp.asarray(np.asarray(item["w2cs"])),
        jnp.asarray(np.asarray(item["Ks"])),
        jnp.asarray(np.asarray(item["imgs"])),
        jnp.asarray(np.asarray(item["masks"])),
        jnp.asarray(np.asarray(item["valid_masks"])),
        frame_name=f"{i:05d}",
    )
    jax.block_until_ready(img)
    dt = time.time() - t1
    times.append(dt)
    tic(f"pose-opt frame {i}: {dt:.1f}s "
        f"({'compile+' if i == 0 else ''}500 iters at 720p), "
        f"final loss {float(losses[-1]):.4f}")
assert np.isfinite(float(losses[-1]))
metrics = validator.compute()
assert np.isfinite(metrics["val/psnr"]), metrics
tic(f"metrics {[f'{k}={float(v):.3f}' for k, v in metrics.items()]}")
print(f"pose-opt steady-state: {times[-1]:.1f}s/frame "
      f"({times[-1]/cfg.pose_opt_iters*1e3:.1f} ms/iter) at 720p")
print("TPU 720P SMOKE OK")
