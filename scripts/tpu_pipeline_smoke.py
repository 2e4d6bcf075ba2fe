"""Full staged pipeline (init -> static -> handoff -> dynamic -> testing)
on the REAL TPU with the Pallas compositor + bucketed exposure-shared
binning — the end-to-end smoke the CPU test suite runs in interpret mode
(tests/test_pipeline.py), at a resolution big enough (256x160 -> 160 tiles)
to engage the bucketed kernel path.
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
scene = synthetic.make_scene(
    seed=0, num_fg=200, num_bg=600, num_frames=8, img_wh=(256, 160)
)
data = synthetic.generate_dataset(scene, num_blur_samples=3, num_tracks=64)
adapter = synthetic.SyntheticSceneAdapter(scene, data)
print(f"[{time.time()-t0:6.1f}s] synthetic scene ready", flush=True)

cfg = PL.PipelineConfig(
    work_dir="/tmp/tpu_pipeline_smoke",
    num_fg=128,
    num_bg=512,
    num_motion_bases=2,
    static_epochs=2,
    dynamic_epochs=2,
    steps_per_epoch=3,
    initial_optim_iters=30,
    pose_opt_iters=10,
    render=RenderConfig(num_exposure=5, tile_cap=256, use_pallas=True),
    optim=OptimizerConfig(warmup_steps=2, control_every=4),
)

scene0, bg_scale = PL.initialize_scene(adapter, cfg)
print(f"[{time.time()-t0:6.1f}s] init done", flush=True)
static_scene = PL.train_static_stage(adapter, scene0, cfg, bg_scale)
print(f"[{time.time()-t0:6.1f}s] static stage done", flush=True)
scene1, _ = PL.initialize_scene(adapter, cfg, static_scene=static_scene)
dyn_scene = PL.train_dynamic_stage(adapter, scene1, cfg, bg_scale)
print(f"[{time.time()-t0:6.1f}s] dynamic stage done", flush=True)
metrics = PL.run_testing(adapter, dyn_scene, cfg)
print(f"[{time.time()-t0:6.1f}s] testing done", flush=True)
assert np.isfinite(metrics["val/psnr"]), metrics
print({k: round(float(v), 3) for k, v in metrics.items()})
print("TPU PIPELINE SMOKE OK")
