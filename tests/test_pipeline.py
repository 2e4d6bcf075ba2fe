"""Staged pipeline end-to-end on a tiny synthetic scene (CPU)."""

import numpy as np
import pytest

from deblur4dgs_tpu.configs import OptimizerConfig, RenderConfig
from deblur4dgs_tpu.data import synthetic
from deblur4dgs_tpu import pipeline as PL


@pytest.fixture(scope="module")
def adapter():
    scene = synthetic.make_scene(
        seed=0, num_fg=60, num_bg=150, num_frames=8, img_wh=(48, 32)
    )
    data = synthetic.generate_dataset(scene, num_blur_samples=3, num_tracks=40)
    return synthetic.SyntheticSceneAdapter(scene, data)


def tiny_cfg(tmp_path):
    return PL.PipelineConfig(
        work_dir=str(tmp_path),
        num_fg=40,
        num_bg=100,
        num_motion_bases=2,
        static_epochs=2,
        dynamic_epochs=2,
        steps_per_epoch=3,
        initial_optim_iters=30,
        pose_opt_iters=10,
        render=RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False),
        optim=OptimizerConfig(warmup_steps=2, control_every=4),
    )


class TestAdaptiveSlides:
    def test_windows_cover_and_extend(self):
        scores = np.array(
            [5, 1, 1, 1, 1, 9, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1, 7]
        , dtype=np.float64)
        slides, score_dict = PL.adaptive_slides(scores, num_windows=5, base=5)
        assert len(slides) == 5
        covered = sorted({i for win in slides.values() for i in win})
        assert covered[0] == 0 and covered[-1] == 23
        for wid, win in slides.items():
            assert win == sorted(win)
            assert len(score_dict[wid]) == len(win)
        # window 1 ([5..9]) should extend left toward the sharp frame 5 or
        # keep its base; all windows at least base-length
        assert all(len(w) >= 5 for w in slides.values())

    def test_sharpness_scores(self):
        rng = np.random.default_rng(0)
        sharp = rng.uniform(size=(24, 24, 3))
        blurry = np.ones((24, 24, 3)) * 0.5
        masks = np.ones((2, 24, 24))
        s = PL.compute_sharpness_scores(np.stack([sharp, blurry]), masks)
        assert s[0] > s[1] * 10


class TestRunArtifacts:
    def test_config_dump_and_code_backup(self, tmp_path):
        import os

        cfg = tiny_cfg(tmp_path)
        PL.dump_run_artifacts(cfg)
        assert os.path.exists(tmp_path / "cfg.yaml") or os.path.exists(
            tmp_path / "cfg.json"
        )
        backup = tmp_path / "code_backup" / "deblur4dgs_tpu"
        assert (backup / "pipeline.py").exists()
        assert (backup / "ops" / "rasterize.py").exists()


class TestPhaseACapScaling:
    def test_render_x4_auto(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        r4 = cfg.render_x4()
        assert r4.tile_cap == 4 * cfg.render.tile_cap  # 256 -> 1024
        assert r4.num_exposure == cfg.render.num_exposure  # rest untouched

    def test_render_x4_clamp_and_override(self, tmp_path):
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, render=RenderConfig(num_exposure=3, tile_cap=2048,
                                     use_pallas=False)
        )
        assert cfg.render_x4().tile_cap == 4096  # auto clamps at 4096
        cfg = dataclasses.replace(cfg, tile_cap_x4=512)
        assert cfg.render_x4().tile_cap == 512  # explicit override wins


class TestStagedPipeline:
    def test_initialize_scene(self, adapter, tmp_path):
        cfg = tiny_cfg(tmp_path)
        scene, bg_scale = PL.initialize_scene(adapter, cfg)
        assert scene.fg.capacity >= 40
        assert scene.bg is not None
        assert bg_scale > 0
        assert int(scene.fg.num_alive()) > 0

    def test_static_then_dynamic_then_testing(self, adapter, tmp_path):
        cfg = tiny_cfg(tmp_path)
        scene0, bg_scale = PL.initialize_scene(adapter, cfg)
        static_scene = PL.train_static_stage(adapter, scene0, cfg, bg_scale)
        # stage handoff: bg + move model lifted
        scene1, _ = PL.initialize_scene(adapter, cfg, static_scene=static_scene)
        assert scene1.bg.capacity == static_scene.bg.capacity
        dyn_scene = PL.train_dynamic_stage(adapter, scene1, cfg, bg_scale)
        metrics = PL.run_testing(adapter, dyn_scene, cfg)
        assert np.isfinite(metrics["val/psnr"])
        assert 0 <= metrics["val/ssim"] <= 1
        # checkpoints written
        import os

        assert os.path.exists(f"{tmp_path}/ckpts/static")
        assert os.path.exists(f"{tmp_path}/ckpts/dynamic")
        # pose-opt renders dumped
        assert os.path.exists(f"{tmp_path}/results/rgb_test_optim")
