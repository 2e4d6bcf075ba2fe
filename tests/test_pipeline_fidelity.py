"""Round-2 pipeline-fidelity coverage: the composed train_low driver
through the CLI, static-reg wiring, per-window testing, resume, the
exposure-consistency flow loss, NaN/overflow surfacing, and the live
training viewer."""

import os
import os.path as osp
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu import pipeline as PL
from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.data import synthetic


@pytest.fixture(scope="module")
def adapter():
    scene = synthetic.make_scene(
        seed=0, num_fg=60, num_bg=150, num_frames=8, img_wh=(48, 32)
    )
    data = synthetic.generate_dataset(scene, num_blur_samples=3, num_tracks=40)
    return synthetic.SyntheticSceneAdapter(scene, data)


def tiny_cfg(work_dir, **kw):
    defaults = dict(
        work_dir=str(work_dir),
        num_fg=40,
        num_bg=100,
        num_motion_bases=2,
        static_epochs=2,
        dynamic_epochs=2,
        steps_per_epoch=3,
        initial_optim_iters=30,
        pose_opt_iters=6,
        validate_every=1000,
        save_videos_every=0,
        render=RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False),
        optim=OptimizerConfig(warmup_steps=2, control_every=4),
    )
    defaults.update(kw)
    return PL.PipelineConfig(**defaults)


def _copy_scene(scene):
    return jax.tree.map(jnp.copy, scene)


class TestWindowCount:
    def test_ceil_t_over_5(self):
        # the reference always uses 5 windows for T=24
        # (run_training_dynamic.py:78); len//5 gave 4 and left frames
        # 15-18 uncovered by any base window
        for T, want in [(24, 5), (8, 2), (5, 1), (26, 6), (4, 1)]:
            assert max(-(-T // 5), 1) == want

    def test_all_frames_window_covered(self):
        rng = np.random.default_rng(0)
        for T in (8, 23, 24, 26):
            scores = rng.uniform(1, 9, T)
            n = max(-(-T // 5), 1)
            slides, _ = PL.adaptive_slides(scores, num_windows=n)
            covered = {i for w in slides.values() for i in w}
            assert covered == set(range(T)), f"T={T}: {sorted(covered)}"


class TestCliTrainE2E:
    def test_synthetic_train_low_through_cli(self, tmp_path):
        from deblur4dgs_tpu import cli

        work = tmp_path / "run"
        cli.main([
            "train", "--synthetic", "--work-dir", str(work),
            "--synthetic-frames", "8", "--synthetic-wh", "48", "32",
            "--num-fg", "40", "--num-bg", "100", "--num-motion-bases", "2",
            "--epochs-static", "1", "--epochs-dynamic", "1",
            "--steps-per-epoch", "2", "--num-exposure", "3",
            "--tile-cap", "256", "--no-pallas",
            "--initial-optim-iters", "20", "--pose-opt-iters", "4",
            "--validate-every", "1000", "--save-videos-every", "0",
        ])
        # the CLI writes aggregated window metrics
        import json

        with open(work / "metrics.json") as f:
            metrics = json.load(f)
        assert np.isfinite(metrics["val/psnr"])
        assert 0.0 <= metrics["val/ssim"] <= 1.0
        # ceil(8/5) = 2 phase-B windows, each trained + tested on its own
        # val slice; window dir names encode [start, end)
        win_ckpts = sorted(
            d for d in os.listdir(work / "ckpts") if d.startswith("win_")
        )
        assert len(win_ckpts) == 2
        spans = [(int(d[4:6]), int(d[6:8])) for d in win_ckpts]
        covered = {i for lo, hi in spans for i in range(lo, hi)}
        assert covered == set(range(8))
        # per-window pose-opt renders exist (stage 3 artifacts)
        win_results = sorted(
            d for d in os.listdir(work / "results") if d.startswith("win_")
        )
        assert len(win_results) == 2
        for d in win_results:
            pngs = os.listdir(work / "results" / d / "rgb_test_optim")
            assert any(p.endswith(".png") for p in pngs)
        # stage checkpoints for resume
        assert osp.isdir(work / "ckpts" / "static" / "last")
        assert osp.isdir(work / "ckpts" / "dynamicA" / "last")


class TestStaticRegBranch:
    def test_reg_branch_runs_and_regularizes(self, adapter, tmp_path):
        cfg = tiny_cfg(tmp_path, static_epochs=1, dynamic_epochs=1)
        scene0, bg_scale = PL.initialize_scene(adapter, cfg)
        static_scene = PL.train_static_stage(
            adapter, _copy_scene(scene0), cfg, bg_scale
        )
        reg_imgs = PL.render_sharp_frames(
            static_scene, adapter, cfg, bg_only=True
        )
        assert reg_imgs.shape == (8, 32, 48, 3)
        scene1, _ = PL.initialize_scene(
            adapter, cfg, static_scene=static_scene
        )
        # with the reg branch the composed step must still run and produce
        # a different bg trajectory than without it
        cfg_reg = tiny_cfg(tmp_path / "reg", dynamic_epochs=1)
        with_reg = PL.train_dynamic_stage(
            adapter, _copy_scene(scene1), cfg_reg, bg_scale,
            reg_imgs=reg_imgs, tag="dynreg",
        )
        cfg_noreg = tiny_cfg(tmp_path / "noreg", dynamic_epochs=1)
        without = PL.train_dynamic_stage(
            adapter, _copy_scene(scene1), cfg_noreg, bg_scale,
        )
        d = float(jnp.max(jnp.abs(with_reg.bg.means - without.bg.means)))
        assert np.isfinite(d) and d > 0.0

    def test_reg_aux_present_in_step(self, adapter, tmp_path):
        from deblur4dgs_tpu.train.loop import (
            stack_frame_batch,
            track_batch_from_item,
        )
        from deblur4dgs_tpu.train.optimizers import make_optimizer
        from deblur4dgs_tpu.train.trainer import (
            init_train_state,
            make_train_step,
        )

        cfg = tiny_cfg(tmp_path)
        scene, _ = PL.initialize_scene(adapter, cfg)
        state = init_train_state(scene, cfg.lr, cfg.optim)
        step = make_train_step(
            make_optimizer(scene, cfg.lr, cfg.optim), cfg.losses, cfg.render,
            "second", 8, has_static=True, has_dynamic=True, has_reg=True,
        )
        items = [adapter.get_item(i) for i in range(3)]
        b1 = stack_frame_batch([items[0]])
        b2 = stack_frame_batch([items[1]])
        tracks = track_batch_from_item(items[1])
        breg = b1._replace(imgs=jnp.asarray(adapter.imgs[0:1]))
        state, loss, aux = step(
            state, jnp.asarray(25), b1, b2, tracks, breg, None
        )
        assert np.isfinite(float(loss))
        assert "reg" in aux and np.isfinite(float(jnp.sum(aux["reg"]["radii"])))
        # the reg branch's mean2d taps feed density stats for the bg slots
        assert float(jnp.sum(state.stats.vis_count[scene.num_fg:])) > 0


class TestFlowLoss:
    def test_exposure_consistency_contributes_gradients(self, adapter):
        """A randomly-initialized PWC-Net flow term changes the loss and
        the gradients flowing through the exposure sub-frame stacks
        (trainer.py:599-618 parity)."""
        from deblur4dgs_tpu.models.pwcnet import (
            init_pwcnet,
            make_aligned_loss_fn,
        )
        from deblur4dgs_tpu.train.loop import (
            stack_frame_batch,
            track_batch_from_item,
        )
        from deblur4dgs_tpu.train.trainer import compute_dynamic_losses

        cfg_l = LossesConfig()
        cfg_r = RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False)
        cfg = tiny_cfg("/tmp/unused")
        scene, _ = PL.initialize_scene(adapter, cfg)
        item = adapter.get_item(2)
        batch = stack_frame_batch([item])
        tracks = track_batch_from_item(item)
        flow_fn = make_aligned_loss_fn(init_pwcnet(jax.random.PRNGKey(0)))
        taps = jnp.zeros((1, 3, scene.num_fg + scene.num_bg, 2))

        def loss_with(flow):
            def f(s):
                l, _ = compute_dynamic_losses(
                    s, batch, tracks, taps, cfg_l, cfg_r, "second",
                    jnp.asarray(25), 8, flow_fn=flow,
                )
                return l

            return jax.value_and_grad(f)(scene)

        l0, g0 = loss_with(None)
        l1, g1 = loss_with(flow_fn)
        assert np.isfinite(float(l1))
        assert float(l1) != float(l0)
        # gradients through the sub-frame stacks reach the exposure model
        # (time_params shape the sub-frame cameras) and the fg gaussians
        d_time = float(jnp.max(jnp.abs(
            g1.move.time_params - g0.move.time_params
        )))
        d_fg = float(jnp.max(jnp.abs(g1.fg.colors - g0.fg.colors)))
        assert d_time > 0.0
        assert d_fg > 0.0

    def test_gated_before_start_epoch(self, adapter):
        from deblur4dgs_tpu.models.pwcnet import (
            init_pwcnet,
            make_aligned_loss_fn,
        )
        from deblur4dgs_tpu.train.loop import (
            stack_frame_batch,
            track_batch_from_item,
        )
        from deblur4dgs_tpu.train.trainer import compute_dynamic_losses

        cfg_l = LossesConfig()
        cfg_r = RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False)
        cfg = tiny_cfg("/tmp/unused")
        scene, _ = PL.initialize_scene(adapter, cfg)
        item = adapter.get_item(2)
        batch = stack_frame_batch([item])
        tracks = track_batch_from_item(item)
        flow_fn = make_aligned_loss_fn(init_pwcnet(jax.random.PRNGKey(0)))
        taps = jnp.zeros((1, 3, scene.num_fg + scene.num_bg, 2))

        def loss_at(epoch, flow):
            l, _ = compute_dynamic_losses(
                scene, batch, tracks, taps, cfg_l, cfg_r, "second",
                jnp.asarray(epoch), 8, flow_fn=flow,
            )
            return float(l)

        # before the start epoch the consistency weight is 0: identical loss
        assert loss_at(5, flow_fn) == pytest.approx(loss_at(5, None), rel=1e-6)


class TestResume:
    def test_kill_and_resume_static_stage(self, adapter, tmp_path):
        cfg_args = dict(
            static_epochs=4, steps_per_epoch=2, initial_optim_iters=20,
        )
        cfg_full = tiny_cfg(tmp_path / "full", **cfg_args)
        scene0, bg_scale = PL.initialize_scene(adapter, cfg_full)

        # uninterrupted 4-epoch run
        ref_scene = PL.train_static_stage(
            adapter, _copy_scene(scene0), cfg_full, bg_scale
        )

        # killed run: 2 epochs with a checkpoint at every 2nd step, final
        # checkpoint removed to simulate the kill
        cfg_killed = tiny_cfg(
            tmp_path / "resumed", checkpoint_every=2, **cfg_args
        )
        cfg_half = tiny_cfg(
            tmp_path / "resumed", static_epochs=2, steps_per_epoch=2,
            initial_optim_iters=20, checkpoint_every=2,
        )
        PL.train_static_stage(adapter, _copy_scene(scene0), cfg_half, bg_scale)
        shutil.rmtree(tmp_path / "resumed" / "ckpts")

        # resumed run continues from step 4 and must match the
        # uninterrupted run exactly (orbax restores bit-identical floats)
        res_scene = PL.train_static_stage(
            adapter, _copy_scene(scene0), cfg_killed, bg_scale
        )
        for a, b in zip(jax.tree.leaves(ref_scene), jax.tree.leaves(res_scene)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            )

    def test_finished_stage_is_skipped(self, adapter, tmp_path):
        cfg = tiny_cfg(tmp_path, static_epochs=1, steps_per_epoch=2)
        scene0, bg_scale = PL.initialize_scene(adapter, cfg)
        s1 = PL.train_static_stage(adapter, _copy_scene(scene0), cfg, bg_scale)
        # second call restores the finished checkpoint without retraining
        s2 = PL.train_static_stage(adapter, _copy_scene(scene0), cfg, bg_scale)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNaNTrap:
    def test_nan_raises_without_writer(self, adapter, tmp_path):
        from deblur4dgs_tpu.train.loop import TrainLoop, stack_frame_batch
        from deblur4dgs_tpu.train.optimizers import make_optimizer
        from deblur4dgs_tpu.train.trainer import init_train_state

        cfg = tiny_cfg(tmp_path)
        scene, _ = PL.initialize_scene(adapter, cfg)
        state = init_train_state(scene, cfg.lr, cfg.optim)
        loop = TrainLoop(
            state, make_optimizer(scene, cfg.lr, cfg.optim), cfg.losses,
            cfg.render, cfg.optim, 8, str(tmp_path / "loop"), "first",
            has_static=True, has_dynamic=False, has_reg=False,
            writer=None, log_every=1, checkpoint_every=0,
        )
        items = [adapter.get_item(i) for i in (0, 1, 2)]
        batch = stack_frame_batch(items)
        batch = batch._replace(imgs=batch.imgs * jnp.nan)
        with pytest.raises(FloatingPointError):
            loop.train_step(batch, None, None, None)


class TestOverflowSurfacing:
    def _render(self, cap):
        from deblur4dgs_tpu.models.scene import render

        scene = synthetic.make_scene(
            seed=1, num_fg=150, num_bg=80, num_frames=4, img_wh=(32, 32)
        )
        from deblur4dgs_tpu.models.scene import SceneModel
        from deblur4dgs_tpu.models.move_model import init_move_model

        sm = SceneModel(
            fg=scene.fg, bg=scene.bg, bases=scene.bases,
            move=init_move_model(jax.random.PRNGKey(0), num_frames=4),
        )
        return render(
            sm, 1, scene.w2cs[1], scene.Ks[1], (32, 32), mode="blury",
            stage="second", num_exposure=2, cap=cap, use_pallas=False,
            bucketed=False,
        )

    def test_overflow_fraction_reported(self):
        out_small = self._render(cap=128)
        out_big = self._render(cap=512)
        small = float(out_small["tile_overflow"])
        big = float(out_big["tile_overflow"])
        assert 0.0 <= big <= small <= 1.0
        assert small > 0.0  # 230 gaussians clustered into 4 tiles @ cap 128

    def test_overflow_logged_in_trainer_aux(self, adapter, tmp_path):
        from deblur4dgs_tpu.train.loop import (
            stack_frame_batch,
            track_batch_from_item,
        )
        from deblur4dgs_tpu.train.optimizers import make_optimizer
        from deblur4dgs_tpu.train.trainer import (
            init_train_state,
            make_train_step,
        )

        cfg = tiny_cfg(tmp_path)
        scene, _ = PL.initialize_scene(adapter, cfg)
        state = init_train_state(scene, cfg.lr, cfg.optim)
        step = make_train_step(
            make_optimizer(scene, cfg.lr, cfg.optim), cfg.losses, cfg.render,
            "second", 8, has_static=True, has_dynamic=True, has_reg=False,
        )
        items = [adapter.get_item(i) for i in range(2)]
        b1 = stack_frame_batch([items[0]])
        b2 = stack_frame_batch([items[1]])
        tracks = track_batch_from_item(items[1])
        _, _, aux = step(state, jnp.asarray(25), b1, b2, tracks, None, None)
        assert "tile_overflow" in aux["static"]
        assert "tile_overflow" in aux["dynamic"]
        assert 0.0 <= float(aux["dynamic"]["tile_overflow"]) <= 1.0


class TestTrainingViewer:
    def test_live_render_from_mid_training_state(self, adapter, tmp_path):
        from deblur4dgs_tpu.train.loop import TrainLoop, stack_frame_batch
        from deblur4dgs_tpu.train.optimizers import make_optimizer
        from deblur4dgs_tpu.train.trainer import init_train_state
        from deblur4dgs_tpu.vis.renderer import CameraState
        from deblur4dgs_tpu.vis.viewer import TrainingViewer

        cfg = tiny_cfg(tmp_path)
        scene, _ = PL.initialize_scene(adapter, cfg)
        viewer = TrainingViewer(
            8, img_wh=(48, 32), num_exposure=3, cap=256, use_pallas=False
        )
        state = init_train_state(scene, cfg.lr, cfg.optim)
        loop = TrainLoop(
            state, make_optimizer(scene, cfg.lr, cfg.optim), cfg.losses,
            cfg.render, cfg.optim, 8, str(tmp_path / "loop"), "first",
            has_static=True, has_dynamic=False, has_reg=False,
            checkpoint_every=0, viewer=viewer,
        )
        items = [adapter.get_item(i) for i in (0, 1, 2)]
        loop.train_step(stack_frame_batch(items), None, None, None)
        cam = CameraState(
            fov=np.pi / 3, aspect=1.5,
            c2w=np.linalg.inv(np.asarray(adapter.w2cs[1])),
        )
        img = viewer._render(cam, (48, 32), 1)
        assert img.shape == (32, 48, 3) and img.dtype == np.uint8
        assert viewer.state.num_train_rays_per_sec > 0
        # the viewer renders the CURRENT training scene object
        assert viewer._renderer.scene is loop.state.scene


class TestLpipsWiring:
    def test_lpips_fn_scores_and_feeds_metrics(self, adapter, tmp_path):
        cfg = tiny_cfg(tmp_path, lpips_weights="random")
        fn = PL.make_lpips_fn(cfg)
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
        same = float(fn(a, a))
        diff = float(fn(a, b))
        assert same == pytest.approx(0.0, abs=1e-5)
        assert diff > same
        # flows into the validator's aggregate
        from deblur4dgs_tpu.eval.validator import Validator

        v = Validator(None, save_dir=None, has_bg=True, lpips_fn=fn)
        mask = np.ones((32, 48), np.float32)
        v.update_metrics(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask),
                         jnp.asarray(mask))
        out = v.compute()
        assert "val/lpips" in out and np.isfinite(out["val/lpips"])

    def test_none_when_unconfigured(self, tmp_path):
        assert PL.make_lpips_fn(tiny_cfg(tmp_path)) is None


class TestValPartition:
    def test_reference_partition_48_over_5(self):
        # run_compute_metrics.py:36-52: 10,10,10,10,8 val frames per window
        assert PL.val_partition(48, 5, 24) == [
            (0, 10), (10, 20), (20, 30), (30, 40), (40, 48),
        ]

    def test_synthetic_ratio_one(self):
        assert PL.val_partition(8, 2, 8) == [(0, 5), (5, 8)]

    def test_covers_all_val_frames_disjointly(self):
        for V, T in [(48, 24), (8, 8), (46, 23), (52, 26)]:
            n = max(-(-T // 5), 1)
            sl = PL.val_partition(V, n, T)
            covered = [v for lo, hi in sl for v in range(lo, hi)]
            assert covered == list(range(V))


class TestSceneMetricsCli:
    def test_aggregates_window_dirs_odd_frames(self, tmp_path):
        import imageio.v3 as iio

        rng = np.random.default_rng(0)
        # two windows x 4 frames in window order; odd global indices kept
        names = [[f"{i:05d}" for i in range(4)],
                 [f"{i:05d}" for i in range(4, 8)]]
        for w, ns in enumerate(names):
            d = tmp_path / "results" / f"win_0{w*2}0{w*2+2}" / "rgb_test_optim"
            os.makedirs(d)
            for n in ns:
                img = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
                iio.imwrite(d / f"{n}.png", img)
                iio.imwrite(d / f"{n}_gt.png", img)  # identical -> psnr cap
        out = PL.compute_scene_metrics(str(tmp_path / "results"))
        assert out["psnr"] > 40.0  # identical pred/gt
        assert out["ssim"] == pytest.approx(1.0, abs=1e-3)

    def test_flat_dir_with_gt_dir(self, tmp_path):
        import imageio.v3 as iio

        rng = np.random.default_rng(1)
        rdir = tmp_path / "r"
        gdir = tmp_path / "g"
        os.makedirs(rdir)
        os.makedirs(gdir)
        for i in range(4):
            a = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
            b = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
            iio.imwrite(rdir / f"{i:05d}.png", a)
            iio.imwrite(gdir / f"{i:05d}.png", b)
        out = PL.compute_scene_metrics(str(rdir), str(gdir))
        assert 0 < out["psnr"] < 20  # random pairs
