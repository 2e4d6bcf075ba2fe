"""Tests for Gaussians / MotionBases / MoveModel / SceneModel.render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.models.gaussians import Gaussians
from deblur4dgs_tpu.models.motion_bases import (
    MotionBases,
    compute_transforms,
    transform_gaussians,
)
from deblur4dgs_tpu.models.move_model import (
    MoveModel,
    exposure_samples,
    init_move_model,
)
from deblur4dgs_tpu.models.scene import SceneModel, render
from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.ops.rasterize_ref import render_ref

W, H = 48, 32
K = jnp.array([[40.0, 0.0, 24.0], [0.0, 40.0, 16.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def make_gaussians(n=50, k_bases=4, seed=0, with_coefs=True):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    return Gaussians(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        scales=jnp.full((n, 3), np.log(0.08), jnp.float32),
        colors=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        opacities=jnp.full((n,), 1.5, jnp.float32),
        motion_coefs=(
            jnp.asarray(rng.normal(size=(n, k_bases)).astype(np.float32))
            if with_coefs
            else None
        ),
    )


def identity_bases(k=4, t=8):
    """Bases whose transform is the identity at every frame."""
    ident6 = jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), (k, t, 1))
    return MotionBases(rots=ident6, transls=jnp.zeros((k, t, 3)))


class TestGaussians:
    def test_activations(self):
        g = make_gaussians()
        np.testing.assert_allclose(
            jnp.linalg.norm(g.get_quats(), axis=-1), 1.0, atol=1e-5
        )
        assert jnp.all(g.get_scales() > 0)
        assert jnp.all((g.get_opacities() > 0) & (g.get_opacities() < 1))
        np.testing.assert_allclose(g.get_coefs().sum(-1), 1.0, atol=1e-5)

    def test_alive_mask_zeroes_opacity(self):
        g = make_gaussians(10)
        alive = jnp.arange(10) < 5
        g = g._replace(alive=alive)
        op = g.get_opacities()
        assert jnp.all(op[5:] == 0) and jnp.all(op[:5] > 0)


class TestMotionBases:
    def test_identity_bases(self):
        bases = identity_bases()
        coefs = jax.nn.softmax(jnp.zeros((20, 4)), -1)
        tf = compute_transforms(bases, jnp.array([2.0]), coefs)
        assert tf.shape == (20, 1, 3, 4)
        np.testing.assert_allclose(
            tf[:, 0, :, :3], jnp.broadcast_to(jnp.eye(3), (20, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(tf[..., 3], 0.0, atol=1e-6)

    def test_translation_lerp(self):
        k, t = 2, 4
        bases = identity_bases(k, t)
        # basis 0 translates +x by frame index; basis 1 static
        transls = jnp.zeros((k, t, 3)).at[0, :, 0].set(jnp.arange(t, dtype=jnp.float32))
        bases = bases._replace(transls=transls)
        coefs = jnp.array([[100.0, 0.0]])  # softmax -> basis 0
        coefs = jax.nn.softmax(coefs, -1)
        tf = compute_transforms(bases, jnp.array([1.5]), coefs)
        np.testing.assert_allclose(tf[0, 0, 0, 3], 1.5, atol=1e-4)

    def test_fractional_rotation_blend(self):
        # one basis rotating about z; fractional time blends 6D reps
        k, t = 1, 3
        angles = jnp.array([0.0, 0.4, 0.8])
        R = lie.so3_exp(jnp.stack([jnp.zeros(3), jnp.zeros(3), angles], -1))
        rots = lie.rmat_to_cont_6d(R)[None]  # (1, 3, 6)
        bases = MotionBases(rots=rots, transls=jnp.zeros((k, t, 3)))
        coefs = jnp.ones((5, 1))
        tf = compute_transforms(bases, jnp.array([0.5]), coefs)
        # blend of 6D vectors then orthonormalization: close to rot by 0.2
        expect = lie.so3_exp(jnp.array([0.0, 0.0, 0.2]))
        np.testing.assert_allclose(tf[0, 0, :, :3], expect, atol=5e-3)

    def test_transform_gaussians(self):
        g = make_gaussians(8)
        wu = jnp.array([0.2, -0.1, 0.3, 0.5, 0.0, -0.2])
        pose = lie.se3_exp(wu)
        tf = jnp.broadcast_to(pose, (8, 1, 3, 4))
        m, q = transform_gaussians(tf, g.means, g.get_quats())
        np.testing.assert_allclose(m[:, 0], lie.pose_apply(pose, g.means), atol=1e-5)
        R_new = lie.quat_to_rmat(q[:, 0])
        R_expect = pose[:3, :3] @ lie.quat_to_rmat(g.get_quats())
        np.testing.assert_allclose(R_new, R_expect, atol=1e-4)


class TestMoveModel:
    def test_zero_init_identity(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        s = exposure_samples(model, EYE4, t=3, num_cameras=11, stage="second")
        assert s.poses.shape == (11, 3, 4)
        for i in range(11):
            np.testing.assert_allclose(s.poses[i], jnp.eye(3, 4), atol=1e-6)
        # times symmetric around t with clamped dt=0.5
        np.testing.assert_allclose(s.delta_t, 0.5, atol=1e-6)
        np.testing.assert_allclose(s.times[0], 2.5, atol=1e-5)
        np.testing.assert_allclose(s.times[-1], 3.5, atol=1e-5)
        np.testing.assert_allclose(s.times[5], 3.0, atol=1e-5)

    def test_stage_first_zero_dt(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        s = exposure_samples(model, EYE4, t=3, num_cameras=11, stage="first")
        np.testing.assert_allclose(s.delta_t, 0.0)
        np.testing.assert_allclose(s.times, 3.0, atol=1e-6)

    def test_boundary_frames_zero_dt(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        for t in (0, 7):
            s = exposure_samples(model, EYE4, t=t, num_cameras=5, stage="second")
            np.testing.assert_allclose(s.delta_t, 0.0)

    def test_dt_clamp(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        model = model._replace(time_params=jnp.full((8,), 5.0))
        s = exposure_samples(model, EYE4, t=3, num_cameras=5, stage="second")
        np.testing.assert_allclose(s.delta_t, 0.9, atol=1e-6)
        model = model._replace(time_params=jnp.full((8,), -3.0))
        s = exposure_samples(model, EYE4, t=3, num_cameras=5, stage="second")
        np.testing.assert_allclose(s.delta_t, 0.1, atol=1e-6)

    def test_mode_slicing(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        for mode, expect_t in (("mid", 3.0), ("start", 2.5), ("end", 3.5)):
            s = exposure_samples(model, EYE4, t=3, num_cameras=11, stage="second", mode=mode)
            assert s.poses.shape == (1, 3, 4)
            np.testing.assert_allclose(s.times[0], expect_t, atol=1e-5)

    def test_camera_mode_cubic(self):
        """Cubic ease: valid poses, exact agreement with linear at the
        midpoint (the duplicated-knot B-spline basis sums to 1/2 there),
        and endpoints pulled inward vs the linear ends."""
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        head = [dict(p) for p in model.head_end]
        head[-1] = dict(head[-1])
        head[-1]["b"] = head[-1]["b"] + jnp.array([0.2, 0, 0, 0.4, 0, 0])
        model = model._replace(head_end=head)
        lin = exposure_samples(
            model, EYE4, t=3, num_cameras=11, stage="second",
            camera_mode="linear",
        )
        cub = exposure_samples(
            model, EYE4, t=3, num_cameras=11, stage="second",
            camera_mode="cubic",
        )
        assert cub.poses.shape == (11, 3, 4)
        for i in range(11):
            R = np.asarray(cub.poses[i, :, :3])
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(
            cub.poses[5], lin.poses[5], atol=1e-5
        )
        span = lambda p: float(jnp.abs(p[-1] - p[0]).max())
        assert span(cub.poses) < span(lin.poses)
        np.testing.assert_allclose(
            np.asarray(cub.times), np.asarray(lin.times), atol=1e-6
        )

    def test_nonzero_heads_produce_trajectory(self):
        model = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        # bump the end head bias: end pose must differ from start pose
        head = [dict(p) for p in model.head_end]
        head[-1] = dict(head[-1])
        head[-1]["b"] = head[-1]["b"] + jnp.array([0.1, 0, 0, 0.2, 0, 0])
        model = model._replace(head_end=head)
        s = exposure_samples(model, EYE4, t=3, num_cameras=11, stage="second")
        np.testing.assert_allclose(s.poses[0], jnp.eye(3, 4), atol=1e-6)
        assert float(jnp.abs(s.poses[-1] - jnp.eye(3, 4)).max()) > 1e-3


class TestSceneRender:
    def _scene(self, with_bg=True):
        fg = make_gaussians(40, seed=1)
        bg = make_gaussians(60, seed=2, with_coefs=False) if with_bg else None
        bases = identity_bases(4, 8)
        move = init_move_model(jax.random.PRNGKey(0), num_frames=8)
        return SceneModel(fg=fg, bg=bg, bases=bases, move=move)

    def test_static_blur_equals_sharp(self):
        # identity bases + zero-init move model: all sub-frames identical
        scene = self._scene()
        out_b = render(scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False)
        out_m = render(scene, 3, EYE4, K, (W, H), mode="mid", use_pallas=False)
        np.testing.assert_allclose(out_b["img"], out_m["img"], atol=1e-5)
        np.testing.assert_allclose(out_b["img"], out_b["pred_sharp_img"], atol=1e-5)
        assert out_b["exposure_imgs"].shape[0] == 11
        assert out_m["exposure_imgs"].shape[0] == 1

    def test_matches_oracle_single_frame(self):
        scene = self._scene()
        out = render(scene, 3, EYE4, K, (W, H), mode="mid", use_pallas=False, bg_color=0.6)
        means, quats = (
            jnp.concatenate([scene.fg.means, scene.bg.means], 0),
            jnp.concatenate([scene.fg.get_quats(), scene.bg.get_quats()], 0),
        )
        scales = jnp.concatenate([scene.fg.get_scales(), scene.bg.get_scales()], 0)
        opac = jnp.concatenate([scene.fg.get_opacities(), scene.bg.get_opacities()], 0)
        colors = jnp.concatenate([scene.fg.get_colors(), scene.bg.get_colors()], 0)
        img_o, alpha_o = render_ref(
            means, quats, scales, opac, colors, EYE4, K, (W, H), jnp.full((3,), 0.6)
        )
        np.testing.assert_allclose(out["img"], img_o, atol=1e-5)
        np.testing.assert_allclose(out["acc"][..., 0], alpha_o, atol=1e-5)

    def test_moving_fg_blur_differs_from_sharp(self):
        scene = self._scene()
        # basis 0 translates along x over frames
        transls = scene.bases.transls.at[0, :, 0].set(
            jnp.linspace(0, 0.8, scene.bases.num_frames)
        )
        scene = scene._replace(bases=scene.bases._replace(transls=transls))
        out_b = render(scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False)
        out_m = render(scene, 3, EYE4, K, (W, H), mode="mid", use_pallas=False)
        diff = float(jnp.abs(out_b["img"] - out_m["img"]).max())
        assert diff > 1e-3  # motion blur changed the image
        np.testing.assert_allclose(  # mid-subframe of blurry == sharp render
            out_b["pred_sharp_img"], out_m["img"], atol=1e-5
        )

    def test_mask_tracks_depth_channels(self):
        scene = self._scene()
        target_ts = jnp.array([1.0, 4.0])
        out = render(
            scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False,
            return_mask=True, return_depth=True, target_ts=target_ts,
            target_w2cs=jnp.broadcast_to(EYE4, (2, 4, 4)),
        )
        assert out["img"].shape == (H, W, 3)
        assert out["mask"].shape == (H, W, 1)
        assert out["tracks_3d"].shape == (H, W, 2, 3)
        assert out["depth"].shape == (H, W, 1)
        assert jnp.all(out["mask"] <= 1.0 + 1e-5)
        # depth positive where alpha is meaningful
        sel = out["acc"][..., 0] > 0.5
        assert float(out["depth"][..., 0][sel].min()) > 0.5

    def test_exposure_masks_stack(self):
        """exposure_masks = per-sub-frame rendered fg-mask channel (the
        AlignedLoss weighting mask, reference trainer.py:605,613)."""
        scene = self._scene()
        transls = scene.bases.transls.at[0, :, 0].set(
            jnp.linspace(0, 0.8, scene.bases.num_frames)
        )
        scene = scene._replace(bases=scene.bases._replace(transls=transls))
        out = render(
            scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False,
            return_mask=True, num_exposure=5,
        )
        assert out["exposure_masks"].shape == (5, H, W, 1)
        # mid sub-frame's mask == the sharp mid render's mask
        out_m = render(
            scene, 3, EYE4, K, (W, H), mode="mid", use_pallas=False,
            return_mask=True,
        )
        np.testing.assert_allclose(
            out["exposure_masks"][2], out_m["mask"], atol=1e-5
        )
        # fg is moving: sub-frame masks genuinely differ across the window
        assert float(
            jnp.abs(out["exposure_masks"][0] - out["exposure_masks"][-1]).max()
        ) > 1e-3
        # no mask channel / no stack => None
        out_nm = render(scene, 3, EYE4, K, (W, H), mode="blury",
                        use_pallas=False, num_exposure=3)
        assert out_nm["exposure_masks"] is None
        out_ns = render(scene, 3, EYE4, K, (W, H), mode="blury",
                        use_pallas=False, return_mask=True, num_exposure=3,
                        return_exposure_stack=False)
        assert out_ns["exposure_masks"] is None

    def test_bg_only_static(self):
        scene = self._scene()
        out = render(scene, 3, EYE4, K, (W, H), mode="blury", bg_only=True, use_pallas=False)
        img_o, _ = render_ref(
            scene.bg.means, scene.bg.get_quats(), scene.bg.get_scales(),
            scene.bg.get_opacities(), scene.bg.get_colors(), EYE4, K, (W, H),
            jnp.ones((3,)),
        )
        np.testing.assert_allclose(out["img"], img_o, atol=1e-5)

    def test_grads_flow_everywhere(self):
        scene = self._scene()

        def loss(scene):
            out = render(scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False)
            return jnp.mean(out["img"] ** 2) + jnp.mean(out["delta_t"])

        g = jax.grad(loss)(scene)
        # fg params, bases, move-model heads and time_params all get grads
        assert float(jnp.abs(g.fg.means).max()) > 0
        assert float(jnp.abs(g.bases.transls).max()) > 0
        assert float(jnp.abs(g.move.head_end[-1]["w"]).max()) > 0
        assert float(jnp.abs(g.move.time_params).max()) > 0
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))
