"""Validator: sharp validation, pose-opt refinement, keypoints, videos."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.eval.validator import Validator, make_pose_opt_fn
from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from tests.test_models import identity_bases, make_gaussians

W, H = 48, 32
K = jnp.array([[40.0, 0.0, 24.0], [0.0, 40.0, 16.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


@pytest.fixture(scope="module")
def scene():
    return SceneModel(
        fg=make_gaussians(40, seed=1),
        bg=make_gaussians(60, seed=2, with_coefs=False),
        bases=identity_bases(4, 8),
        move=init_move_model(jax.random.PRNGKey(0), num_frames=8),
    )


class TestPoseOpt:
    def test_recovers_perturbed_pose(self, scene):
        gt = render(
            scene, 3, EYE4, K, (W, H), mode="mid", use_pallas=False,
            num_exposure=3, cap=256,
        )["img"]
        # perturb the camera; refinement should pull the render back
        w2c_bad = EYE4.at[0, 3].add(0.05).at[1, 3].add(-0.03)
        pose_opt = make_pose_opt_fn(
            (W, H), num_iters=100, num_exposure=3, cap=256, use_pallas=False,
        )
        img, w2c_t, losses = pose_opt(scene, 3, w2c_bad, K, gt)
        assert float(losses[-1]) < float(losses[0]) * 0.5
        err0 = float(jnp.abs(
            render(scene, 3, w2c_bad, K, (W, H), mode="mid", use_pallas=False,
                   num_exposure=3, cap=256)["img"] - gt).mean())
        err1 = float(jnp.abs(img - gt).mean())
        assert err1 < err0 * 0.6


class TestValidatorSurface:
    def test_validate_frame_and_metrics(self, scene, tmp_path):
        v = Validator(scene, save_dir=str(tmp_path))
        gt = render(
            scene, 2, EYE4, K, (W, H), mode="mid", use_pallas=False,
            num_exposure=3, cap=256,
        )["img"]
        v.validate_frame(
            2, EYE4, K, gt, jnp.ones((H, W)), jnp.ones((H, W)), (W, H),
            frame_name="00002", num_exposure=3, cap=256, use_pallas=False,
        )
        out = v.compute()
        assert out["val/psnr"] > 40  # self-consistency
        assert os.path.exists(
            tmp_path / "results" / "rgb_deblur_mid" / "00002_img.png"
        )

    def test_validate_keypoints_self_consistent(self, scene):
        v = Validator(scene, save_dir=None)
        # project fg gaussians at t=2 to get GT keypoints in view 0
        from deblur4dgs_tpu.models.scene import compute_poses_fg

        m, _ = compute_poses_fg(scene, jnp.asarray([2.0]))
        pts = m[:8, 0]
        uvz = (K @ pts.T).T
        uv = uvz[:, :2] / uvz[:, 2:]
        inb = (uv[:, 0] >= 1) & (uv[:, 0] < W - 1) & (uv[:, 1] >= 1) & (uv[:, 1] < H - 1)
        uv = uv[inb][:4]
        pck = v.validate_keypoints(
            2, EYE4, K, 2.0, EYE4, K, jnp.floor(uv), uv, (W, H),
            num_exposure=3, cap=256, use_pallas=False,
        )
        assert 0.0 <= pck <= 1.0

    def test_save_train_videos(self, scene, tmp_path):
        class MiniDS:
            w2cs = np.broadcast_to(np.eye(4), (2, 4, 4))
            Ks = np.broadcast_to(np.asarray(K), (2, 3, 3))

            def get_img_wh(self):
                return (W, H)

            def __len__(self):
                return 2

        v = Validator(scene, save_dir=str(tmp_path))
        v.save_train_videos(
            MiniDS(), epoch=1, num_exposure=3, cap=256, use_pallas=False
        )
        vids = sorted(os.listdir(tmp_path / "results" / "videos"))
        stems = {v.rsplit(".", 1)[0] for v in vids}
        assert stems == {"depth_1", "mask_1", "rgb_1"}
