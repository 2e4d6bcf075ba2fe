"""Validator: offline evaluation + test-time camera pose refinement.

Counterpart of /root/reference/flow3d/validator.py. The reference's
`validate_imgs_with_optimization` (validator.py:400-499) runs 500 host-side
Adam iterations per frame learning an *unconstrained* 3x3 residual rotation
and a translation on top of w2c (validator.py:423-445 — deliberately not
projected to SO(3); we keep that semantics). Here the whole refinement is
one jitted lax.scan, so a frame's 500 iterations are a single device
program; frames stream through it.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deblur4dgs_tpu.eval import metrics as M
from deblur4dgs_tpu.models.scene import SceneModel, render


def _cosine_lr(lr_init, eta_min, T):
    def sched(step):
        return eta_min + (lr_init - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.clip(step, 0, T) / T)
        )

    return sched


def make_pose_opt_fn(
    img_wh: tuple[int, int],
    num_iters: int = 500,
    lr: float = 1e-2,
    eta_min: float = 1e-4,
    num_exposure: int = 11,
    cap: int = 512,
    use_pallas: bool = True,
):
    """Build a jitted (scene, t, w2c, K, gt_img) -> (img, refined_w2c, losses)
    test-time pose refiner."""

    def render_with(scene, t, w2c, K, transR, transT):
        w2c_t = (
            jnp.zeros((4, 4))
            .at[:3, :3].set(transR @ w2c[:3, :3])
            .at[:3, 3].set(transT + w2c[:3, 3])
            .at[3, 3].set(1.0)
        )
        out = render(
            scene, t, w2c_t, K, img_wh, mode="mid", stage="second",
            num_exposure=num_exposure, cap=cap, use_pallas=use_pallas,
        )
        return out["img"], w2c_t

    @jax.jit
    def pose_opt(scene, t, w2c, K, gt_img):
        params = {"R": jnp.eye(3), "T": jnp.zeros(3)}
        opt = optax.adam(_cosine_lr(lr, eta_min, num_iters))
        opt_state = opt.init(params)

        def loss_fn(p):
            img, _ = render_with(scene, t, w2c, K, p["R"], p["T"])
            return jnp.mean(jnp.abs(img - gt_img))

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=num_iters
        )
        img, w2c_t = render_with(scene, t, w2c, K, params["R"], params["T"])
        return img, w2c_t, losses

    return pose_opt


class Validator:
    """Streaming evaluation over a val set (validator.py:77-499 analog)."""

    def __init__(
        self,
        scene: SceneModel,
        save_dir: str | None = None,
        has_bg: bool = True,
        lpips_fn: Callable | None = None,
    ):
        self.scene = scene
        self.save_dir = save_dir
        self.has_bg = has_bg
        self.lpips_fn = lpips_fn
        self.psnr = M.mPSNR()
        self.ssim = M.mSSIM()
        self.fg_psnr = M.mPSNR()
        self.fg_ssim = M.mSSIM()
        self.bg_psnr = M.mPSNR()
        self.bg_ssim = M.mSSIM()
        self.lpips_scores: list[float] = []
        self._render_jits: dict = {}

    def reset_metrics(self):
        """Fresh metric accumulators, keeping the jitted renders — a stage
        reuses ONE Validator across its mid-training validations (re-jitting
        the sharp render every validation epoch recompiles for nothing)."""
        self.psnr = M.mPSNR()
        self.ssim = M.mSSIM()
        self.fg_psnr = M.mPSNR()
        self.fg_ssim = M.mSSIM()
        self.bg_psnr = M.mPSNR()
        self.bg_ssim = M.mSSIM()
        self.lpips_scores = []

    def _render_sharp(self, t, w2c, K, img_wh, num_exposure, cap,
                      use_pallas, return_depth=False, return_mask=False,
                      bg_only=False):
        """Cached jitted mid-exposure render: per-frame eager dispatch
        through a remote-device tunnel costs far more than the render."""
        key = (img_wh, num_exposure, cap, use_pallas, return_depth,
               return_mask, bg_only)
        if key not in self._render_jits:
            self._render_jits[key] = jax.jit(
                lambda scene, t, w2c, K: render(
                    scene, t, w2c, K, img_wh, mode="mid", stage="second",
                    num_exposure=num_exposure, cap=cap,
                    use_pallas=use_pallas, return_depth=return_depth,
                    return_mask=return_mask, bg_only=bg_only,
                )
            )
        return self._render_jits[key](
            self.scene, jnp.asarray(t, jnp.float32), w2c, K
        )

    def _save(self, subdir, name, img):
        if self.save_dir is None:
            return
        import imageio.v3 as iio

        d = osp.join(self.save_dir, "results", subdir)
        os.makedirs(d, exist_ok=True)
        iio.imwrite(
            osp.join(d, f"{name}.png"),
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8),
        )

    def update_metrics(self, pred, gt, fg_mask, valid_mask):
        fg_valid = fg_mask * valid_mask
        bg_valid = (1 - fg_mask) * valid_mask
        main = valid_mask if self.has_bg else fg_valid
        self.psnr.update(pred, gt, main)
        self.ssim.update(pred, gt, main)
        if self.lpips_fn is not None:
            self.lpips_scores.append(
                float(self.lpips_fn(pred * main[..., None], gt * main[..., None]))
            )
        if self.has_bg:
            self.fg_psnr.update(pred, gt, fg_valid)
            self.fg_ssim.update(pred, gt, fg_valid)
            self.bg_psnr.update(pred, gt, bg_valid)
            self.bg_ssim.update(pred, gt, bg_valid)

    def validate_frame(
        self, t, w2c, K, gt_img, fg_mask, valid_mask, img_wh,
        frame_name="frame", num_exposure=11, cap=512, use_pallas=True,
        subdir="rgb_deblur_mid", bg_only=False,
    ):
        """Sharp mid-exposure render + metrics (validator.py:83-124).

        bg_only: render without the fg gaussians — the static-stage
        validation semantics (the reference's stage-1 run validates a
        model that HAS no fg yet; rendering untrained fg would pollute
        the val_static metrics)."""
        out = self._render_sharp(
            t, w2c, K, img_wh, num_exposure, cap, use_pallas,
            bg_only=bg_only,
        )
        self.update_metrics(out["img"], gt_img, fg_mask, valid_mask)
        self._save(subdir, f"{frame_name}_img", out["img"])
        return out

    def validate_frame_with_pose_opt(
        self, pose_opt_fn, t, w2c, K, gt_img, fg_mask, valid_mask,
        frame_name="frame", subdir="rgb_test_optim", with_metrics=True,
    ):
        """Refined render + metrics (validator.py:400-499).

        with_metrics=False still renders + saves (the reference renders
        every val frame but the metrics stage keeps only held-out odd
        frames, run_compute_metrics.py:60-61)."""
        img, w2c_t, losses = pose_opt_fn(self.scene, t, w2c, K, gt_img)
        if with_metrics:
            self.update_metrics(img, gt_img, fg_mask, valid_mask)
        self._save(subdir, frame_name, img)
        self._save(subdir, f"{frame_name}_gt", gt_img)
        return img, w2c_t, losses

    def validate_keypoints(
        self, t, w2c, K, target_t, target_w2c, target_K, keypoints_2d,
        target_keypoints_2d, img_wh, pck_threshold_ratio=0.05,
        num_exposure=11, cap=512, use_pallas=True,
    ):
        """PCK via rendered tracks_3d channels (validator.py:126-215):
        render time t with target_ts=[target_t], read the camera-space
        track positions at the query keypoints, project by target_K, and
        score against the target keypoints."""
        from deblur4dgs_tpu.eval.metrics import compute_pck

        W, H = img_wh
        out = render(
            self.scene, t, w2c, K, img_wh, mode="mid", stage="second",
            target_ts=jnp.asarray([target_t], jnp.float32),
            target_w2cs=target_w2c[None],
            num_exposure=num_exposure, cap=cap, use_pallas=use_pallas,
        )
        q = jnp.asarray(keypoints_2d).astype(jnp.int32)
        tracks = out["tracks_3d"][q[:, 1], q[:, 0], 0]  # (P, 3) cam space
        uvz = (target_K @ tracks.T).T
        pred_2d = uvz[:, :2] / jnp.maximum(uvz[:, 2:], 1e-6)
        thr = pck_threshold_ratio * max(W, H)
        return compute_pck(pred_2d, jnp.asarray(target_keypoints_2d), thr)

    def save_train_videos(
        self, dataset, epoch: int, fps: float = 10.0, num_exposure=11,
        cap=512, use_pallas=True,
    ):
        """rgb/depth/mask training-view videos (validator.py:216-398)."""
        if self.save_dir is None:
            return
        from deblur4dgs_tpu.vis.utils import apply_depth_colormap, save_video

        W, H = dataset.get_img_wh()
        rgbs, depths, masks = [], [], []
        for i in range(len(dataset)):
            out = self._render_sharp(
                i,
                jnp.asarray(np.asarray(dataset.w2cs[i])),
                jnp.asarray(np.asarray(dataset.Ks[i])),
                (W, H), num_exposure, cap, use_pallas,
                return_depth=True, return_mask=True,
            )
            rgbs.append(np.asarray(out["img"]))
            depths.append(
                apply_depth_colormap(
                    np.asarray(out["depth"][..., 0]),
                    np.asarray(out["acc"][..., 0]),
                )
            )
            masks.append(np.repeat(np.asarray(out["mask"]), 3, axis=-1))
        d = osp.join(self.save_dir, "results", "videos")
        os.makedirs(d, exist_ok=True)
        for name, frames in (("rgb", rgbs), ("depth", depths), ("mask", masks)):
            save_video(
                osp.join(d, f"{name}_{epoch}.mp4"), np.stack(frames), fps=fps
            )

    def compute(self) -> dict:
        out = {
            "val/psnr": self.psnr.compute(),
            "val/ssim": self.ssim.compute(),
        }
        if self.lpips_scores:
            out["val/lpips"] = float(np.mean(self.lpips_scores))
        if self.has_bg and len(self.fg_psnr):
            out.update(
                {
                    "val/fg_psnr": self.fg_psnr.compute(),
                    "val/fg_ssim": self.fg_ssim.compute(),
                    "val/bg_psnr": self.bg_psnr.compute(),
                    "val/bg_ssim": self.bg_ssim.compute(),
                }
            )
        return out
