"""Trainer: loss branches + jitted train step.

TPU-native counterpart of /root/reference/flow3d/trainer.py. The reference
runs three loss branches per step (static / dynamic / static-reg,
trainer.py:203-274), backprops once, then steps a dict of per-tensor Adam
optimizers. Here the whole step — K-sub-frame renders for every frame in
every branch, all losses, gradients, optax update, density-control stat
accumulation — is one jitted function over a single TrainState pytree.

Density-control statistics use the dummy-tap trick: a zeros array is added
to every sub-frame's projected means2d; its gradient equals dL/d(means2d)
per view, which the step normalizes and accumulates exactly like
trainer.py:953-990 without any retain_grad machinery.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.models.scene import SceneModel, compute_transforms, render
from deblur4dgs_tpu.train import losses as L
from deblur4dgs_tpu.train.optimizers import gate_move_pose_grads, make_optimizer


class FrameBatch(NamedTuple):
    """A batch of B frames (preloaded, device-resident)."""

    ts: jnp.ndarray  # (B,) int32 frame indices (window-local)
    w2cs: jnp.ndarray  # (B, 4, 4)
    Ks: jnp.ndarray  # (B, 3, 3)
    imgs: jnp.ndarray  # (B, H, W, 3)
    masks: jnp.ndarray  # (B, H, W) fg masks
    valid_masks: jnp.ndarray  # (B, H, W)
    depths: jnp.ndarray  # (B, H, W)


class TrackBatch(NamedTuple):
    """2D-track supervision for one dynamic frame (base_dataset.py:59-77)."""

    query_tracks_2d: jnp.ndarray  # (P, 2) on-grid query pixels
    target_ts: jnp.ndarray  # (Bt,)
    target_w2cs: jnp.ndarray  # (Bt, 4, 4)
    target_Ks: jnp.ndarray  # (Bt, 3, 3)
    target_tracks_2d: jnp.ndarray  # (Bt, P, 2)
    target_visibles: jnp.ndarray  # (Bt, P)
    target_confidences: jnp.ndarray  # (Bt, P)
    target_track_depths: jnp.ndarray  # (Bt, P)


class DensityStats(NamedTuple):
    """Running per-gaussian stats over [fg_cap + bg_cap] slots."""

    grad_norm_acc: jnp.ndarray
    vis_count: jnp.ndarray
    max_radii: jnp.ndarray


class TrainState(NamedTuple):
    scene: SceneModel
    opt_state: Any
    step: jnp.ndarray
    stats: DensityStats


def init_train_state(
    scene: SceneModel, lr_cfg: SceneLRConfig, optim_cfg: OptimizerConfig
) -> TrainState:
    opt = make_optimizer(scene, lr_cfg, optim_cfg)
    n = scene.num_fg + scene.num_bg
    return TrainState(
        scene=scene,
        opt_state=opt.init(scene),
        step=jnp.asarray(0, jnp.int32),
        stats=DensityStats(
            grad_norm_acc=jnp.zeros((n,)),
            vis_count=jnp.zeros((n,), jnp.int32),
            max_radii=jnp.zeros((n,)),
        ),
    )


def dilate_mask(mask: jnp.ndarray, size: int = 9) -> jnp.ndarray:
    """9x9 max-pool dilation (trainer.py:120,388)."""
    pad = size // 2
    return jax.lax.reduce_window(
        mask,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


def downsample_area(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Area (average-pool) downsample of (H, W, C) by an integer factor."""
    H, W, C = img.shape
    Hc, Wc = H // factor, W // factor
    img = img[: Hc * factor, : Wc * factor]
    return img.reshape(Hc, factor, Wc, factor, C).mean(axis=(1, 3))


def exposure_consistency_loss(imgs_s, masks_s, flow_fn):
    """Exposure sub-frame consistency (trainer.py:599-618).

    Each term is the PWC-Net flow-aligned L1 between a sub-frame pair,
    weighted by BOTH the flow validity mask and the DETACHED rendered
    fg-mask of the target sub-frame (trainer.py:605,613-616 passes
    `all_imgs[..][:, 0, :, :, 3:4].detach()` into AlignedLoss, applied at
    loss_utils.py:176-177) — without it the term supervises background /
    empty regions the reference deliberately excludes.

    imgs_s: (S, H, W, 3) per-sub-frame renders; masks_s: (S, H, W, 1)
    per-sub-frame rendered fg-masks; flow_fn(a, b) -> (aligned_a, fmask).
    """
    S = imgs_s.shape[0]

    def pair_loss(a, b, m):
        aligned, fmask = flow_fn(a, b)
        w = fmask * jax.lax.stop_gradient(m)
        return jnp.mean(jnp.abs(aligned * w - b * w))

    cons = 0.0
    for ee in range(S - 1):
        cons += pair_loss(imgs_s[ee], imgs_s[ee + 1], masks_s[ee + 1])
    for ee in range(1, S):
        cons += pair_loss(
            imgs_s[ee], jax.lax.stop_gradient(imgs_s[0]), masks_s[0]
        )
    return cons / (S - 1)


def rgb_l1_ssim(pred, gt, mask=None):
    """0.8*L1 + 0.2*(1-SSIM), optionally pre-multiplied by a mask
    (trainer.py:389-392). pred/gt: (B, H, W, 3); mask: (B, H, W, 1)."""
    if mask is not None:
        pred = pred * mask
        gt = gt * mask
    l1 = jnp.mean(jnp.abs(pred - gt))
    ssim_val = jnp.mean(jax.vmap(L.ssim)(pred, gt))
    return 0.8 * l1 + 0.2 * (1.0 - ssim_val)


# ---------------------------------------------------------------------------
# Loss branches
# ---------------------------------------------------------------------------


def compute_static_losses(
    scene: SceneModel,
    batch: FrameBatch,
    taps: jnp.ndarray,  # (B, S, N_bg, 2)
    lcfg: LossesConfig,
    rcfg: RenderConfig,
    stage: str,
    subframe_sharding=None,
    tile_mesh=None,
):
    """Static branch (trainer.py:276-434): bg-only blurry renders.

    Returns (loss, aux dict with per-view radii for density stats).
    """
    B, H, W = batch.imgs.shape[:3]
    img_wh = (W, H)

    def one_frame(carry, xs):
        t, w2c, Kmat, tap = xs
        out = render(
            scene, t, w2c, Kmat, img_wh,
            mode="blury", stage=stage, bg_only=True,
            return_mask=True, return_depth=True, bg_color=1.0,
            num_exposure=rcfg.num_exposure, cap=rcfg.tile_cap,
            use_pallas=rcfg.use_pallas, means2d_tap=tap,
            bucketed=rcfg.bucketed,
            camera_mode=rcfg.camera_mode,
            max_tiles_per_gauss=rcfg.max_tiles_per_gauss,
            subframe_sharding=subframe_sharding,
            tile_mesh=tile_mesh,
            return_exposure_stack=False,
        )
        keep = {
            "img": out["img"],
            "depth": out["depth"],
            "poses": out["poses"],
            "radii": out["radii"],
            "tile_overflow": out["tile_overflow"],
        }
        return carry, keep

    _, outs = jax.lax.scan(
        one_frame, 0,
        (batch.ts.astype(jnp.float32), batch.w2cs, batch.Ks, taps),
    )

    masks = batch.masks * batch.valid_masks
    bg_colors = jnp.ones((B, 1, 1, 3))
    imgs = batch.imgs * batch.valid_masks[..., None] + (
        1.0 - batch.valid_masks[..., None]
    ) * bg_colors
    rendered = outs["img"] * batch.valid_masks[..., None] + (
        1.0 - batch.valid_masks[..., None]
    ) * bg_colors

    mask_dilated = jax.vmap(dilate_mask)(masks)[..., None]
    inv = 1.0 - mask_dilated
    rgb_loss = rgb_l1_ssim(rendered, imgs, inv)
    loss = rgb_loss * lcfg.w_rgb

    depth_masks = inv
    # depth bounded below (see mapped_depth note): uncovered pixels give
    # ED depth ~0 and an unbounded disparity that destabilizes training
    pred_disp = 1.0 / jnp.maximum(outs["depth"], 1e-2)
    tgt_disp = 1.0 / jnp.maximum(batch.depths[..., None], 1e-2)
    depth_l1 = L.masked_l1_loss(
        pred_disp, tgt_disp, mask=depth_masks[..., 0], quantile=0.98
    )
    loss += lcfg.w_depth_reg * depth_l1
    grad_l = jnp.mean(
        jax.vmap(
            lambda p, g, m: L.compute_gradient_loss(p, g, m, quantile=0.95)
        )(pred_disp[..., 0], tgt_disp[..., 0], depth_masks[..., 0] > 0.5)
    )
    loss += lcfg.w_depth_grad * grad_l

    loss += lcfg.w_scale_var * L.scale_variance_loss(
        scene.bg.scales, scene.bg.get_alive()
    )

    # Exposure-pose continuity across the 3 consecutive frames
    # (trainer.py:429-433 computes this then accidentally discards it via
    # `loss + reg`; we keep the author-intended behavior).
    poses = outs["poses"]  # (B, S, 3, 4)
    cont = jnp.mean(jnp.abs(poses[0, -1] - poses[1, 0])) + jnp.mean(
        jnp.abs(poses[2, 0] - poses[1, -1])
    ) if B == 3 else 0.0
    loss = loss + cont

    aux = {
        "radii": outs["radii"],
        "rgb_loss": rgb_loss,
        "depth_l1": depth_l1,
        "depth_grad": grad_l,
        "pose_cont": cont,
        "tile_overflow": jnp.mean(outs["tile_overflow"]),
    }
    return loss, aux


def compute_dynamic_losses(
    scene: SceneModel,
    batch: FrameBatch,  # B == 1
    tracks: TrackBatch,
    taps: jnp.ndarray,  # (1, S, N_all, 2)
    lcfg: LossesConfig,
    rcfg: RenderConfig,
    stage: str,
    epoch: jnp.ndarray,
    num_window_frames: int,
    batch4_imgs: jnp.ndarray | None = None,  # (1, H/4, W/4, 3) multires guide
    flow_fn=None,
    subframe_sharding=None,
    tile_mesh=None,
):
    """Dynamic branch (trainer.py:436-793): full blurry render + tracks."""
    B, H, W = batch.imgs.shape[:3]
    img_wh = (W, H)
    Bt = tracks.target_ts.shape[0]

    t = batch.ts[0].astype(jnp.float32)
    out = render(
        scene, t, batch.w2cs[0], batch.Ks[0], img_wh,
        mode="blury", stage=stage,
        target_ts=tracks.target_ts.astype(jnp.float32),
        target_w2cs=tracks.target_w2cs,
        return_mask=True, return_depth=True, bg_color=1.0,
        num_exposure=rcfg.num_exposure, cap=rcfg.tile_cap,
        use_pallas=rcfg.use_pallas, means2d_tap=taps[0],
        bucketed=rcfg.bucketed,
        camera_mode=rcfg.camera_mode,
        max_tiles_per_gauss=rcfg.max_tiles_per_gauss,
        subframe_sharding=subframe_sharding,
        tile_mesh=tile_mesh,
        return_exposure_stack=flow_fn is not None,
    )

    masks = (batch.masks * batch.valid_masks)[0]  # (H, W)
    valid = batch.valid_masks[0]
    bg_color = jnp.ones((3,))
    img_gt = batch.imgs[0] * valid[..., None] + (1 - valid[..., None]) * bg_color
    rendered = out["img"] * valid[..., None] + (1 - valid[..., None]) * bg_color

    mask_dilated = dilate_mask(masks)[..., None]
    rgb_dyn = rgb_l1_ssim(rendered[None], img_gt[None], mask_dilated[None])
    rgb_full = rgb_l1_ssim(rendered[None], img_gt[None])
    loss = (rgb_dyn + rgb_full) * lcfg.w_rgb

    # Exposure sub-frame consistency (trainer.py:599-618). With no flow net
    # configured this term is skipped (the reference's AlignedLoss needs
    # pretrained PWC-Net weights).
    if flow_fn is not None:
        cons = exposure_consistency_loss(
            out["exposure_imgs"], out["exposure_masks"], flow_fn
        )
        loss += jnp.where(epoch > lcfg.exposure_cons_start_epoch, 1.0, 0.0) * (
            cons * lcfg.w_exposure_cons
        )

    # Mask loss (trainer.py:620-631).
    mask_loss = jnp.mean((out["acc"] - 1.0) ** 2) + L.masked_l1_loss(
        out["mask"], masks[..., None], quantile=0.98
    )
    loss += mask_loss * lcfg.w_mask

    # 2D track loss (trainer.py:633-667), gathered at on-grid query pixels.
    # Gather the composited camera-space tracks at the P query pixels FIRST,
    # then project — the projection is per-pixel, so this is exact, and it
    # avoids materializing (Bt, H*W, 3) full-image projections (several ms
    # of layout copies per step at 720p) for 256 used pixels.
    q = tracks.query_tracks_2d.astype(jnp.int32)  # (P, 2) x,y on grid
    tr_at_q = out["tracks_3d"][q[:, 1], q[:, 0]]  # (P, Bt, 3)
    pred_2d_h = jnp.einsum(
        "bij,pbj->bpi", tracks.target_Ks, tr_at_q
    )  # (Bt, P, 3)
    # The reference clamps at 1e-6 (trainer.py:641), letting the disparity
    # loss reach ~1e5 at barely-covered query pixels, which can destabilize
    # training when track coverage is thin. We bound depth at 1e-2 —
    # identical for any valid normalized-scene depth, bounded blowup.
    mapped_depth = jnp.maximum(pred_2d_h[..., 2:], 1e-2)  # (Bt, P, 1)
    pred_at_q = pred_2d_h[..., :2] / mapped_depth  # (Bt, P, 2)
    depth_at_q = mapped_depth[..., 0]  # (Bt, P)

    frame_intervals = jnp.abs(t - tracks.target_ts.astype(jnp.float32))
    w_interval = jnp.exp(-2.0 * frame_intervals / num_window_frames)  # (Bt,)
    track_weights = tracks.target_confidences * w_interval[:, None]  # (Bt, P)
    vis_w = track_weights * tracks.target_visibles

    track_2d_loss = L.masked_l1_loss(
        pred_at_q, tracks.target_tracks_2d, mask=vis_w, quantile=0.98
    ) / max(H, W)
    loss += track_2d_loss * lcfg.w_track

    # Depth losses (trainer.py:669-689); bounded like the static branch.
    pred_disp = 1.0 / jnp.maximum(out["depth"], 1e-2)
    tgt_disp = 1.0 / jnp.maximum(batch.depths[0][..., None], 1e-2)
    depth_loss = L.masked_l1_loss(
        pred_disp, tgt_disp, mask=masks, quantile=0.98
    )
    loss += depth_loss * lcfg.w_depth_reg

    mapped_depth_loss = L.masked_l1_loss(
        1.0 / depth_at_q[..., None],  # already bounded >= 1e-2
        1.0 / jnp.maximum(tracks.target_track_depths[..., None], 1e-2),
        mask=vis_w,
    )
    loss += mapped_depth_loss * lcfg.w_depth_const

    # Motion-basis smoothness (trainer.py:691-696).
    small_accel = L.compute_se3_smoothness_loss(
        scene.bases.rots, scene.bases.transls
    )
    loss += small_accel * lcfg.w_smooth_bases

    # Track smoothness + z-accel over (t-1, t, t+1) (trainer.py:698-728).
    tc = jnp.clip(t, 1, num_window_frames - 2)
    ts_nb = jnp.stack([tc - 1, tc, tc + 1])
    coefs = scene.fg.get_coefs()
    transfms_nb = compute_transforms(scene.bases, ts_nb, coefs)  # (G, 3, 3, 4)
    means_h = jnp.concatenate(
        [scene.fg.means, jnp.ones_like(scene.fg.means[:, :1])], -1
    )
    means_nb = jnp.einsum("gnij,gj->gni", transfms_nb, means_h)  # (G, 3, 3)
    means_nb_b = means_nb[:, :, None, :]  # (G, 3, B=1, 3)
    accel = 2 * means_nb[:, 1:2] - means_nb[:, 0:1] - means_nb[:, 2:3]
    from deblur4dgs_tpu.ops.lie import _safe_norm
    track_smooth = 0.5 * jnp.mean(_safe_norm(accel))
    loss += track_smooth * lcfg.w_smooth_tracks

    loss += lcfg.w_scale_var * L.scale_variance_loss(
        scene.fg.scales, scene.fg.get_alive()
    )

    z_accel = L.compute_z_acc_loss(means_nb_b, batch.w2cs)
    loss += lcfg.w_z_accel * z_accel

    # Exposure-time hinge (trainer.py:730-734).
    dt = out["delta_t"]
    exp_reg = jnp.maximum(0.0, lcfg.exposure_min - dt) + jnp.maximum(
        0.0, dt - lcfg.exposure_max
    )
    loss += exp_reg * lcfg.w_exposure_reg

    # Multi-resolution consistency (trainer.py:736-760).
    masks_down = downsample_area(masks[..., None], 4)
    sharp_down = downsample_area(out["pred_sharp_img"], 4) * masks_down
    if batch4_imgs is None:
        blur_down = downsample_area(img_gt, 4) * masks_down
        loss += lcfg.w_multires * jnp.mean(
            jnp.abs(sharp_down - jax.lax.stop_gradient(blur_down))
        )
    else:
        guide = batch4_imgs[0] * masks_down
        keep = jnp.mean(jnp.abs(sharp_down - jax.lax.stop_gradient(guide)))
        loss += lcfg.w_multires * jnp.where(
            epoch > lcfg.exposure_cons_start_epoch, 1.0, 0.0
        ) * keep

    aux = {
        "radii": out["radii"][None],  # (B=1, S, N)
        "rgb_dyn": rgb_dyn,
        "rgb_full": rgb_full,
        "mapped_depth_loss": mapped_depth_loss,
        "mask_loss": mask_loss,
        "track_2d_loss": track_2d_loss,
        "depth_loss": depth_loss,
        "smooth_bases": small_accel,
        "track_smooth": track_smooth,
        "z_accel": z_accel,
        "exp_reg": exp_reg,
        "delta_t": dt,
        "tile_overflow": out["tile_overflow"],
    }
    return loss, aux


def accumulate_density_stats(
    stats: DensityStats,
    tap_grads: jnp.ndarray,  # (B, S, N, 2) dL/d(means2d) per frame+view
    radii: jnp.ndarray,  # (B, S, N)
    img_wh: tuple[int, int],
    slot_offset: int,  # where this render's gaussians start in the stats
) -> DensityStats:
    """Per-view grad-norm/vis/radius accumulation (trainer.py:963-990).

    Grads are normalized to [-1, 1] screen space and scaled by
    (batch_size * num_views), matching the reference's scaling.
    """
    W, H = img_wh
    B, S, N = radii.shape
    scale = jnp.array([W / 2.0, H / 2.0]) * (B * S)
    g = tap_grads * scale  # (B, S, N, 2)
    norms = jnp.linalg.norm(g, axis=-1)  # (B, S, N)
    vis = radii > 0
    acc = jnp.sum(jnp.where(vis, norms, 0.0), axis=(0, 1))  # (N,)
    cnt = jnp.sum(vis, axis=(0, 1)).astype(jnp.int32)
    rmax = jnp.max(
        jnp.where(vis, radii / max(W, H), 0.0), axis=(0, 1)
    )

    sl = slice(slot_offset, slot_offset + N)
    return DensityStats(
        grad_norm_acc=stats.grad_norm_acc.at[sl].add(acc),
        vis_count=stats.vis_count.at[sl].add(cnt),
        max_radii=stats.max_radii.at[sl].max(rmax),
    )


def make_train_step(
    optimizer: optax.GradientTransformation,
    lcfg: LossesConfig,
    rcfg: RenderConfig,
    stage: str,
    num_window_frames: int,
    *,
    has_static: bool,
    has_dynamic: bool,
    has_reg: bool,
    has_batch4: bool = False,
    flow_fn=None,
    subframe_sharding=None,
    tile_mesh=None,
):
    """Build the jitted train step for one (stage, branch-combination).

    The reference's density stats effectively come from the LAST branch
    executed (each branch overwrites _batched_xys; _prepare_control_step
    reads the survivor — trainer.py:313,495,828 + 953). We mirror that:
    reg > dynamic > static.
    """

    def step_fn(
        state: TrainState,
        epoch: jnp.ndarray,
        batch_static: FrameBatch | None,
        batch_dyn: FrameBatch | None,
        tracks: TrackBatch | None,
        batch_reg: FrameBatch | None,
        batch4_imgs: jnp.ndarray | None,
    ):
        scene = state.scene
        S = rcfg.num_exposure
        n_fg, n_bg = scene.num_fg, scene.num_bg
        n_all = n_fg + n_bg

        taps = {}
        if has_static:
            B = batch_static.imgs.shape[0]
            taps["static"] = jnp.zeros((B, S, n_bg, 2))
        if has_dynamic:
            taps["dynamic"] = jnp.zeros((1, S, n_all, 2))
        if has_reg:
            B = batch_reg.imgs.shape[0]
            taps["reg"] = jnp.zeros((B, 1, n_bg, 2))

        def loss_fn(scene, taps):
            total = 0.0
            aux = {}
            if has_static:
                l, a = compute_static_losses(
                    scene, batch_static, taps["static"], lcfg, rcfg, stage,
                    subframe_sharding=subframe_sharding,
                    tile_mesh=tile_mesh,
                )
                total = total + l
                aux["static"] = a
            if has_dynamic:
                l, a = compute_dynamic_losses(
                    scene, batch_dyn, tracks, taps["dynamic"], lcfg, rcfg,
                    stage, epoch, num_window_frames,
                    batch4_imgs=batch4_imgs if has_batch4 else None,
                    flow_fn=flow_fn,
                    subframe_sharding=subframe_sharding,
                    tile_mesh=tile_mesh,
                )
                total = total + l
                aux["dynamic"] = a
            if has_reg:
                l, a = compute_static_reg_losses(
                    scene, batch_reg, taps["reg"], lcfg, rcfg, stage,
                    subframe_sharding=subframe_sharding,
                    tile_mesh=tile_mesh,
                )
                total = total + l
                aux["reg"] = a
            return total, aux

        (loss, aux), (gscene, gtaps) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(scene, taps)

        # MoveModel pose nets train only after epoch 20 (trainer.py:241-250).
        gate = (epoch > lcfg.exposure_cons_start_epoch).astype(jnp.float32)
        gscene = gate_move_pose_grads(gscene, gate)

        updates, opt_state = optimizer.update(gscene, state.opt_state, scene)
        scene = optax.apply_updates(scene, updates)

        # Density stats from the last-executed branch (see docstring).
        stats = state.stats
        W, H = (
            (batch_reg or batch_dyn or batch_static).imgs.shape[2],
            (batch_reg or batch_dyn or batch_static).imgs.shape[1],
        )
        if has_reg:
            stats = accumulate_density_stats(
                stats, gtaps["reg"], aux["reg"]["radii"], (W, H), n_fg
            )
        elif has_dynamic:
            stats = accumulate_density_stats(
                stats, gtaps["dynamic"], aux["dynamic"]["radii"], (W, H), 0
            )
        elif has_static:
            stats = accumulate_density_stats(
                stats, gtaps["static"], aux["static"]["radii"], (W, H), n_fg
            )

        new_state = TrainState(
            scene=scene,
            opt_state=opt_state,
            step=state.step + 1,
            stats=stats,
        )
        return new_state, loss, aux

    return jax.jit(step_fn, donate_argnums=(0,))


def compute_static_reg_losses(
    scene: SceneModel,
    batch: FrameBatch,  # stage-1 deblurred bg renders as imgs
    taps: jnp.ndarray,
    lcfg: LossesConfig,
    rcfg: RenderConfig,
    stage: str,
    subframe_sharding=None,
    tile_mesh=None,
):
    """Static-reg branch (trainer.py:795-920): bg-only MID render vs the
    stage-1 deblurred outputs, stabilizing bg during stage 2."""
    B, H, W = batch.imgs.shape[:3]
    img_wh = (W, H)

    def one_frame(carry, xs):
        t, w2c, Kmat, tap = xs
        out = render(
            scene, t, w2c, Kmat, img_wh,
            mode="mid", stage=stage, bg_only=True,
            return_mask=True, return_depth=False, bg_color=1.0,
            num_exposure=rcfg.num_exposure, cap=rcfg.tile_cap,
            use_pallas=rcfg.use_pallas, means2d_tap=tap,
            bucketed=rcfg.bucketed,
            camera_mode=rcfg.camera_mode,
            max_tiles_per_gauss=rcfg.max_tiles_per_gauss,
            subframe_sharding=subframe_sharding,
            tile_mesh=tile_mesh,
        )
        return carry, {"img": out["img"], "radii": out["radii"]}

    _, outs = jax.lax.scan(
        one_frame, 0,
        (batch.ts.astype(jnp.float32), batch.w2cs, batch.Ks, taps),
    )

    masks = batch.masks * batch.valid_masks
    bg_colors = jnp.ones((B, 1, 1, 3))
    imgs = batch.imgs * batch.valid_masks[..., None] + (
        1.0 - batch.valid_masks[..., None]
    ) * bg_colors
    rendered = outs["img"] * batch.valid_masks[..., None] + (
        1.0 - batch.valid_masks[..., None]
    ) * bg_colors
    inv = 1.0 - jax.vmap(dilate_mask)(masks)[..., None]
    loss = rgb_l1_ssim(rendered, imgs, inv) * lcfg.w_rgb
    loss += lcfg.w_scale_var * L.scale_variance_loss(
        scene.bg.scales, scene.bg.get_alive()
    )
    return loss, {"radii": outs["radii"]}
