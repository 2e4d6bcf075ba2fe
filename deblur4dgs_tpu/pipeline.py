"""Staged training pipeline: the single-process train_low/train_high driver.

Counterpart of /root/reference/train_low.py (+ run_training_static.py,
run_training_dynamic.py, run_testing.py, run_compute_metrics.py). The
reference shells out 4 separate processes communicating through checkpoints
on disk (train_low.py:18-25); here the stages are plain function calls over
in-memory pytrees (checkpoints still written for resume/inspection):

  stage 1  train_static_stage:   bg + camera-motion predictor, blurry mode
  stage 2  train_dynamic_stage:  fg dynamics + exposure times
           phase A: full window; phase B: adaptive_slides sub-windows
  stage 3  run_testing:          per-frame test-time pose refinement
  stage 4  compute metrics:      PSNR/SSIM(/LPIPS) on held-out frames
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.eval.validator import Validator, make_pose_opt_fn
from deblur4dgs_tpu.models.gaussians import pad_to_capacity
from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from deblur4dgs_tpu.train import init as I
from deblur4dgs_tpu.train.checkpoints import (
    lift_static_stage,
    load_checkpoint,
    save_checkpoint,
)
from deblur4dgs_tpu.train.loop import (
    TrainLoop,
    stack_frame_batch,
    track_batch_from_item,
)
from deblur4dgs_tpu.train.optimizers import make_optimizer
from deblur4dgs_tpu.train.trainer import init_train_state


# ---------------------------------------------------------------------------
# Adaptive windowing (run_training_dynamic.py:58-105)
# ---------------------------------------------------------------------------


def compute_sharpness_scores(imgs: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """Masked Laplacian-variance sharpness per frame.

    imgs: (T, H, W, 3) in [0, 1]; masks: (T, H, W)."""
    import scipy.ndimage as ndi

    lap_kernel = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float64)
    scores = []
    for img, mask in zip(imgs, masks):
        gray = np.mean(img * 255.0, -1) * mask
        lp = ndi.convolve(gray, lap_kernel, mode="nearest")
        inter = lp - lp.sum() / max(mask.sum(), 1e-6)
        scores.append(float((inter * inter).sum() / max(mask.sum(), 1e-6)))
    return np.array(scores)


def adaptive_slides(scores: np.ndarray, num_windows: int = 5, base: int = 5):
    """Extend fixed windows toward their sharpest neighbors
    (run_training_dynamic.py:58-105 logic, generalized to T frames)."""
    T = len(scores)
    slides: dict[str, list[int]] = {}
    trys: dict[str, list[int]] = {}
    for w in range(num_windows):
        lo = w * base
        hi = min(lo + base, T)
        if w == num_windows - 1:
            lo = max(T - base, 0)
            hi = T
        slides[str(w)] = list(range(lo, hi))
        left_try = 0 if w == 0 else min(2, lo)
        right_try = 0 if w == num_windows - 1 else min(2, T - hi)
        if w == 0:
            right_try = min(4, T - hi)
        if w == num_windows - 1:
            left_try = min(4, lo)
        trys[str(w)] = [left_try, right_try]

    for wid, win in slides.items():
        lt, rt = trys[wid]
        if lt > 0:
            left_scores = scores[win[0] - lt : win[0] + 1]
            extend_to = win[0] - (lt - int(np.argmax(left_scores))) - 1
            for j in range(win[0] - 1, extend_to, -1):
                win.insert(0, j)
        if rt > 0:
            right_scores = scores[win[-1] : win[-1] + rt + 1]
            extend_to = int(np.argmax(right_scores)) + win[-1]
            last = win[-1]
            for j in range(last + 1, extend_to + 1):
                win.append(j)

    score_dict = {
        wid: scores[win[0] : win[-1] + 1] for wid, win in slides.items()
    }
    return slides, score_dict


# ---------------------------------------------------------------------------
# Initialization (run_training_static.py:202-287 analog)
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    work_dir: str
    num_fg: int = 40_000
    num_bg: int = 100_000
    num_motion_bases: int = 10
    fg_capacity_mult: float = 2.0
    bg_capacity_mult: float = 1.5
    static_epochs: int = 400
    dynamic_epochs: int = 101
    steps_per_epoch: int = 24
    initial_optim_iters: int = 1000
    validate_every: int = 100  # epochs between mid-training validations
    save_videos_every: int = 50  # epochs between train-video dumps (0 = off)
    pose_opt_iters: int = 500
    # Optional PWC-Net weights for the exposure-consistency AlignedLoss
    # (trainer.py:599-618): a path to the reference's
    # pwcnet-network-default.pth, or 'random' (untrained net — tests only).
    # None disables the loss, matching runs without the flow checkpoint.
    flow_weights: str | None = None
    # Optional LPIPS(alex) weights for the metrics stage
    # (run_compute_metrics.py:26): 'backbone.pth,lins.pth' torch
    # checkpoints, or 'random' (tests only). None = PSNR/SSIM only.
    lpips_weights: str | None = None
    resume: bool = True  # restore stages from their checkpoints if present
    checkpoint_every: int = 200  # steps between in-stage checkpoints
    lr: SceneLRConfig = field(default_factory=SceneLRConfig)
    losses: LossesConfig = field(default_factory=LossesConfig)
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    # Phase-A (4x-downsampled) tile capacity. At 4x downsampling there are
    # 16x fewer 16x16 tiles over the SAME scene content, so a cap tuned
    # for full resolution truncates heavily (measured: stage-end
    # tile_overflow 0.42 on the r4 quality run's dynamicA vs <0.19 at x1
    # — the reference's gsplat lists are unbounded and never truncate,
    # run_training_dynamic.py:135-319 trains phase A losslessly). None =
    # auto: min(4 * tile_cap, 4096); kernel tile-blocking degrades to one
    # tile per block at large caps (ops/rasterize.py::_window_tb) so big
    # caps are VMEM-safe. Measured at the clamp (base cap 2048 -> x4 cap
    # 4096, r5 ref-scale run): stage-end dynamicA overflow 0.0002 — the
    # clamp leaves no material residual truncation and stays.
    tile_cap_x4: int | None = None
    seed: int = 0

    def render_x4(self) -> RenderConfig:
        import dataclasses as _dc

        cap = self.tile_cap_x4
        if cap is None:
            cap = min(4 * self.render.tile_cap, 4096)
        return _dc.replace(self.render, tile_cap=cap)


def _round_capacity(n: int) -> int:
    return max(int(-(-n // 256)) * 256, 256)


def dump_run_artifacts(cfg: PipelineConfig):
    """Write the resolved config + a code snapshot into work_dir.

    Parity with the reference's per-run reproducibility artifacts: the
    YAML config dump (run_training_static.py:96-98) and the source
    self-backup (backup_code, run_training_static.py:281-287)."""
    import dataclasses
    import shutil

    os.makedirs(cfg.work_dir, exist_ok=True)
    try:
        import yaml

        with open(os.path.join(cfg.work_dir, "cfg.yaml"), "w") as f:
            yaml.safe_dump(dataclasses.asdict(cfg), f)
    except ImportError:
        import json

        with open(os.path.join(cfg.work_dir, "cfg.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    backup = os.path.join(cfg.work_dir, "code_backup", "deblur4dgs_tpu")
    # Skip only when the backup destination would land inside the package
    # itself (recursive copy); a work_dir elsewhere in the repo is fine.
    if os.path.commonpath(
        [os.path.abspath(backup), pkg_dir]
    ) == pkg_dir:
        print(f"code backup skipped: {backup} is inside the package")
        return
    shutil.rmtree(os.path.join(cfg.work_dir, "code_backup"), ignore_errors=True)
    shutil.copytree(
        pkg_dir, backup,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
    )


def initialize_scene(
    dataset, cfg: PipelineConfig, cano_t: int | None = None,
    static_scene: SceneModel | None = None, num_fg: int | None = None,
) -> tuple[SceneModel, float]:
    """Bootstrap fg/bg/bases from tracks + depth points
    (run_training_static.py:202-287 / run_training_dynamic.py:568-683)."""
    num_fg = num_fg or cfg.num_fg
    tracks = dataset.get_tracks_3d(num_samples=num_fg)
    if cano_t is None:
        cano_t = int(np.argmax(np.asarray(tracks.visibles).sum(0)))

    bases, motion_coefs, tracks = I.init_motion_params_with_procrustes(
        tracks, cfg.num_motion_bases, cano_t, seed=cfg.seed
    )
    fg = I.init_fg_from_tracks_3d(cano_t, tracks, motion_coefs, seed=cfg.seed)
    fg, bases, _ = I.run_initial_optim(
        fg, bases, tracks,
        jnp.asarray(np.asarray(dataset.Ks[dataset.start : dataset.end])),
        jnp.asarray(np.asarray(dataset.w2cs[dataset.start : dataset.end])),
        num_iters=cfg.initial_optim_iters,
    )

    if static_scene is not None:
        bg, bg_scale = static_scene.bg, 1.0
    else:
        pts = dataset.get_bkgd_points(cfg.num_bg)
        bg, bg_scale = I.init_bg(pts)

    fg = pad_to_capacity(
        fg._replace(alive=jnp.ones((fg.capacity,), jnp.float32)),
        _round_capacity(int(fg.capacity * cfg.fg_capacity_mult)),
    )
    if static_scene is None:
        bg = pad_to_capacity(
            bg._replace(alive=jnp.ones((bg.capacity,), jnp.float32)),
            _round_capacity(int(bg.capacity * cfg.bg_capacity_mult)),
        )

    move = (
        static_scene.move
        if static_scene is not None
        else init_move_model(
            jax.random.PRNGKey(cfg.seed),
            num_frames=len(dataset.get_dyn_time_ids()),
        )
    )
    scene = SceneModel(fg=fg, bg=bg, bases=bases, move=move)
    if static_scene is not None:
        scene = lift_static_stage(scene, static_scene)
    return scene, bg_scale


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


def _preload_batches(dataset, indices=None):
    """Load items and pin their arrays to the device ONCE.

    The training loops re-batch these every step; keeping them
    device-resident makes stack_frame_batch/track_batch_from_item pure
    device-side ops. Re-transferring per step instead leaks the host
    staging buffer through the remote-TPU tunnel (see loop._stack) — the
    cause of a 121 GB host OOM on the first reference-scale quality run."""
    items = [
        dataset.get_item(i)
        for i in (indices if indices is not None else range(len(dataset)))
    ]
    return [
        {
            k: jnp.asarray(v) if hasattr(v, "shape") else v
            for k, v in item.items()
        }
        for item in items
    ]


def _ckpt_exists(path: str) -> bool:
    """Orbax StandardCheckpointer saves a directory; a bare path check
    suffices (saves are atomic — tmp dir renamed on completion)."""
    return osp.isdir(path)


def make_flow_fn(cfg: PipelineConfig):
    """Exposure-consistency AlignedLoss flow net (loss_utils.py:161-189).

    Returns None when no weights are configured (the loss is then skipped,
    trainer.py flow_fn=None path)."""
    if cfg.flow_weights is None:
        return None
    from deblur4dgs_tpu.models import pwcnet as P

    if cfg.flow_weights == "random":
        params = P.init_pwcnet(jax.random.PRNGKey(cfg.seed))
    else:
        params = P.load_torch_weights(cfg.flow_weights)
    return P.make_aligned_loss_fn(params)


def make_lpips_fn(cfg: PipelineConfig):
    """LPIPS(alex) scorer for the metrics stage (run_compute_metrics.py:26,
    76-77). Accepts (H, W, 3) or (B, H, W, 3) pairs in [0, 1]."""
    if cfg.lpips_weights is None:
        return None
    from deblur4dgs_tpu.eval import lpips as LP

    if cfg.lpips_weights == "random":
        params = LP.init_lpips(jax.random.PRNGKey(cfg.seed))
    else:
        import torch

        backbone_path, lins_path = cfg.lpips_weights.split(",")
        params = LP.load_lpips_torch(
            torch.load(backbone_path, map_location="cpu"),
            torch.load(lins_path, map_location="cpu"),
        )

    @jax.jit
    def score(a, b):
        return jnp.mean(LP.lpips(params, a, b))

    def fn(a, b):
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        if a.ndim == 3:
            a, b = a[None], b[None]
        return score(a, b)

    return fn


def _maybe_resume(loop: TrainLoop, stage_dir: str, cfg: PipelineConfig) -> int:
    """Restore the loop from stage_dir/checkpoints/last if present.

    Returns the global step to resume from (0 = fresh). Counterpart of the
    reference's Trainer.init_from_checkpoint restoring optimizers +
    schedulers + step (trainer.py:142-178)."""
    last = osp.join(stage_dir, "checkpoints", "last")
    if not (cfg.resume and _ckpt_exists(last)):
        return 0
    loop.state, epoch = load_checkpoint(last, loop.state)
    step = int(loop.state.step)
    loop.global_step = step
    loop.epoch = epoch
    print(f"resumed {stage_dir} from step {step} (epoch {epoch})")
    return step


def run_validation(
    scene: SceneModel, val_view, cfg: PipelineConfig, epoch: int,
    writer=None, work_dir: str | None = None, tag: str = "val",
    train_view=None, bg_only: bool = False, validator: Validator | None = None,
):
    """Mid-training validation (run_training_static.py:189-197 /
    run_training_dynamic.py:307-315 + validator.py:83-124): sharp
    mid-exposure renders of every val frame written to
    results/rgb_deblur_mid/{epoch:05d}/, PSNR/SSIM to tensorboard; train
    videos at their own cadence (validator.py:216-398).

    Pass the returned validator back in on the next call of the same stage
    — its jitted sharp render is reused, only the metric accumulators are
    reset (a fresh Validator per validation recompiles every epoch).
    bg_only: static-stage semantics — skip the untrained fg gaussians.
    Returns (metrics, validator)."""
    if validator is None:
        validator = Validator(
            scene, save_dir=work_dir, has_bg=scene.bg is not None
        )
    else:
        validator.scene = scene
        validator.reset_metrics()
    W, H = val_view.get_img_wh()
    for i in range(len(val_view)):
        item = val_view.get_item(i)
        t = int(item["ts"]) - getattr(val_view, "start", 0) // 2
        validator.validate_frame(
            t,
            jnp.asarray(np.asarray(item["w2cs"])),
            jnp.asarray(np.asarray(item["Ks"])),
            jnp.asarray(np.asarray(item["imgs"])),
            jnp.asarray(np.asarray(item["masks"])),
            jnp.asarray(np.asarray(item["valid_masks"])),
            (W, H),
            frame_name=str(item["frame_names"]),
            num_exposure=cfg.render.num_exposure, cap=cfg.render.tile_cap,
            use_pallas=cfg.render.use_pallas,
            subdir=osp.join("rgb_deblur_mid", f"{epoch:05d}"),
            bg_only=bg_only,
        )
    metrics = validator.compute()
    if writer is not None:
        for k, v in metrics.items():
            writer.add_scalar(f"{tag}/{k}", float(v), epoch)
    if (
        train_view is not None
        and cfg.save_videos_every
        and epoch % cfg.save_videos_every == 0
    ):
        validator.save_train_videos(
            train_view, epoch, num_exposure=cfg.render.num_exposure,
            cap=cfg.render.tile_cap, use_pallas=cfg.render.use_pallas,
        )
    return metrics, validator


def train_static_stage(
    dataset, scene: SceneModel, cfg: PipelineConfig, bg_scale: float,
    writer=None, val_view=None, viewer=None,
) -> SceneModel:
    """Stage 1 (run_training_static.py:140-199): bg + camera predictor."""
    # own the buffers: the jitted step donates its state, and stage-handoff
    # scenes share arrays (bg/move lifted from stage 1) — donating shared
    # buffers would delete them under the other stages
    scene = jax.tree.map(jnp.copy, scene)
    state = init_train_state(scene, cfg.lr, cfg.optim)
    final = osp.join(cfg.work_dir, "ckpts", "static", "last")
    if cfg.resume and _ckpt_exists(final):
        state, _ = load_checkpoint(final, state)
        print(f"static stage: restored finished checkpoint {final}")
        return state.scene
    opt = make_optimizer(scene, cfg.lr, cfg.optim)
    T = len(dataset.get_dyn_time_ids())
    stage_dir = osp.join(cfg.work_dir, "static")
    loop = TrainLoop(
        state, opt, cfg.losses, cfg.render, cfg.optim, T,
        stage_dir, "first",
        has_static=True, has_dynamic=False, has_reg=False,
        bg_scene_scale=bg_scale, writer=writer, seed=cfg.seed,
        checkpoint_every=cfg.checkpoint_every, viewer=viewer,
    )
    start_step = _maybe_resume(loop, stage_dir, cfg)
    items = _preload_batches(dataset)
    rng = np.random.default_rng(cfg.seed)
    for _ in range(start_step):  # replay the sampling stream up to resume
        rng.integers(1, len(items) - 1)
    total = cfg.static_epochs * cfg.steps_per_epoch
    validator = None
    for gstep in range(start_step, total):
        loop.epoch = epoch = gstep // cfg.steps_per_epoch
        idx = int(rng.integers(1, len(items) - 1))
        batch = stack_frame_batch([items[idx - 1], items[idx], items[idx + 1]])
        loop.train_step(batch, None, None, None)
        end_of_epoch = (gstep + 1) % cfg.steps_per_epoch == 0
        last_epoch = epoch == cfg.static_epochs - 1
        # epoch > 0 guard + bg-only render: the reference's static run
        # skips the epoch-0 validation and validates a model with no fg
        # (run_training_static.py:188-191).
        if (
            val_view is not None and end_of_epoch
            and ((epoch > 0 and epoch % cfg.validate_every == 0) or last_epoch)
        ):
            _, validator = run_validation(
                loop.state.scene, val_view, cfg, epoch, writer=writer,
                work_dir=cfg.work_dir, tag="val_static",
                train_view=dataset, bg_only=True, validator=validator,
            )
    loop.finish()
    os.makedirs(osp.join(cfg.work_dir, "ckpts", "static"), exist_ok=True)
    save_checkpoint(final, loop.state, cfg.static_epochs)
    return loop.state.scene


def train_dynamic_stage(
    dataset, scene: SceneModel, cfg: PipelineConfig, bg_scale: float,
    batch4_provider=None, reg_imgs=None, writer=None,
    epochs: int | None = None, tag: str = "dynamic", val_view=None,
    flow_fn=None, viewer=None,
) -> SceneModel:
    """Stage 2 (run_training_dynamic.py:130-319): fg dynamics + exposure.

    reg_imgs: stage-1 deblurred bg renders, indexed by the values of
    dataset.get_dyn_image_ids() — the static-reg branch targets (batch3,
    run_training_dynamic.py:238-285,448-486):
    every step renders the CURRENT bg in sharp mid mode at batch1's frame
    and pulls it toward the stage-1 output, preventing bg drift while the
    fg trains. batch4_provider(i) -> phase-A multires guidance for frame i
    (run_training_dynamic.py:488-529)."""
    scene = jax.tree.map(jnp.copy, scene)  # see train_static_stage
    state = init_train_state(scene, cfg.lr, cfg.optim)
    final = osp.join(cfg.work_dir, "ckpts", tag, "last")
    if cfg.resume and _ckpt_exists(final):
        state, _ = load_checkpoint(final, state)
        print(f"{tag} stage: restored finished checkpoint {final}")
        return state.scene
    opt = make_optimizer(scene, cfg.lr, cfg.optim)
    T = len(dataset.get_dyn_time_ids())
    has_reg = reg_imgs is not None
    stage_dir = osp.join(cfg.work_dir, tag)
    loop = TrainLoop(
        state, opt, cfg.losses, cfg.render, cfg.optim, T,
        stage_dir, "second",
        has_static=True, has_dynamic=True, has_reg=has_reg,
        has_batch4=batch4_provider is not None,
        flow_fn=flow_fn,
        bg_scene_scale=bg_scale, writer=writer, seed=cfg.seed,
        checkpoint_every=cfg.checkpoint_every, viewer=viewer,
    )
    start_step = _maybe_resume(loop, stage_dir, cfg)
    ids = dataset.get_dyn_image_ids()
    items = _preload_batches(dataset, ids)
    if has_reg:  # device-resident: per-step indexing must not re-transfer
        reg_imgs = jnp.asarray(np.asarray(reg_imgs))
    rng = np.random.default_rng(cfg.seed + 1)
    for _ in range(start_step):
        rng.integers(0, len(items), size=2)
    num_epochs = epochs or cfg.dynamic_epochs
    total = num_epochs * cfg.steps_per_epoch
    validator = None
    for gstep in range(start_step, total):
        loop.epoch = epoch = gstep // cfg.steps_per_epoch
        i1, i2 = (int(v) for v in rng.integers(0, len(items), size=2))
        batch1 = stack_frame_batch([items[i1]])
        batch2 = stack_frame_batch([items[i2]])
        tracks = track_batch_from_item(items[i2], start=dataset.start)
        breg = None
        if has_reg:
            # batch3 = batch1's frame with imgs swapped for the stage-1
            # deblurred render (run_training_dynamic.py:286-302 batch3 uses
            # index1). reg_imgs is indexed by the values of
            # get_dyn_image_ids() — items[i1] is frame ids[i1], NOT i1
            # (with cfg.start > 0 they differ and position-indexing would
            # silently supervise the wrong frame).
            breg = batch1._replace(imgs=reg_imgs[ids[i1]][None])
        b4 = batch4_provider(i2) if batch4_provider is not None else None
        loop.train_step(batch1, batch2, tracks, breg, b4)
        end_of_epoch = (gstep + 1) % cfg.steps_per_epoch == 0
        last_epoch = epoch == num_epochs - 1
        if (
            val_view is not None and end_of_epoch
            and (epoch % cfg.validate_every == 0 or last_epoch)
        ):
            _, validator = run_validation(
                loop.state.scene, val_view, cfg, epoch, writer=writer,
                work_dir=cfg.work_dir, tag=f"val_{tag}",
                train_view=dataset, validator=validator,
            )
    loop.finish()
    os.makedirs(osp.join(cfg.work_dir, "ckpts", tag), exist_ok=True)
    save_checkpoint(final, loop.state, num_epochs)
    return loop.state.scene


def run_testing(
    val_dataset, scene: SceneModel, cfg: PipelineConfig, lpips_fn=None,
) -> dict:
    """Single-scene testing (validator.py:400-499): test-time pose
    refinement on every val frame + metrics. The full pipeline uses
    run_testing_windows; this evaluates one scene over the whole val set
    (useful for phase-A checks and single-window runs)."""
    W, H = val_dataset.get_img_wh()
    pose_opt = make_pose_opt_fn(
        (W, H), num_iters=cfg.pose_opt_iters,
        num_exposure=cfg.render.num_exposure, cap=cfg.render.tile_cap,
        use_pallas=cfg.render.use_pallas,
    )
    validator = Validator(
        scene, save_dir=cfg.work_dir, has_bg=scene.bg is not None,
        lpips_fn=lpips_fn,
    )
    for i in range(len(val_dataset)):
        item = val_dataset.get_item(i)
        t = int(item["ts"]) - val_dataset.start // 2
        validator.validate_frame_with_pose_opt(
            pose_opt,
            t,
            jnp.asarray(np.asarray(item["w2cs"])),
            jnp.asarray(np.asarray(item["Ks"])),
            jnp.asarray(np.asarray(item["imgs"])),
            jnp.asarray(np.asarray(item["masks"])),
            jnp.asarray(np.asarray(item["valid_masks"])),
            frame_name=str(item["frame_names"]),
        )
    return validator.compute()


def val_partition(
    num_val: int, n_win: int, train_num_frames: int, base: int = 5
) -> list[tuple[int, int]]:
    """Contiguous per-window val-frame slices [lo, hi).

    Generalizes run_compute_metrics.py:36-52's hardcoded table: window w
    owns base * (val/train frame-rate ratio) val frames, the last window
    the tail (48 val frames / 5 windows -> 10,10,10,10,8)."""
    ratio = max(num_val // max(train_num_frames, 1), 1)
    share = base * ratio
    out = []
    for w in range(n_win):
        lo = min(w * share, num_val)
        hi = num_val if w == n_win - 1 else min((w + 1) * share, num_val)
        out.append((lo, hi))
    return out


def run_testing_windows(
    val_dataset, window_scenes: dict, cfg: PipelineConfig,
    train_num_frames: int, base: int = 5, lpips_fn=None,
) -> dict:
    """Stage 3+4 (run_testing.py:141-204 + run_compute_metrics.py:36-61):
    evaluate EACH phase-B window's model with test-time pose refinement on
    its own slice of the val set, aggregating held-out (odd-indexed) frame
    metrics across windows.

    The val set is partitioned into contiguous per-window slices of
    base * (val/train frame-rate ratio) frames, the last window taking the
    tail — exactly the reference's fixed file partition
    (run_compute_metrics.py:36-52: windows of 10 val frames for base=5,
    train = even frames). Every slice frame is rendered + saved (parity
    with the reference's artifacts); only globally odd-indexed val frames
    enter the metrics (results[1::2], run_compute_metrics.py:60-61).

    window_scenes: {wid: (scene, window_frame_indices)} from train_low.
    """
    W, H = val_dataset.get_img_wh()
    V = len(val_dataset)
    n_win = len(window_scenes)
    slices = val_partition(V, n_win, train_num_frames, base)
    pose_opt = make_pose_opt_fn(
        (W, H), num_iters=cfg.pose_opt_iters,
        num_exposure=cfg.render.num_exposure, cap=cfg.render.tile_cap,
        use_pallas=cfg.render.use_pallas,
    )
    any_scene = next(iter(window_scenes.values()))[0]
    validator = Validator(
        any_scene, save_dir=cfg.work_dir, has_bg=any_scene.bg is not None,
        lpips_fn=lpips_fn,
    )
    from deblur4dgs_tpu.data.views import ValSliceView

    for wid in sorted(window_scenes, key=int):
        w = int(wid)
        scene_w, window = window_scenes[wid]
        lo, hi = slices[w]
        if lo >= hi:
            continue
        view = ValSliceView(
            val_dataset, lo, hi, t_offset=window[0], window_len=len(window)
        )
        validator.scene = scene_w
        subdir = osp.join(f"win_{window[0]:02d}{window[-1] + 1:02d}",
                          "rgb_test_optim")
        for i in range(len(view)):
            item = view.get_item(i)
            validator.validate_frame_with_pose_opt(
                pose_opt,
                int(item["ts"]),
                jnp.asarray(np.asarray(item["w2cs"])),
                jnp.asarray(np.asarray(item["Ks"])),
                jnp.asarray(np.asarray(item["imgs"])),
                jnp.asarray(np.asarray(item["masks"])),
                jnp.asarray(np.asarray(item["valid_masks"])),
                frame_name=str(item["frame_names"]),
                subdir=subdir,
                with_metrics=(lo + i) % 2 == 1,  # held-out odd frames only
            )
    return validator.compute()


def compute_scene_metrics(
    result_dir: str, gt_dir: str | None = None, lpips_fn=None
) -> dict:
    """Stage 4 (run_compute_metrics.py:22-86): pair rendered/gt frames,
    keep odd-indexed (held-out mid-exposure) frames, average metrics.

    result_dir may be either a flat directory of {name}.png renders or a
    work_dir results/ root containing per-window win_*/rgb_test_optim
    subdirectories (the reference walks the per-window clip dirs in window
    order, run_compute_metrics.py:36-52). gt frames come from gt_dir when
    given, else from the colocated {name}_gt.png files the testing stage
    writes."""
    import imageio.v3 as iio

    from deblur4dgs_tpu.eval import metrics as M

    win_dirs = sorted(
        d for d in os.listdir(result_dir)
        if d.startswith("win_")
        and osp.isdir(osp.join(result_dir, d, "rgb_test_optim"))
    )
    if win_dirs:
        dirs = [osp.join(result_dir, d, "rgb_test_optim") for d in win_dirs]
    else:
        dirs = [result_dir]
    files = []
    for d in dirs:
        files += sorted(
            (d, f[:-4]) for f in os.listdir(d)
            if f.endswith(".png") and not f.endswith("_gt.png")
        )

    psnrs, ssims, lpipss = [], [], []
    for i, (d, name) in enumerate(files):
        if i % 2 == 0:  # odd-indexed frames only (run_compute_metrics.py:60)
            continue
        pred = jnp.asarray(
            iio.imread(osp.join(d, f"{name}.png")).astype(np.float32)
            / 255.0
        )
        gt_path = (
            osp.join(gt_dir, f"{name}.png")
            if gt_dir is not None
            else osp.join(d, f"{name}_gt.png")
        )
        gt = jnp.asarray(iio.imread(gt_path).astype(np.float32) / 255.0)
        psnrs.append(M.compute_psnr(pred, gt))
        ssims.append(float(M.masked_ssim(pred, gt)))
        if lpips_fn is not None:
            lpipss.append(float(lpips_fn(pred[None], gt[None])))
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
    if lpipss:
        out["lpips"] = float(np.mean(lpipss))
    return out


def render_sharp_frames(scene: SceneModel, dataset, cfg: PipelineConfig,
                        bg_only=False, downsample=1):
    """Mid-exposure renders of every frame (used as phase-A multires
    guidance / stage-1 static-reg targets, run_training_dynamic.py:211-284
    — the reference round-trips these through PNGs on disk).

    One jitted render reused across frames: eager per-op dispatch through
    the remote-device tunnel costs ~100x the device time of these renders.
    """
    from deblur4dgs_tpu.train.trainer import downsample_area

    W, H = dataset.get_img_wh()

    @jax.jit
    def rfn(scene, t, w2c, K):
        out = render(
            scene, t, w2c, K, (W, H), mode="mid", stage="second",
            bg_only=bg_only, num_exposure=cfg.render.num_exposure,
            cap=cfg.render.tile_cap, use_pallas=cfg.render.use_pallas,
        )
        img = out["img"]
        if downsample > 1:
            img = downsample_area(img, downsample)
        return img

    outs = []
    for i in range(len(dataset)):
        outs.append(np.asarray(rfn(
            scene, jnp.asarray(i, jnp.float32),
            jnp.asarray(np.asarray(dataset.w2cs[i])),
            jnp.asarray(np.asarray(dataset.Ks[i])),
        )))
    return np.stack(outs)


def train_low(train_dataset, val_dataset, cfg: PipelineConfig, writer=None,
              num_phaseB_windows: int | None = None, viewer=None,
              stage_callback=None):
    """Full pipeline in one process (train_low.py:18-25 analog).

    stage_callback(tag, scene, window): optional hook fired after every
    completed stage ('static' / 'dynamicA' with window=None, then each
    phase-B 'win_LLHH' with its frame list) — long runs use it to commit
    partial artifacts and stage-end diagnostics without touching the
    training path.

    Stage 2 mirrors the reference's two-scale schedule: phase A at 4x
    downsampling over the full clip, then phase B per adaptive window at
    full resolution with phase-A sharp renders as multires guidance and
    stage-1 deblurred bg renders as static-reg targets
    (run_training_dynamic.py:135-564). Testing evaluates each window's
    model on its own val slice and aggregates held-out-frame metrics
    across windows (run_testing.py + run_compute_metrics.py).
    """
    from deblur4dgs_tpu.data.views import DownsampleView, WindowView

    os.makedirs(cfg.work_dir, exist_ok=True)
    dump_run_artifacts(cfg)
    flow_fn = make_flow_fn(cfg)

    # Stage 1: static (bg + camera-motion predictor).
    scene0, bg_scale = initialize_scene(train_dataset, cfg)
    static_scene = train_static_stage(
        train_dataset, scene0, cfg, bg_scale, writer=writer,
        val_view=val_dataset, viewer=viewer,
    )
    if stage_callback is not None:
        stage_callback("static", static_scene, None)

    # Stage-1 deblurred bg renders: the static-reg (batch3) targets for
    # BOTH stage-2 phases (run_training_dynamic.py:238-302, :448-486 load
    # these from the stage-1 run's results/rgb_deblur_mid PNGs; we render
    # in-memory — bg-only, since stage 1 only trained the bg + camera).
    ds_x4 = DownsampleView(train_dataset, 4)
    reg_full = render_sharp_frames(static_scene, train_dataset, cfg,
                                   bg_only=True)
    # Every x4-resolution render uses the resolution-scaled tile capacity
    # (see PipelineConfig.tile_cap_x4).
    import dataclasses as _dc

    cfg_x4 = _dc.replace(cfg, render=cfg.render_x4())
    reg_x4 = render_sharp_frames(static_scene, ds_x4, cfg_x4, bg_only=True)

    # Stage 2 phase A: 4x-downsampled, full clip.
    sceneA, _ = initialize_scene(ds_x4, cfg_x4, static_scene=static_scene)
    sceneA = train_dynamic_stage(
        ds_x4, sceneA, cfg_x4, bg_scale, reg_imgs=reg_x4, writer=writer,
        tag="dynamicA", val_view=val_dataset, flow_fn=flow_fn,
        viewer=viewer,
    )
    if stage_callback is not None:
        stage_callback("dynamicA", sceneA, None)

    # Phase-A sharp outputs at 1/4 res as multires guidance for phase B
    # (device-resident: batch4_provider slices it every step).
    guide_imgs = jnp.asarray(render_sharp_frames(sceneA, ds_x4, cfg_x4))

    # Stage 2 phase B: adaptive sub-windows at full resolution. Windows are
    # independent training jobs (the reference runs them sequentially; they
    # are the temporal-parallel axis of SURVEY.md §5).
    scores = compute_sharpness_scores(
        np.asarray(train_dataset.imgs), np.asarray(train_dataset.masks)
    )
    n_win = num_phaseB_windows
    if n_win is None:
        # ceil(T/5): the reference always covers every frame with a base
        # window (5 windows for T=24, run_training_dynamic.py:78)
        n_win = max(-(-len(scores) // 5), 1)
    slides, score_dict = adaptive_slides(scores, num_windows=n_win)

    from deblur4dgs_tpu.data.views import ValSliceView  # noqa: F401

    V = len(val_dataset)
    ratio = max(V // max(len(train_dataset), 1), 1)
    window_scenes = {}
    for wid, window in slides.items():
        wds = WindowView(train_dataset, window, seed=cfg.seed)
        cano_t = int(np.argmax(score_dict[wid]))
        sceneW, _ = initialize_scene(
            wds, cfg, cano_t=cano_t, static_scene=static_scene
        )

        def batch4_provider(i, _w=window):
            g = jnp.asarray(guide_imgs[_w[i]])[None]
            return g

        # mid-training validation over this window's val slice
        lo_v = window[0] * ratio
        hi_v = min((window[-1] + 1) * ratio, V)
        val_view_w = ValSliceView(
            val_dataset, lo_v, hi_v, t_offset=window[0],
            window_len=len(window),
        )
        sceneW = train_dynamic_stage(
            wds, sceneW, cfg, bg_scale, batch4_provider=batch4_provider,
            reg_imgs=reg_full[window], writer=writer,
            tag=f"win_{window[0]:02d}{window[-1] + 1:02d}",
            val_view=val_view_w, flow_fn=flow_fn, viewer=viewer,
        )
        window_scenes[wid] = (sceneW, window)
        if stage_callback is not None:
            stage_callback(
                f"win_{window[0]:02d}{window[-1] + 1:02d}", sceneW, window
            )

    # Stage 3+4: per-window testing with pose refinement, held-out-frame
    # metrics aggregated across windows.
    metrics = run_testing_windows(
        val_dataset, window_scenes, cfg,
        train_num_frames=len(train_dataset), lpips_fn=make_lpips_fn(cfg),
    )
    return sceneA, window_scenes, metrics, slides
