"""Host-side training loop: batch sampling, control cadence, logging,
checkpointing around the jitted train step.

Counterpart of the epoch loops in /root/reference/run_training_static.py
(:174-199) and run_training_dynamic.py (:285-319): pick random frame
indices per step, call the jitted step, run density control at its cadence,
log to tensorboard, checkpoint periodically.
"""

from __future__ import annotations

import functools
import os
import random
import time
from collections import deque
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.train.checkpoints import save_checkpoint
from deblur4dgs_tpu.train.density import apply_density_control, control_flags
from deblur4dgs_tpu.train.trainer import (
    FrameBatch,
    TrackBatch,
    TrainState,
    make_train_step,
)


def _stack(arrs):
    """Stack WITHOUT bouncing device arrays through the host.

    Every fresh host->device transfer through the remote-TPU (axon) tunnel
    leaks its host staging buffer (~transferred bytes; measured 1.9 MB
    leaked per 1.7 MB transfer) — a 10 MB/step np.stack round trip OOM-
    killed a 12k-step reference-scale run at 121 GB host RSS. Items
    preloaded to the device (pipeline._preload_batches) therefore stay
    there: stacking device arrays runs as a device-side concat."""
    if all(isinstance(a, jax.Array) for a in arrs):
        return jnp.stack(arrs)
    return jnp.asarray(np.stack([np.asarray(a) for a in arrs]))


def _as(v, dtype=None):
    """Device no-op for resident arrays; one transfer for host values."""
    if isinstance(v, jax.Array):
        return v.astype(dtype) if dtype is not None else v
    return jnp.asarray(np.asarray(v, dtype))


def stack_frame_batch(items: Sequence[dict]) -> FrameBatch:
    """Stack per-frame dataset items (dataset.get_item) into a FrameBatch."""

    def f(key):
        return _stack([it[key] for it in items])

    return FrameBatch(
        ts=jnp.asarray([int(it["ts"]) for it in items], jnp.int32),
        w2cs=f("w2cs"),
        Ks=f("Ks"),
        imgs=f("imgs"),
        masks=f("masks"),
        valid_masks=f("valid_masks"),
        depths=f("depths"),
    )


def track_batch_from_item(item: dict, start: int = 0) -> TrackBatch:
    return TrackBatch(
        query_tracks_2d=_as(item["query_tracks_2d"]),
        target_ts=_as(item["target_ts"], jnp.int32) - start,
        target_w2cs=_as(item["target_w2cs"]),
        target_Ks=_as(item["target_Ks"]),
        target_tracks_2d=_as(item["target_tracks_2d"]),
        target_visibles=_as(item["target_visibles"], jnp.float32),
        target_confidences=_as(item["target_confidences"], jnp.float32),
        target_track_depths=_as(item["target_track_depths"], jnp.float32),
    )


class TrainLoop:
    def __init__(
        self,
        state: TrainState,
        optimizer,
        lcfg: LossesConfig,
        rcfg: RenderConfig,
        ocfg: OptimizerConfig,
        num_window_frames: int,
        work_dir: str,
        stage: str,
        *,
        has_static: bool,
        has_dynamic: bool,
        has_reg: bool,
        has_batch4: bool = False,
        flow_fn=None,
        bg_scene_scale: float = 1.0,
        checkpoint_every: int = 200,
        log_every: int = 10,
        writer=None,
        seed: int = 0,
        viewer=None,  # TrainingViewer: live rendering + pause cooperation
    ):
        self.state = state
        self.ocfg = ocfg
        self.num_window_frames = num_window_frames
        self.work_dir = work_dir
        self.bg_scene_scale = bg_scene_scale
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.writer = writer
        self.global_step = int(state.step)
        self.epoch = 0
        self.only_fg = not has_static
        self.rng = random.Random(seed)
        # Device scalars, coerced via float() lazily at log cadence; bounded
        # — an unbounded list would pin thousands of device buffers across a
        # 9,600-step stage.
        self.losses: deque = deque(maxlen=max(2 * log_every, 16))
        self._last_aux: dict | None = None
        self._rays_per_sec = 0.0
        self.viewer = viewer
        if viewer is not None:
            viewer.set_scene(state.scene, num_window_frames)

        self.step_fn = make_train_step(
            optimizer, lcfg, rcfg, stage, num_window_frames,
            has_static=has_static, has_dynamic=has_dynamic, has_reg=has_reg,
            has_batch4=has_batch4, flow_fn=flow_fn,
        )
        self._control_cache: dict = {}
        # Host-RSS watchdog (D4_RSS_LOG=N > 0: print every N steps). Added
        # after a reference-scale quality run was OOM-killed at 121 GB
        # anon-rss mid-window with no host-side suspect in the step path —
        # the curve (smooth growth vs event-correlated jumps) localizes any
        # future leak without a debugger attached.
        self._rss_every = int(os.environ.get("D4_RSS_LOG", "0"))

    def _rss_gb(self) -> float:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9

    def train_step(self, batch_static, batch_dyn, tracks, batch_reg,
                   batch4_imgs=None):
        tic = time.time()
        if self.viewer is not None:
            # cooperate with the interactive viewer (trainer.py:204-207,
            # :265-269): honor pause, serialize with in-flight renders
            while self.viewer.state.status == "paused":
                time.sleep(0.05)
            with self.viewer.lock:
                self.state, loss, aux = self.step_fn(
                    self.state, jnp.asarray(self.epoch), batch_static,
                    batch_dyn, tracks, batch_reg, batch4_imgs,
                )
                self.viewer.set_scene(self.state.scene)
        else:
            self.state, loss, aux = self.step_fn(
                self.state, jnp.asarray(self.epoch), batch_static, batch_dyn,
                tracks, batch_reg, batch4_imgs,
            )
        # Keep the loss on device: a float() here forces a host round trip
        # every step (~60 ms through a remote-device tunnel, and a pipeline
        # bubble everywhere). It is read back only at log cadence — the
        # NaN check (reference trainer.py:226-230) moves there too.
        self.losses.append(loss)
        self._last_aux = aux
        self.global_step += 1
        if self.viewer is not None:
            b = batch_static or batch_dyn or batch_reg
            if b is not None:
                B, H, W = b.imgs.shape[:3]
                self.viewer.update(
                    self.global_step, H * W * B / max(time.time() - tic, 1e-6)
                )

        self._maybe_control()
        if self._rss_every and self.global_step % self._rss_every == 0:
            print(f"[rss] {self.work_dir} step {self.global_step} "
                  f"{self._rss_gb():.2f} GB", flush=True)
        if self.global_step % self.log_every == 0:
            # The NaN trap runs at log cadence regardless of whether a
            # writer is attached (the reference traps every step,
            # trainer.py:226-230; we batch the device->host sync).
            loss = float(loss)
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at step {self.global_step}"
                )
            if self.writer is not None:
                self._log(loss, aux, time.time() - tic,
                          batch_static or batch_dyn or batch_reg)
        if (
            self.checkpoint_every
            and self.global_step % self.checkpoint_every == 0
        ):
            os.makedirs(f"{self.work_dir}/checkpoints", exist_ok=True)
            save_checkpoint(
                f"{self.work_dir}/checkpoints/last", self.state, self.epoch
            )
        return loss

    def finish(self):
        """Stage-end epilogue: final NaN check + tile_overflow report.

        The in-loop NaN trap fires at log cadence only (PARITY §20), so a
        stage whose total steps are not a multiple of log_every would
        otherwise never check its last few steps. Also reports the final
        per-branch tile_overflow even without a writer attached (silent
        truncation should never go entirely unreported; NaN here means the
        render path did not measure it)."""
        if self.losses:
            loss = float(self.losses[-1])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at final step {self.global_step}"
                )
        if self._last_aux:
            report = {
                branch: float(a["tile_overflow"])
                for branch, a in self._last_aux.items()
                if "tile_overflow" in a
            }
            if report:
                print(
                    f"{self.work_dir}: stage-end tile_overflow "
                    + ", ".join(f"{b}={v:.4f}" for b, v in report.items())
                )

    def _maybe_control(self):
        flags = control_flags(
            self.ocfg, self.global_step, self.num_window_frames
        )
        if not flags or not (
            flags["do_densify"] or flags["do_cull"] or flags["do_reset"]
        ):
            return
        key = (self.only_fg, *sorted(flags.items()))
        if key not in self._control_cache:
            self._control_cache[key] = jax.jit(
                functools.partial(
                    apply_density_control,
                    cfg=self.ocfg,
                    num_frames=self.num_window_frames,
                    only_fg=self.only_fg,
                    bg_scene_scale=self.bg_scene_scale,
                    **flags,
                )
            )
        self.state = self._control_cache[key](self.state)

    def _log(self, loss, aux, step_time, any_batch):
        w = self.writer
        w.add_scalar("train/loss", loss, self.global_step)
        if any_batch is not None:
            B, H, W = any_batch.imgs.shape[:3]
            w.add_scalar(
                "train/num_rays_per_sec", H * W * B / max(step_time, 1e-6),
                self.global_step,
            )
        for branch, a in aux.items():
            for k, v in a.items():
                if hasattr(v, "ndim") and v.ndim == 0:
                    w.add_scalar(f"train/{branch}/{k}", float(v), self.global_step)
        w.add_scalar(
            "train/num_fg_alive", int(self.state.scene.fg.num_alive()),
            self.global_step,
        )
        if self.state.scene.bg is not None:
            w.add_scalar(
                "train/num_bg_alive", int(self.state.scene.bg.num_alive()),
                self.global_step,
            )
