"""Synthetic dynamic blurry-video scenes for tests and benchmarks.

The reference trains on Shape-of-Motion-preprocessed stereo blur data
(/root/reference/flow3d/data/stereo_low_dataset.py) which isn't available
here; this module fabricates an equivalent supervision bundle from a
known ground-truth Gaussian scene:

  * fg Gaussians animated by ground-truth SE(3) motion bases;
  * static bg Gaussians on a backdrop shell;
  * blurry observations = average of sub-frame renders across a known
    exposure window (the same forward model the trainer inverts);
  * masks / depths / 2D tracks derived from the ground-truth scene.

Everything renders through the oracle path so dataset quality is
independent of the kernels under test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.models.gaussians import Gaussians
from deblur4dgs_tpu.models.motion_bases import (
    MotionBases,
    compute_transforms,
    transform_gaussians,
)
from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize_ref import render_ref


class SyntheticScene(NamedTuple):
    fg: Gaussians
    bg: Gaussians
    bases: MotionBases
    w2cs: jnp.ndarray  # (T, 4, 4) per-frame cameras
    Ks: jnp.ndarray  # (T, 3, 3)
    img_wh: tuple[int, int]
    exposure: float  # GT exposure half-width (frame units)
    # (T, 6) se(3) camera-shake delta at the exposure END; the camera
    # sweeps exp(u * delta) @ w2c for u in [-1, 1] across the exposure
    # (symmetric, so the mid-exposure camera is exactly w2cs[i]). None =>
    # camera fixed within each exposure (motion blur from the scene only —
    # the pre-round-3 behavior, which at realistic resolutions produced
    # near-sharp 'blurry' inputs; see QUALITY_r03 history).
    exp_deltas: jnp.ndarray | None = None


def _logit(x):
    return np.log(x) - np.log1p(-x)


def make_scene(
    seed: int = 0,
    num_fg: int = 120,
    num_bg: int = 300,
    num_frames: int = 8,
    num_bases: int = 4,
    img_wh: tuple[int, int] = (64, 48),
    exposure: float = 0.4,
    cam_shake: float = 0.015,
    exp_shake: float = 0.0,
    motion_cycles: float = 1.0,
    motion_amp: float = 0.35,
) -> SyntheticScene:
    """exp_shake > 0 adds intra-exposure camera motion (se(3) magnitude of
    the half-sweep) — the dominant blur source in the reference's data and
    the quantity MoveModel explicitly models; without it an exposure is
    rendered through a fixed camera and only scene motion blurs.
    motion_cycles stretches the fg motion sinusoids (cycles per clip):
    per-frame scene motion is ~amplitude * 2*pi*cycles / T, so longer
    clips need cycles > 1 to stay visibly dynamic.

    motion_amp scales the sinusoid amplitudes. Velocity (per-frame motion,
    hence object blur) goes as amp * cycles, but CURVATURE (per-frame
    acceleration) as amp * cycles^2 — and the trainer's reference-faithful
    smoothness priors (w_smooth_tracks/w_z_accel on second differences)
    penalize curvature. Real video sits in a high-velocity, low-curvature
    regime (high frame rate relative to motion); synthetic trajectories
    must too, or the priors beat the track loss and flatten the learned
    motion (measured in QUALITY_r04 partials at cycles=3: trained fg moved
    ~6 px/frame vs 42 GT). Prefer raising motion_amp over motion_cycles
    when more object blur is wanted."""
    rng = np.random.default_rng(seed)
    W, H = img_wh
    f = 0.9 * max(W, H)

    # fg: a compact cluster that translates + rotates over time
    fg_means = rng.normal(0, 0.25, (num_fg, 3)).astype(np.float32)
    fg_means[:, 2] *= 0.3
    fg = Gaussians(
        means=jnp.asarray(fg_means),
        quats=jnp.asarray(rng.normal(size=(num_fg, 4)).astype(np.float32)),
        scales=jnp.full((num_fg, 3), np.log(0.045), jnp.float32),
        colors=jnp.asarray(
            _logit(rng.uniform(0.25, 0.95, (num_fg, 3))).astype(np.float32)
        ),
        opacities=jnp.full((num_fg,), _logit(0.92), jnp.float32),
        motion_coefs=jnp.asarray(
            (rng.normal(0, 0.5, (num_fg, num_bases))).astype(np.float32)
        ),
    )

    # bg: a dense backdrop wall covering the whole view frustum (the
    # reference's bg init unprojects every non-fg pixel, so real scenes have
    # full bg coverage; an undersampled bg makes the acc->1 mask loss
    # inflate gaussians into empty pixels and corrupt depth)
    g = int(np.ceil(np.sqrt(num_bg)))
    gx, gy = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    z_wall = 1.6  # behind the fg (camera sits at -2.5 along +z; see below)
    span = 1.25 * (2.5 + z_wall) / f * max(W, H) / 2.0
    bg_means = np.stack(
        [gx.ravel() * span * W / max(W, H), gy.ravel() * span * H / max(W, H),
         np.full(g * g, z_wall)],
        -1,
    )[:num_bg].astype(np.float32)
    bg_means += rng.normal(0, 0.02, bg_means.shape).astype(np.float32)
    bg_spacing = 2 * span * W / max(W, H) / g
    bg = Gaussians(
        means=jnp.asarray(bg_means),
        quats=jnp.asarray(rng.normal(size=(num_bg, 4)).astype(np.float32)),
        scales=jnp.full((num_bg, 3), np.log(1.2 * bg_spacing), jnp.float32),
        colors=jnp.asarray(
            _logit(rng.uniform(0.1, 0.9, (num_bg, 3))).astype(np.float32)
        ),
        opacities=jnp.full((num_bg,), _logit(0.95), jnp.float32),
    )

    # GT motion bases: smooth sinusoidal per-basis trajectories
    t = np.linspace(0, 2 * np.pi * motion_cycles, num_frames)
    rots6, transls = [], []
    for k in range(num_bases):
        amp = motion_amp * (k + 1) / num_bases
        ang = amp * np.sin(t + k)  # rotation about a per-basis axis
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        R = lie.so3_exp(jnp.asarray((ang[:, None] * axis).astype(np.float32)))
        rots6.append(lie.rmat_to_cont_6d(R))
        tr = motion_amp * np.stack(
            [np.sin(t + 2 * k), np.cos(t + k) - np.cos(float(k)), 0.1 * np.sin(2 * t + k)], -1
        ) * (k + 1) / num_bases
        transls.append(jnp.asarray(tr.astype(np.float32)))
    bases = MotionBases(rots=jnp.stack(rots6), transls=jnp.stack(transls))

    # cameras orbit slightly; scene pushed +z in front
    w2cs = []
    for i in range(num_frames):
        wu = np.concatenate(
            [
                cam_shake * rng.normal(size=3),
                cam_shake * rng.normal(size=3),
            ]
        ).astype(np.float32)
        base = np.eye(4, dtype=np.float32)
        base[2, 3] = 2.5  # camera at z=-2.5 looking at origin
        delta = np.asarray(lie.rt_to_mat4(*_split(lie.se3_exp(jnp.asarray(wu)))))
        w2cs.append(delta @ base)
    Kmat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    exp_deltas = None
    if exp_shake > 0:
        # random direction per frame, biased toward rotation + in-plane
        # translation (handheld-shake-like); symmetric across the window
        d = rng.normal(size=(num_frames, 6)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        exp_deltas = jnp.asarray(exp_shake * d)
    return SyntheticScene(
        fg=fg,
        bg=bg,
        bases=bases,
        w2cs=jnp.asarray(np.stack(w2cs)),
        Ks=jnp.broadcast_to(jnp.asarray(Kmat), (num_frames, 3, 3)),
        img_wh=img_wh,
        exposure=exposure,
        exp_deltas=exp_deltas,
    )


def _split(pose34):
    return pose34[:3, :3], pose34[:3, 3]


def gt_gaussians_at(scene: SyntheticScene, t_frac: jnp.ndarray):
    """All GT gaussians (fg deformed at t + static bg): means, quats,
    scales, opacities, colors."""
    coefs = scene.fg.get_coefs()
    tf = compute_transforms(scene.bases, jnp.asarray([t_frac]), coefs)
    fgm, fgq = transform_gaussians(tf, scene.fg.means, scene.fg.get_quats())
    means = jnp.concatenate([fgm[:, 0], scene.bg.means], 0)
    quats = jnp.concatenate([fgq[:, 0], scene.bg.get_quats()], 0)
    scales = jnp.concatenate([scene.fg.get_scales(), scene.bg.get_scales()], 0)
    opac = jnp.concatenate([scene.fg.get_opacities(), scene.bg.get_opacities()], 0)
    colors = jnp.concatenate([scene.fg.get_colors(), scene.bg.get_colors()], 0)
    return means, quats, scales, opac, colors


def render_frame(scene: SyntheticScene, t_frac, w2c, K, channels=None, bg=1.0):
    means, quats, scales, opac, colors = gt_gaussians_at(scene, t_frac)
    ch = colors if channels is None else channels
    return render_ref(
        means, quats, scales, opac, ch, w2c, K, scene.img_wh, bg
    )


class SyntheticDataset(NamedTuple):
    """Training bundle mirroring the reference dataset fields."""

    imgs: jnp.ndarray  # (T, H, W, 3) blurry observations
    sharp_imgs: jnp.ndarray  # (T, H, W, 3) GT mid-exposure (eval only)
    masks: jnp.ndarray  # (T, H, W) fg masks
    depths: jnp.ndarray  # (T, H, W)
    w2cs: jnp.ndarray
    Ks: jnp.ndarray
    tracks_3d: jnp.ndarray  # (T, P, 3) world-space GT track points
    tracks_2d: jnp.ndarray  # (T, P, 2) pixel-space tracks
    track_depths: jnp.ndarray  # (T, P)
    track_visibles: jnp.ndarray  # (T, P)


def sharp_fg_masks(scene: "SyntheticScene", cap: int = 1024,
                   use_pallas: bool = True) -> jnp.ndarray:
    """Mid-exposure fg silhouettes (T, H, W) through the production path.

    Exactly the blur_union_masks=False masks of generate_dataset, but
    recomputable alone — the sharp-supervision ceiling control
    (scripts/tpu_quality_regression.py --sharp-supervision) converts a
    cached blur-union dataset by re-rendering only this field (~seconds)
    instead of regenerating every blur-sample render (~minutes)."""
    from deblur4dgs_tpu.models.move_model import init_move_model
    from deblur4dgs_tpu.models.scene import SceneModel
    from deblur4dgs_tpu.models.scene import render as scene_render

    T = scene.w2cs.shape[0]
    sm = SceneModel(
        fg=scene.fg._replace(
            alive=jnp.ones((scene.fg.capacity,), jnp.float32)
        ),
        bg=scene.bg._replace(
            alive=jnp.ones((scene.bg.capacity,), jnp.float32)
        ),
        bases=scene.bases,
        move=init_move_model(jax.random.PRNGKey(0), num_frames=T),
    )

    @jax.jit
    def mask_at(tf, w2c, K):
        out = scene_render(
            sm, tf, w2c, K, scene.img_wh, mode="mid", stage="first",
            return_mask=True, bg_color=1.0, num_exposure=1, cap=cap,
            use_pallas=use_pallas,
        )
        return out["mask"][..., 0]

    masks = [
        (np.asarray(mask_at(jnp.asarray(float(i)), scene.w2cs[i],
                            scene.Ks[i])) > 0.5).astype(np.float32)
        for i in range(T)
    ]
    return jnp.stack([jnp.asarray(m) for m in masks])


class SyntheticSceneAdapter:
    """Dataset-interface adapter over a SyntheticScene + SyntheticDataset,
    so the staged pipeline (pipeline.py) runs end-to-end without real data.
    Mirrors the StereoDataset surface the pipeline consumes."""

    def __init__(self, scene: "SyntheticScene", data: "SyntheticDataset",
                 num_targets_per_frame: int = 2, seed: int = 0,
                 split: str = "train"):
        self.scene = scene
        self.data = data
        self.split = split
        self.training = split == "train"
        self.rng = np.random.default_rng(seed)
        self.num_targets = num_targets_per_frame
        T = data.imgs.shape[0]
        self.start, self.end = 0, T
        self.Ks = np.asarray(data.Ks)
        self.w2cs = np.asarray(data.w2cs)
        # The reference's val split serves SHARP held-out frames
        # (images_test, run_compute_metrics.py:55-61): test-time pose opt
        # aligns the sharp render against sharp GT and the metrics measure
        # deblur quality. Training frames stay blurry.
        self.imgs = np.asarray(
            data.sharp_imgs if split == "val" else data.imgs
        )
        self.masks = np.asarray(data.masks)
        self.depths = np.asarray(data.depths)

    def __len__(self):
        return self.imgs.shape[0]

    @property
    def num_frames(self):
        return self.imgs.shape[0]

    def get_dyn_time_ids(self):
        return np.arange(self.num_frames)

    def get_dyn_image_ids(self):
        return list(range(self.num_frames))

    def get_img_wh(self):
        return self.scene.img_wh

    def get_tracks_3d(self, num_samples: int, step: int = 1):
        from deblur4dgs_tpu.data.observations import TrackObservations

        d = self.data
        P = d.tracks_3d.shape[1]
        sel = (
            self.rng.choice(P, min(num_samples, P), replace=False)
            if num_samples < P else np.arange(P)
        )
        xyz = jnp.swapaxes(d.tracks_3d[:, sel], 0, 1)  # (P, T, 3)
        vis = jnp.swapaxes(d.track_visibles[:, sel], 0, 1)
        return TrackObservations(
            xyz=xyz,
            visibles=vis,
            invisibles=~vis,
            confidences=jnp.ones_like(vis, jnp.float32),
            colors=jnp.full((len(sel), 3), 0.5),
        )

    def get_bkgd_points(self, num_samples: int):
        from deblur4dgs_tpu.data.observations import StaticObservations

        bg = self.scene.bg
        n = bg.capacity
        sel = (
            self.rng.choice(n, min(num_samples, n), replace=False)
            if num_samples < n else np.arange(n)
        )
        return StaticObservations(
            xyz=bg.means[sel],
            normals=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (len(sel), 1)),
            colors=jnp.asarray(jax.nn.sigmoid(bg.colors[sel])),
        )

    def get_item(self, index: int) -> dict:
        d = self.data
        item = {
            "frame_names": f"{index:05d}",
            "ts": index,
            "w2cs": d.w2cs[index],
            "Ks": d.Ks[index],
            "imgs": self.imgs[index],  # sharp GT on the val split
            "valid_masks": jnp.ones_like(d.masks[index]),
            "masks": d.masks[index],
            "depths": d.depths[index],
        }
        if not self.training:
            return item
        W, H = self.scene.img_wh
        q = np.floor(np.asarray(d.tracks_2d[index]))
        q = np.stack([q[:, 0].clip(0, W - 1), q[:, 1].clip(0, H - 1)], -1)
        item["query_tracks_2d"] = q.astype(np.float32)
        tids = self.rng.choice(
            self.num_frames, (self.num_targets,), replace=False
        )
        q_vis = np.asarray(d.track_visibles[index], np.float32)
        item["target_ts"] = tids
        item["target_w2cs"] = np.asarray(d.w2cs[tids])
        item["target_Ks"] = np.asarray(d.Ks[tids])
        item["target_tracks_2d"] = np.asarray(d.tracks_2d[tids])
        item["target_visibles"] = (
            np.asarray(d.track_visibles[tids], np.float32) * q_vis[None]
        )
        item["target_confidences"] = np.ones_like(item["target_visibles"])
        item["target_track_depths"] = np.asarray(d.track_depths[tids])
        return item


def generate_dataset(
    scene: SyntheticScene, num_blur_samples: int = 7, num_tracks: int = 64,
    seed: int = 0, fast_renderer: bool = False,
    blur_union_masks: bool = False,
) -> SyntheticDataset:
    """fast_renderer=False (default) renders through the pure-JAX oracle,
    keeping dataset quality independent of the kernels under test (unit
    tests). fast_renderer=True renders through the production tiled path —
    required at realistic scene sizes where the dense oracle is orders of
    magnitude slower (the kernels are oracle-verified to 1e-6 separately,
    so the supervision content is the same).

    blur_union_masks=True emits fg masks as the UNION over the exposure
    window (any sub-frame's fg coverage), matching the reference's real
    data where masks are segmented from the BLURRY frames and therefore
    cover the motion streaks (stereo_low_dataset.py mask loading). A sharp
    mid-exposure mask on blurred data penalizes the trainer's correctly-
    sweeping solution (its blurry-mode rendered mask is the sub-frame max,
    trainer.py:620-631 / scene_model.py:389-393) — an anti-motion prior
    the reference never has."""
    T = scene.w2cs.shape[0]
    W, H = scene.img_wh
    rng = np.random.default_rng(seed)
    track_ids = rng.choice(scene.fg.capacity, size=num_tracks, replace=False)
    nfg = scene.fg.capacity

    # Jit the per-frame renders once: at realistic sizes the generation
    # loop makes hundreds of render calls, and eager per-op dispatch
    # (especially through a remote-device tunnel) dwarfs the device time.
    if fast_renderer:
        from deblur4dgs_tpu.models.move_model import init_move_model
        from deblur4dgs_tpu.models.scene import SceneModel
        from deblur4dgs_tpu.models.scene import render as scene_render

        # zero-init move model => identity exposure residual, and
        # stage='first' forces deltaT=0: mode='mid' with S=1 renders the GT
        # gaussians at exactly time tf through the production tile path
        sm = SceneModel(
            fg=scene.fg._replace(alive=jnp.ones((nfg,), jnp.float32)),
            bg=scene.bg._replace(
                alive=jnp.ones((scene.bg.capacity,), jnp.float32)
            ),
            bases=scene.bases,
            move=init_move_model(jax.random.PRNGKey(0), num_frames=T),
        )

        @jax.jit
        def frame_at(tf, w2c, K):
            out = scene_render(
                sm, tf, w2c, K, scene.img_wh, mode="mid", stage="first",
                return_mask=True, return_depth=True, bg_color=1.0,
                num_exposure=1, cap=1024,
            )
            return out["img"], out["mask"][..., 0], out["depth"][..., 0]

        def rgb_at(tf, w2c, K):
            return frame_at(tf, w2c, K)[0]

        def mask_depth_at(tf, w2c, K):
            _, m, d = frame_at(tf, w2c, K)
            # match the oracle branch's (out[..., 0], out[..., 1]/alpha)
            return jnp.stack([m, d], -1), jnp.ones_like(m)
    else:

        @jax.jit
        def rgb_at(tf, w2c, K):
            means, quats, scales, opac, colors = gt_gaussians_at(scene, tf)
            img, _ = render_ref(
                means, quats, scales, opac, colors, w2c, K, scene.img_wh,
                1.0,
            )
            return img

        @jax.jit
        def mask_depth_at(tf, w2c, K):
            means, quats, scales, opac, _ = gt_gaussians_at(scene, tf)
            maskv = jnp.concatenate(
                [jnp.ones((nfg, 1)), jnp.zeros((means.shape[0] - nfg, 1))],
                0,
            )
            proj = project(means, quats, scales, w2c, K, scene.img_wh)
            ch = jnp.concatenate([maskv, proj.depths[:, None]], -1)
            out, alpha = render_ref(
                means, quats, scales, opac, ch, w2c, K, scene.img_wh,
                jnp.zeros(2),
            )
            return out, alpha

    imgs, sharps, masks, depths = [], [], [], []
    tracks3, tracks2, tdepths, tvis = [], [], [], []
    for i in range(T):
        w2c, K = scene.w2cs[i], scene.Ks[i]
        # blurry = mean of sub-frame renders across the exposure window;
        # with exp_deltas the camera sweeps exp(u * delta) @ w2c, u in
        # [-1, 1] — mid-exposure camera == w2cs[i] exactly
        acc = None
        ts = np.linspace(i - scene.exposure, i + scene.exposure, num_blur_samples)
        us = np.linspace(-1.0, 1.0, num_blur_samples)
        ts = np.clip(ts, 0, T - 1)
        for tf, u in zip(ts, us):
            w2c_s = w2c
            if scene.exp_deltas is not None:
                delta = lie.rt_to_mat4(
                    *_split(lie.se3_exp(u * scene.exp_deltas[i]))
                )
                w2c_s = delta @ w2c
            img = rgb_at(jnp.asarray(tf, jnp.float32), w2c_s, K)
            acc = img if acc is None else acc + img
        imgs.append(acc / num_blur_samples)

        sharp = rgb_at(jnp.asarray(i, jnp.float32), w2c, K)
        sharps.append(sharp)

        # fg mask + depth via channel multiplexing at mid-exposure
        out, alpha = mask_depth_at(jnp.asarray(i, jnp.float32), w2c, K)
        mask_i = (np.asarray(out[..., 0]) > 0.5).astype(np.float32)
        if blur_union_masks:
            # union of fg coverage across the exposure window (sweeping
            # camera + object motion) — the blurry-frame segmentation the
            # reference's datasets provide
            for tf, u in zip(ts, us):
                w2c_s = w2c
                if scene.exp_deltas is not None:
                    delta = lie.rt_to_mat4(
                        *_split(lie.se3_exp(u * scene.exp_deltas[i]))
                    )
                    w2c_s = delta @ w2c
                out_s, _ = mask_depth_at(
                    jnp.asarray(tf, jnp.float32), w2c_s, K
                )
                mask_i = np.maximum(
                    mask_i, (np.asarray(out_s[..., 0]) > 0.5).astype(np.float32)
                )
        masks.append(mask_i)
        depths.append(out[..., 1] / np.maximum(np.asarray(alpha), 1e-6))

        # GT tracks: fg subset positions at time i
        coefs = scene.fg.get_coefs()[track_ids]
        tf3 = compute_transforms(scene.bases, jnp.asarray([float(i)]), coefs)
        pm, _ = transform_gaussians(
            tf3, scene.fg.means[track_ids], scene.fg.get_quats()[track_ids]
        )
        pts = pm[:, 0]  # (P, 3) world
        cam = lie.pose_apply(w2c[:3], pts)
        uvz = (K @ cam.T).T
        uv = uvz[:, :2] / jnp.maximum(uvz[:, 2:], 1e-6)
        vis = (
            (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
            & (cam[:, 2] > 0.05)
        )
        tracks3.append(pts)
        tracks2.append(uv)
        tdepths.append(cam[:, 2])
        tvis.append(vis)

    return SyntheticDataset(
        imgs=jnp.stack(imgs),
        sharp_imgs=jnp.stack(sharps),
        masks=jnp.stack(masks),
        depths=jnp.stack(depths),
        w2cs=scene.w2cs,
        Ks=scene.Ks,
        tracks_3d=jnp.stack(tracks3),
        tracks_2d=jnp.stack(tracks2),
        track_depths=jnp.stack(tdepths),
        track_visibles=jnp.stack(tvis),
    )
