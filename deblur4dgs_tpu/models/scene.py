"""Scene model: composed fg/bg Gaussians + motion bases + exposure model.

TPU-native counterpart of the reference SceneModel
(/root/reference/flow3d/scene_model.py). The heart is ``render``: sample the
learned exposure window (K sub-frame residual poses + times), deform
canonical Gaussians to each sub-frame time, rasterize each sub-frame, and
average into the blurry prediction (scene_model.py:248-397). Differences by
design:

  * the sub-frame loop is a ``lax.scan`` over stacked (pose, time) samples —
    one trace, one compiled body, accumulating reductions in the carry
    instead of materializing all K full-channel renders;
  * only per-sub-frame RGB/alpha/mask/depth are stacked (needed by the
    exposure-consistency losses); the wide track-channel renders are only
    accumulated (mean), bounding memory at high resolution;
  * an explicit sharp path ('mid'/'start'/'end' modes) instead of the
    reference's dead inference branch (scene_model.py:305 hardcodes
    training=True);
  * the debug cv2.imwrite to an absolute personal path
    (scene_model.py:375-378) is intentionally not replicated.

Channel multiplexing matches the reference: [RGB(3) | mask(1)? |
tracks(3B)? | depth(1)?] composited in one rasterizer pass; blurry mask =
max over sub-frames, blurry depth = min over sub-frames
(scene_model.py:389-393), everything else = mean.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblur4dgs_tpu.models.gaussians import Gaussians
from deblur4dgs_tpu.models.motion_bases import (
    MotionBases,
    compute_transforms,
    transform_gaussians,
)
from deblur4dgs_tpu.models.move_model import MoveModel, exposure_samples
from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize import rasterize

BLUR_NUM_CAMERAS = 11  # exposure sub-frames (scene_model.py:248)


class SceneModel(NamedTuple):
    fg: Gaussians
    bg: Gaussians | None
    bases: MotionBases
    move: MoveModel

    @property
    def has_bg(self) -> bool:
        return self.bg is not None

    @property
    def num_fg(self) -> int:
        return self.fg.capacity

    @property
    def num_bg(self) -> int:
        return self.bg.capacity if self.bg is not None else 0


def compute_poses_fg(scene: SceneModel, ts: jnp.ndarray):
    """Deformed fg means/quats at times ts: (G, B, 3), (G, B, 4)."""
    coefs = scene.fg.get_coefs()
    transfms = compute_transforms(scene.bases, ts, coefs)
    return transform_gaussians(transfms, scene.fg.means, scene.fg.get_quats())


def compute_poses_all(scene: SceneModel, ts: jnp.ndarray):
    """fg (deformed) then bg (static), broadcast over B times."""
    means, quats = compute_poses_fg(scene, ts)
    if scene.has_bg:
        B = means.shape[1]
        bg_means = jnp.broadcast_to(
            scene.bg.means[:, None], (scene.num_bg, B, 3)
        )
        bg_quats = jnp.broadcast_to(
            scene.bg.get_quats()[:, None], (scene.num_bg, B, 4)
        )
        means = jnp.concatenate([means, bg_means], axis=0)
        quats = jnp.concatenate([quats, bg_quats], axis=0)
    return means, quats


def _gather_set(scene: SceneModel, fg_only: bool, bg_only: bool):
    """Activated static params for the selected gaussian set (fg-first)."""
    if fg_only:
        g = scene.fg
        return g.get_scales(), g.get_opacities(), g.get_colors(), g.get_alive()
    if bg_only:
        g = scene.bg
        return g.get_scales(), g.get_opacities(), g.get_colors(), g.get_alive()
    fg, bg = scene.fg, scene.bg
    if bg is None:
        return fg.get_scales(), fg.get_opacities(), fg.get_colors(), fg.get_alive()
    return (
        jnp.concatenate([fg.get_scales(), bg.get_scales()], 0),
        jnp.concatenate([fg.get_opacities(), bg.get_opacities()], 0),
        jnp.concatenate([fg.get_colors(), bg.get_colors()], 0),
        jnp.concatenate([fg.get_alive(), bg.get_alive()], 0),
    )


def _poses_at_time(scene, t_frac, fg_only, bg_only):
    """World-space means/quats for the selected set at fractional time."""
    if bg_only:
        return scene.bg.means, scene.bg.get_quats()
    if fg_only:
        m, q = compute_poses_fg(scene, jnp.asarray(t_frac)[None])
        return m[:, 0], q[:, 0]
    m, q = compute_poses_all(scene, jnp.asarray(t_frac)[None])
    return m[:, 0], q[:, 0]


def render(
    scene: SceneModel,
    t,  # frame index (None => canonical, no deformation)
    w2c: jnp.ndarray,  # (4, 4)
    K: jnp.ndarray,  # (3, 3)
    img_wh: tuple[int, int],
    *,
    mode: str = "blury",  # 'blury' | 'mid' | 'start' | 'end'
    stage: str = "second",
    fg_only: bool = False,
    bg_only: bool = False,
    target_ts: jnp.ndarray | None = None,  # (B,) track supervision times
    target_w2cs: jnp.ndarray | None = None,  # (B, 4, 4)
    bg_color: float | jnp.ndarray = 1.0,
    return_mask: bool = False,
    return_depth: bool = False,
    num_exposure: int = BLUR_NUM_CAMERAS,
    cap: int = 512,
    use_pallas: bool = True,
    means2d_tap: jnp.ndarray | None = None,  # (S, N, 2) zeros; grads => density stats
    subframe_sharding=None,  # jax Sharding for the S axis => vmap+GSPMD path
    shared_exposure_binning: bool = True,  # one binning sort per window
    bucketed: bool = True,  # count-sorted tile buckets (shared path only)
    tile_mesh=None,  # jax Mesh => shard_map the compositor over image tiles
    tile_axis: str = "tile",
    return_exposure_stack: bool = True,  # per-sub-frame rgb/alpha stacks
    camera_mode: str = "linear",  # within-exposure pose interpolation
    max_tiles_per_gauss: int = 32,  # pair-binning tile-span cap
) -> dict:
    assert not (fg_only and bg_only)
    W, H = img_wh

    scales, opacities, colors, alive = _gather_set(scene, fg_only, bg_only)
    N = scales.shape[0]

    # --- exposure window ---------------------------------------------------
    t_eff = 0.0 if t is None else t
    samples = exposure_samples(
        scene.move, w2c, t_eff, num_exposure, stage=stage,
        mode="uniform" if mode == "blury" else mode,
        camera_mode=camera_mode,
    )
    S = samples.poses.shape[0]

    # --- constant channel payload -----------------------------------------
    chans = [colors]
    layout = {"img": 3}
    if return_mask:
        if fg_only or bg_only:
            maskv = jnp.ones((N, 1))
        else:
            maskv = jnp.concatenate(
                [jnp.ones((scene.num_fg, 1)), jnp.zeros((scene.num_bg, 1))], 0
            )
        chans.append(maskv)
        layout["mask"] = 1
    B = 0
    if target_ts is not None:
        B = target_ts.shape[0]
        if fg_only:
            tmeans, _ = compute_poses_fg(scene, target_ts)
        else:
            tmeans, _ = compute_poses_all(scene, target_ts)  # (N, B, 3)
        if target_w2cs is not None:
            # camera-space track targets (scene_model.py:277-281)
            tmeans = jnp.einsum(
                "bij,nbj->nbi",
                target_w2cs[:, :3, :],
                jnp.concatenate([tmeans, jnp.ones_like(tmeans[..., :1])], -1),
            )
        chans.append(tmeans.reshape(N, B * 3))
        layout["tracks_3d"] = B * 3
    const_chans = jnp.concatenate(chans, axis=-1)
    if return_depth:
        layout["depth"] = 1
    D = sum(layout.values())

    if isinstance(bg_color, (int, float)):
        bgvec = jnp.full((3,), float(bg_color))
    else:
        bgvec = jnp.asarray(bg_color)
    background = jnp.zeros((D,)).at[:3].set(bgvec)  # aux channels: bg 0

    if means2d_tap is None:
        means2d_tap = jnp.zeros((S, N, 2))

    # Fraction of tile-gaussian intersections dropped by capacity
    # truncation (tile_cap / bucket spec too small for the scene). Computed
    # on the shared-binning training paths; surfaced so training can log it
    # (silent truncation degrades quality invisibly otherwise). Paths that
    # do NOT measure it (subframe_sharding, per-sub-frame binning) report
    # NaN so a log reader can tell "measured 0" from "not measured".
    tile_overflow = jnp.full((), jnp.nan)

    # --- per-sub-frame render body -----------------------------------------
    def project_subframe(pose, time, tap):
        """(pose (3,4), time (), tap (N,2)) -> Projected for this sub-frame."""
        means_w, quats_w = _poses_at_time(
            scene, time, fg_only, bg_only
        ) if t is not None else (
            (scene.bg.means, scene.bg.get_quats()) if bg_only
            else _poses_at_time(scene, 0.0, fg_only, bg_only)
        )
        # residual exposure pose applied in world space (scene_model.py:352)
        means_w = lie.pose_apply(pose, means_w)
        proj = project(
            means_w, quats_w, scales, w2c, K, img_wh, aux_mask=alive
        )
        return proj._replace(means2d=proj.means2d + tap)

    def composite_subframe(proj, shared_binning=None):
        ch = const_chans
        if return_depth:
            ch = jnp.concatenate([ch, proj.depths[:, None]], axis=-1)
        img, alpha, _ = rasterize(
            proj, opacities, ch, background, img_wh, cap=cap,
            use_pallas=use_pallas, shared_binning=shared_binning,
        )
        if return_depth:
            # expected depth (gsplat RGB+ED): normalize by alpha
            dch = img[..., -1:] / jnp.maximum(alpha[..., None], 1e-10)
            img = jnp.concatenate([img[..., :-1], dch], axis=-1)
        return img, alpha, proj.radii

    def one_subframe(pose, time, tap):
        return composite_subframe(project_subframe(pose, time, tap))

    if subframe_sharding is not None:
        # Multi-chip path: vmap over the exposure axis, sharded across the
        # mesh; XLA/GSPMD turns the reductions below into collectives over
        # ICI (SURVEY.md §5: sub-frame/exposure parallelism).
        xs = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, subframe_sharding),
            (samples.poses, samples.times, means2d_tap),
        )
        imgs, alphas, radii_stack = jax.vmap(one_subframe)(*xs)
        sum_img = jnp.sum(imgs, axis=0)
        sum_alpha = jnp.sum(alphas, axis=0)
        max_mask = (
            jnp.max(imgs[..., 3:4], axis=0) if return_mask else None
        )
        min_depth = jnp.min(imgs[..., -1:], axis=0) if return_depth else None
        rgb_stack = imgs[..., :3]
        alpha_stack = alphas
        mask_stack = imgs[..., 3:4] if return_mask else None
    else:
        # Single-chip path: sequential scan, carry-accumulated reductions
        # (bounds memory: only rgb/alpha stacks are materialized per
        # sub-frame, never the wide track-channel renders).
        def accumulate(carry, img, alpha, radii):
            sum_img, sum_alpha, max_mask, min_depth = carry
            sum_img = sum_img + img
            sum_alpha = sum_alpha + alpha
            if return_mask:
                max_mask = jnp.maximum(max_mask, img[..., 3:4])
            if return_depth:
                min_depth = jnp.minimum(min_depth, img[..., -1:])
            # mask channel stacked alongside rgb: the per-sub-frame rendered
            # fg-mask weighting the AlignedLoss (trainer.py:605,613). A
            # zero-width slice when no mask channel keeps the y-structure
            # static across configs.
            mch = img[..., 3:4] if return_mask else img[..., :0]
            return (sum_img, sum_alpha, max_mask, min_depth), (
                img[..., :3], alpha, radii, mch,
            )

        if shared_exposure_binning and S > 1:
            # One binning sort for the whole exposure window (exact for
            # compositing thanks to the per-pixel bbox cutoff; see
            # tiling.bin_gaussians_union). Projections are computed up
            # front (stacked over S) and re-consumed by the scan; the
            # sub-frame-independent payload (opacity + constant channels)
            # is gathered once and shared (split compositor).
            from deblur4dgs_tpu.ops.rasterize import (
                composite_window_buckets,
                rasterize_split,
            )
            from deblur4dgs_tpu.ops.tiling import (
                TILE_BLOCK,
                bin_gaussians_union,
                bin_gaussians_union_runs,
                bucket_tiles_from_runs,
                default_bucket_spec,
                num_tiles,
                pack_dyn_all,
                pack_static,
                pack_window_fused,
                packed_dyn_table,
                packed_static_table,
            )

            projs = jax.vmap(project_subframe)(
                samples.poses, samples.times, means2d_tap
            )
            tiles_x, tiles_y = num_tiles(img_wh)
            # Bucketing's rank-dependent capacities assume the skewed
            # occupancy distribution of real images; on tiny images (unit
            # tests) nearly every tile lands in the reduced-cap tail and
            # dense tiles get truncated, degrading gradients. Only bucket
            # when there are enough tiles for the count-sort to separate
            # heavy from light.
            if bucketed and tiles_x * tiles_y >= 64:
                # Count-sorted tile buckets: heavy tiles get full capacity,
                # the tail a fraction — pack gathers, gradient scatters,
                # and kernel DMA all pay per slot, and the dense layout is
                # ~80% sentinel slots at realistic occupancies. The lists
                # come straight from the binning sort's runs; the dense
                # (T, CAP) table (a pair-scale scatter) is never built.
                rank_sorted, starts, _, raw, order = bin_gaussians_union_runs(
                    projs, img_wh, cap,
                    max_tiles_per_gauss=max_tiles_per_gauss,
                )
                spec = default_bucket_spec(tiles_x * tiles_y, cap)
                # Tile-sharded compositing needs every bucket's rows to
                # split evenly across the mesh (and each shard's rows to
                # stay TILE_BLOCK-aligned for the kernel grid).
                pad_mult = TILE_BLOCK * (
                    tile_mesh.shape[tile_axis] if tile_mesh is not None else 1
                )
                buckets = bucket_tiles_from_runs(
                    rank_sorted, starts, raw, N, spec, pad_multiple=pad_mult
                )
                kept = sum(jnp.sum(c) for c in buckets.counts)
                tile_overflow = 1.0 - kept.astype(jnp.float32) / jnp.maximum(
                    jnp.sum(raw), 1
                ).astype(jnp.float32)
                # Combined dyn+static payload table: ONE gather per bucket
                # (and one backward scatter-add) instead of two.
                tbl = jnp.concatenate(
                    [
                        packed_dyn_table(projs, order, return_depth),
                        packed_static_table(opacities, const_chans, order),
                    ],
                    axis=1,
                )
                Fd = 7 if return_depth else 6
                packed_lists = tuple(
                    pack_window_fused(gi, tbl, S, Fd)
                    for gi in buckets.gather_idx
                )
                dyn_lists = tuple(p[0] for p in packed_lists)
                st_list = tuple(p[1] for p in packed_lists)
                # Whole window in tile space: the exposure reductions
                # happen per bucket; ONE inverse-permutation gather +
                # untile per window (vs a full-grid scatter + untile per
                # sub-frame, which cost as much as the compositor kernels).
                window_out = composite_window_buckets(
                    buckets, st_list, dyn_lists, background, img_wh,
                    include_depth=return_depth,
                    mask_channel=3 if return_mask else None,
                    use_pallas=use_pallas,
                    tile_mesh=tile_mesh, tile_axis=tile_axis,
                    stack_subframes=return_exposure_stack,
                    stack_mask=return_exposure_stack and return_mask,
                )
                subframe = xs = None
            else:
                shared = bin_gaussians_union(
                    projs, img_wh, cap,
                    max_tiles_per_gauss=max_tiles_per_gauss,
                )
                tile_overflow = 1.0 - jnp.sum(shared[1]).astype(
                    jnp.float32
                ) / jnp.maximum(jnp.sum(shared[2]), 1).astype(jnp.float32)
                st_data = pack_static(
                    opacities, const_chans, shared[0], shared[3]
                )
                # One wide gather for all S sub-frames (and one scatter-add
                # in the backward) instead of S narrow ones — the narrow
                # gathers' backward scatters dominated the window cost
                # (~2.3x).
                dyn_all = pack_dyn_all(
                    projs, shared[0], shared[3], return_depth
                )

                def subframe(carry, xs):
                    dyn, radii = xs
                    img, alpha = rasterize_split(
                        None, st_data, shared, background, img_wh,
                        include_depth=return_depth, use_pallas=use_pallas,
                        dyn_data=dyn,
                    )
                    if return_depth:
                        dch = img[..., -1:] / jnp.maximum(
                            alpha[..., None], 1e-10
                        )
                        img = jnp.concatenate([img[..., :-1], dch], axis=-1)
                    return accumulate(carry, img, alpha, radii)

                xs = (dyn_all, projs.radii)
        else:

            def subframe(carry, xs):
                return accumulate(carry, *one_subframe(*xs))

            xs = (samples.poses, samples.times, means2d_tap)

        if subframe is None:
            sum_img = window_out["sum_img"]
            sum_alpha = window_out["sum_alpha"]
            max_mask = window_out["max_mask"]
            min_depth = window_out["min_depth"]
            rgb_stack = window_out["rgb_stack"]
            alpha_stack = window_out["alpha_stack"]
            mask_stack = window_out["mask_stack"]
            radii_stack = projs.radii
        else:
            carry0 = (
                jnp.zeros((H, W, D)),
                jnp.zeros((H, W)),
                jnp.full((H, W, 1), -jnp.inf),
                jnp.full((H, W, 1), jnp.inf),
            )
            # Unrolled Python loop rather than lax.scan: a traced scan
            # spends ~30% of the window's device time on carry copies and
            # dynamic slices of the stacked inputs/outputs (profiler
            # trace); with S static and small the unrolled form lets XLA
            # use static slices and fuse the accumulates into the
            # compositor outputs.
            carry = carry0
            ys = []
            for s in range(S):
                carry, y = subframe(carry, jax.tree.map(lambda x: x[s], xs))
                ys.append(y)
            sum_img, sum_alpha, max_mask, min_depth = carry
            rgb_stack, alpha_stack, radii_stack, mask_stack = jax.tree.map(
                lambda *a: jnp.stack(a), *ys
            )
            if not return_mask:
                mask_stack = None

    avg = sum_img / S
    acc = sum_alpha / S

    out = {}
    off = 0
    for name, dim in layout.items():
        x = avg[..., off : off + dim]
        off += dim
        if name == "mask":
            x = max_mask
        elif name == "depth":
            x = min_depth
        elif name == "tracks_3d":
            x = x.reshape(H, W, B, 3)
        out[name] = x
    out["acc"] = acc[..., None]
    out["delta_t"] = samples.delta_t
    out["poses"] = samples.poses
    out["times"] = samples.times
    # rgb_stack holds all S sub-frames, or just the mid one when the
    # exposure stacks were skipped (return_exposure_stack=False).
    full_stack = rgb_stack.shape[0] == S
    out["pred_sharp_img"] = rgb_stack[S // 2 if full_stack else 0]
    out["exposure_imgs"] = rgb_stack if return_exposure_stack else None
    out["exposure_alphas"] = alpha_stack if return_exposure_stack else None
    # Per-sub-frame rendered fg-mask channel: the detached weighting mask
    # of the exposure-consistency AlignedLoss (reference trainer.py:605,613
    # reads it from exposure_imgs channel 3:4).
    out["exposure_masks"] = (
        mask_stack if (return_exposure_stack and return_mask) else None
    )
    out["radii"] = radii_stack  # (S, N) per-sub-frame screen radii
    out["tile_overflow"] = tile_overflow
    return out
