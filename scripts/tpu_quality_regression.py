"""End-to-end deblur-quality regression on real TPU hardware.

VERDICT r1 item 5 (protocol fixed r3, capacity + schedule fixed r4):
generate a realistic synthetic blurry sequence (camera shake + object
motion), run the FULL staged train_low pipeline, and assert the deblurred
sharp renders beat the blurry inputs against the ground-truth sharp frames
by a fixed margin. This is the proxy for the unavailable real-scene parity
target (BASELINE.md): the reference establishes quality by PSNR/SSIM/LPIPS
on held-out frames (run_compute_metrics.py:76-77); here the synthetic
generator gives us true sharp frames to score against directly.

Round-4 fixes (the r3 run scored fg_improvement = -0.59 dB; diagnosis via
scripts/inspect_checkpoint.py on the r3 checkpoints):

  * fg CAPACITY: r3 generated only min(128, num_fg) tracks, and
    initialize_scene builds fg gaussians one-per-track — the "2000-fg" run
    actually trained 128 fg gaussians (capacity 256) against a 2000-
    gaussian GT foreground at 512x288. The fg reconstruction was
    capacity-bound regardless of blur modeling (r3 ablation == full run, as
    this predicts). Now num_tracks == num_fg and the cache key includes it.
  * EXPOSURE PRIOR: the generator's exposure=0.9 sat outside the model's
    reference-faithful deltaT hinge range [0.5, 0.75]
    (LossesConfig.exposure_min/max, trainer.py:730-734 anchor) — learned
    deltaT stalled at ~0.62 fighting the hinge. The r4 dataset uses
    exposure=0.7, inside the prior, like the reference's real exposures.
  * SCHEDULE: reference-scale epochs by default (static 400 / dynamic 101,
    run_training_static.py:68 / run_training_dynamic.py:121,
    initial_optim 1000, test-time pose-opt 500) — r3 ran a 12x-shortened
    60/32 schedule whose sharp-data reconstruction ceiling (~21-25 dB) sat
    below the blurry input floor. --quick restores the short tier for
    debugging.
  * LPIPS: the metrics stage scores the reference's full PSNR/SSIM/LPIPS
    triple via make_lpips_fn. Offline caveat: lpips_weights='random' is a
    SEEDED UNTRAINED AlexNet-LPIPS (zero-egress image, no pretrained
    weights) — the score is a deterministic relative perceptual distance,
    comparable across runs of this script, not comparable to published
    LPIPS(alex) numbers.
  * DIAGNOSTICS: after every stage, a callback writes
    QUALITY_r{N}_partial.json with wall-clock, learned-vs-GT exposure-sweep
    magnitudes/alignment and learned deltaT (inspect_checkpoint.
    diagnose_move) — a failed run now carries its own diagnosis. Note the
    sweep SIGN is unidentifiable from blur (averaging over the window is
    invariant to reversing the sweep), so alignment is meaningful up to
    sign; magnitudes are the primary signal.

num_exposure=9 matches the generator's num_blur_samples=9: with learned
deltaT == the data's exposure half-width, the model's sub-frame quadrature
coincides exactly with the points the observation was synthesized from —
the forward model can represent the observation exactly.

MoveModel schedule keeps the r3-proven rescale (accum_every 25->5, pose lr
5e-4 -> 1e-3): the reference cosine horizons (24*500 steps) presume its
real-data step counts; at this regression's 24-step epochs the unscaled
schedule reaches too few pose updates to move the heads (measured r3).

Writes QUALITY_r{round}.json at the repo root.

Usage:  python scripts/tpu_quality_regression.py [--small|--medium|--quick]
            [--round N] [--ablate-blur]
  --small: CPU-sized sanity run (reduced frames/res/epochs, no assert).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Under the axon boot path sitecustomize imports jax before our env is
# read, so JAX_PLATFORMS=cpu would be silently ignored and a "CPU" smoke
# run would contend with the real TPU. Honor it via the live config (the
# backend is not initialized yet at import time).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def psnr(a, b, mask=None):
    a = np.clip(np.asarray(a, np.float64), 0, 1)
    b = np.clip(np.asarray(b, np.float64), 0, 1)
    if mask is not None:
        m = np.asarray(mask, np.float64)[..., None]
        mse = float((((a - b) ** 2) * m).sum() / max(m.sum() * 3, 1e-9))
    else:
        mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--medium", action="store_true",
                    help="reduced-scale TPU debug tier (no artifact)")
    ap.add_argument("--quick", action="store_true",
                    help="full-size data, r3's 12x-shortened 60/32 epoch "
                         "schedule (writes the artifact; assert still on)")
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--work-dir", default="/tmp/deblur4dgs_quality_r4")
    ap.add_argument("--margin-db", type=float, default=1.0,
                    help="required fg-PSNR improvement over blurry input")
    ap.add_argument("--w-multires", type=float, default=None,
                    help="override LossesConfig.w_multires (default 1.0, "
                         "reference-faithful). The x4 consistency loss "
                         "pulls sharp renders toward downsampled blurry "
                         "inputs / phase-A guides — set 0 to ablate the "
                         "anti-sharp prior (VERDICT r3 item 1b)")
    ap.add_argument("--sharp-masks", action="store_true",
                    help="emit SHARP mid-exposure fg masks instead of the "
                         "default blur-union masks (the reference's real "
                         "masks are segmented from blurry frames and cover "
                         "the streaks; sharp masks penalize the correctly-"
                         "sweeping solution via the mask loss)")
    ap.add_argument("--resume", action="store_true",
                    help="restore finished/in-progress stages from "
                         "work_dir checkpoints (crash insurance for the "
                         "multi-hour ref-scale schedule; work_dir must "
                         "belong to THIS config)")
    ap.add_argument("--ablate-blur", action="store_true",
                    help="control run: SAME data/budget with blur synthesis"
                         " OFF (num_exposure=1 — a plain 4DGS fit of the"
                         " blurry frames, the paper's 'w/o blur modeling'"
                         " ablation). Writes QUALITY_r{N}_ablation.json; no"
                         " margin assert.")
    ap.add_argument("--sharp-supervision", action="store_true",
                    help="reconstruction-CEILING control (VERDICT r4 item"
                         " 2): identical scene/budget but RGB supervision ="
                         " the generator's SHARP frames (num_exposure=1,"
                         " sharp masks). The resulting fg PSNR is the best"
                         " this pipeline can do with NO blur in the data —"
                         " deblurring can only aspire to it. Writes"
                         " QUALITY_r{N}_ceiling.json; no margin assert.")
    args = ap.parse_args()
    assert not (args.ablate_blur and args.sharp_supervision), (
        "--ablate-blur and --sharp-supervision are distinct controls"
    )

    from deblur4dgs_tpu import pipeline as PL
    from deblur4dgs_tpu.configs import (
        LossesConfig,
        OptimizerConfig,
        RenderConfig,
        SceneLRConfig,
    )
    from deblur4dgs_tpu.data import synthetic
    from deblur4dgs_tpu.models.scene import render
    from scripts.inspect_checkpoint import diagnose_move

    # exp_shake: intra-exposure camera sweep (the reference data's dominant
    # blur source); exposure: object-motion sweep half-width in frame units.
    if args.small:
        T, wh = 8, (64, 48)
        num_fg, num_bg, blur_samples = 80, 200, 3
        num_tracks = num_fg
        scene_kw = dict(exp_shake=0.03, motion_cycles=1.0)
        cfg_kw = dict(
            num_fg=40, num_bg=100, num_motion_bases=2, static_epochs=2,
            dynamic_epochs=2, steps_per_epoch=2, initial_optim_iters=20,
            pose_opt_iters=4,
            render=RenderConfig(num_exposure=3, tile_cap=256,
                                use_pallas=False),
        )
    elif args.medium:
        T, wh = 8, (256, 144)
        num_fg, num_bg, blur_samples = 800, 4000, 7
        num_tracks = num_fg
        scene_kw = dict(exp_shake=0.02, motion_cycles=1.5)
        cfg_kw = dict(
            num_fg=600, num_bg=3500, num_motion_bases=4, static_epochs=30,
            dynamic_epochs=20, steps_per_epoch=16, initial_optim_iters=300,
            pose_opt_iters=50,
            render=RenderConfig(num_exposure=5, tile_cap=512,
                                use_pallas=True),
        )
    else:
        T, wh = 24, (512, 288)
        num_fg, num_bg, blur_samples = 2000, 9000, 9
        num_tracks = num_fg  # r4 fix: fg inits one gaussian per track
        # Blur composition (r4, VERDICT item 6): fg blur DOMINATED BY
        # OBJECT MOTION — exposure=0.7 sweeps the fg across 1.4 frame
        # units of its trajectory (0.7 sits INSIDE the model's deltaT
        # hinge prior [0.5, 0.75]; r3's 0.9 did not), while exp_shake=0.10
        # adds a realistic handheld camera sweep. r3's exp_shake=0.30
        # regime (~50-100 px of camera blur) is far beyond the reference's
        # real handheld data and runs into a capacity race this pipeline
        # never faces there: the zero-init MoveModel heads must predict
        # |se3|~0.45 sweeps, and the (correctly-sized, r4) gaussians
        # absorb the blur before the heads get there (measured in
        # QUALITY_r04 partials: window sweep_ratio collapsed 0.53 -> 0.09
        # when fg capacity was fixed). Object-motion blur has no such
        # race: sub-frame TIMES + motion bases invert it, and the GT
        # track loss + blur-union mask loss pin the fg to the true
        # trajectory — fg gaussians cannot paint the streaks without
        # violating both. Tracks/masks/depths are GT here, so blur
        # degrades only the RGB supervision — exactly the deblurring task.
        #
        # Trajectory regime: HIGH VELOCITY, LOW CURVATURE (amp 0.7 at
        # cycles 1.0: ~29 px/frame velocity, ~8 px/frame^2 accel). The
        # trainer's reference-faithful smoothness priors (w_smooth_tracks,
        # w_z_accel) penalize second differences; at the r4-first-attempt
        # cycles=3.0 the GT accel (~40 px) made the FLAT motion cheaper
        # than the true one (accel saving beat the track-L1 cost) and the
        # trained fg moved ~6 px/frame vs 42 GT. Real video lives in the
        # low-curvature regime these priors assume; the synthetic task
        # must too (see make_scene motion_amp doc).
        scene_kw = dict(exp_shake=0.10, motion_cycles=1.0, motion_amp=0.7,
                        exposure=0.7)
        lr_cfg = SceneLRConfig()
        lr_cfg.move.accum_every = 5
        lr_cfg.move.pose = 1e-3
        loss_cfg = LossesConfig(exposure_cons_start_epoch=3)
        if args.w_multires is not None:
            loss_cfg.w_multires = args.w_multires
        epochs = dict(static_epochs=60, dynamic_epochs=32,
                      initial_optim_iters=400, pose_opt_iters=200)
        if not args.quick:  # reference-scale schedule (the default)
            epochs = dict(static_epochs=400, dynamic_epochs=101,
                          initial_optim_iters=1000, pose_opt_iters=500)
        # tile_cap 2048 (r4, was 1024): union binning shares ONE tile list
        # across the 9 swept sub-frames, so blur windows oversubscribe the
        # caps a sharp render never would — the r4 quick run measured
        # stage-end tile_overflow 0.26 at x1 windows / 0.42 at x4 dynamicA
        # at cap 1024, i.e. a quarter of all tile-gaussian intersections
        # (concentrated in the dense fg tiles being scored) silently
        # dropped during training. The reference's gsplat lists are
        # unbounded; capacity truncation is OUR artifact and must be ~0 in
        # a quality run. Phase A additionally auto-scales to 4*cap
        # (PipelineConfig.tile_cap_x4).
        cfg_kw = dict(
            num_fg=2000, num_bg=8000, num_motion_bases=6,
            steps_per_epoch=24, lr=lr_cfg, losses=loss_cfg,
            lpips_weights="random",  # seeded untrained net; see module doc
            render=RenderConfig(num_exposure=9, tile_cap=2048,
                                use_pallas=True),
            **epochs,
        )

    print(f"generating synthetic blurry sequence T={T} wh={wh}...")
    t0 = time.time()
    scene_kw.setdefault("exposure", 0.45)
    sscene = synthetic.make_scene(
        seed=0, num_fg=num_fg, num_bg=num_bg, num_frames=T, img_wh=wh,
        cam_shake=0.03, **scene_kw,
    )
    # Dataset cache: generation is deterministic in its arguments and costs
    # ~5-25 min through the remote-TPU tunnel; reruns (training-recipe
    # iteration) reload the rendered arrays instead.
    # Ceiling control trains on sharp data — the consistent masks are the
    # sharp mid-exposure silhouettes (a real sharp-video pipeline would
    # segment those), not the blur-union streak covers.
    blur_union = not (args.sharp_masks or args.small or args.medium
                      or args.sharp_supervision)

    def _cache_path(bum: bool) -> str:
        key = (
            f"T{T}_w{wh[0]}x{wh[1]}_fg{num_fg}_bg{num_bg}_bs{blur_samples}_"
            f"nt{num_tracks}_" + ("bum_" if bum else "")
            + "_".join(f"{k}{v}" for k, v in sorted(scene_kw.items()))
        )
        return f"/tmp/d4_qualcache_{key}.npz"

    cache_path = _cache_path(blur_union)
    sibling = _cache_path(not blur_union)
    if not os.path.exists(cache_path) and os.path.exists(sibling):
        # Only the masks field differs between the two variants; convert
        # the sibling cache by re-rendering masks alone (~seconds) instead
        # of regenerating every blur-sample render (~minutes of TPU).
        z = np.load(sibling)
        masks = (
            synthetic.sharp_fg_masks(sscene)
            if not blur_union
            else None  # union-from-sharp needs the full sweep: regenerate
        )
        if masks is not None:
            fields = {k: np.asarray(z[k])
                      for k in synthetic.SyntheticDataset._fields}
            fields["masks"] = np.asarray(masks)
            np.savez(cache_path, **fields)
            print(f"  converted sibling cache {sibling} (masks re-rendered)")
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        sdata = synthetic.SyntheticDataset(
            **{k: jnp.asarray(z[k]) for k in synthetic.SyntheticDataset._fields}
        )
        print(f"  dataset loaded from cache {cache_path}")
    else:
        sdata = synthetic.generate_dataset(
            sscene, num_blur_samples=blur_samples,
            num_tracks=num_tracks,
            fast_renderer=not args.small,  # dense oracle too slow at scale
            blur_union_masks=blur_union,
        )
        np.savez(
            cache_path,
            **{k: np.asarray(getattr(sdata, k))
               for k in synthetic.SyntheticDataset._fields},
        )
    blurry_imgs = sdata.imgs  # the real blurry frames, for baseline metrics
    if args.sharp_supervision:
        # swap the training observations to the GT sharp frames; the val
        # split already serves sharp_imgs, so eval is unchanged. Baselines
        # below keep scoring the true blurry inputs via blurry_imgs.
        sdata = sdata._replace(imgs=sdata.sharp_imgs)
    train_ds = synthetic.SyntheticSceneAdapter(sscene, sdata, seed=0)
    val_ds = synthetic.SyntheticSceneAdapter(sscene, sdata, seed=0,
                                             split="val")
    blur_lvl = float(np.mean(
        [psnr(blurry_imgs[f], sdata.sharp_imgs[f]) for f in range(T)]
    ))
    blur_lvl_fg = float(np.mean([
        psnr(blurry_imgs[f], sdata.sharp_imgs[f], sdata.masks[f])
        for f in range(T)
    ]))
    print(f"  dataset in {time.time() - t0:.1f}s; blurry-vs-sharp "
          f"{blur_lvl:.2f} dB (fg {blur_lvl_fg:.2f} dB)")
    # a 'blurry' input indistinguishable from sharp (> ~38 dB) makes the
    # margin unmeasurable — the QUALITY_r03 first-run failure mode
    assert args.small or args.sharp_supervision or blur_lvl < 38.0, (
        f"synthetic blur too weak to measure deblurring: {blur_lvl:.1f} dB"
    )

    if args.ablate_blur or args.sharp_supervision:
        # blur synthesis off: one mid-exposure sample, nothing else changed
        cfg_kw["render"] = RenderConfig(
            num_exposure=1, tile_cap=cfg_kw["render"].tile_cap,
            use_pallas=cfg_kw["render"].use_pallas,
        )
        args.work_dir = args.work_dir + (
            "_ceiling" if args.sharp_supervision else "_ablation"
        )
    cfg = PL.PipelineConfig(
        work_dir=args.work_dir, validate_every=10_000, save_videos_every=0,
        optim=OptimizerConfig(warmup_steps=100, control_every=100),
        resume=args.resume, seed=0, **cfg_kw,
    )

    # ---- stage-end diagnostics: partial artifact a crash/timeout keeps ---
    suffix = ("_ceiling" if args.sharp_supervision
              else "_ablation" if args.ablate_blur
              else f"_wm{args.w_multires:g}" if args.w_multires is not None
              else "")
    if args.small or args.medium:  # debug tiers: keep partials off the repo
        os.makedirs(args.work_dir, exist_ok=True)
        partial_path = os.path.join(args.work_dir, "partial.json")
    else:
        partial_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"QUALITY_r{args.round:02d}{suffix}_partial.json",
        )
    stages: list[dict] = []
    t_start = time.time()

    def stage_callback(tag, scene, window):
        entry = {"stage": tag, "t_seconds": round(time.time() - t_start, 1)}
        frames = window if window is not None else list(range(T))
        t_off = frames[0]
        try:
            entry["move"] = {
                k: v
                for k, v in diagnose_move(
                    scene.move, sdata.w2cs, sscene.exp_deltas,
                    sscene.exposure, frames=frames, t_offset=t_off,
                ).items()
                if k != "frames"  # summary means only in the artifact
            }
        except Exception as e:  # diagnostics must never kill the run
            entry["move_error"] = str(e)[:200]
        # direct sharp renders at GT cameras over this stage's frames:
        # an unaligned fg-PSNR trend across stages (diagnostic only)
        if window is not None:
            try:
                fg_p, fg_b = [], []
                for f in frames:
                    out = render(
                        scene, f - t_off, jnp.asarray(sdata.w2cs[f]),
                        jnp.asarray(sdata.Ks[f]), wh, mode="mid",
                        stage="second", num_exposure=cfg.render.num_exposure,
                        cap=cfg.render.tile_cap,
                        use_pallas=cfg.render.use_pallas,
                    )
                    fg_p.append(psnr(out["img"], sdata.sharp_imgs[f],
                                     sdata.masks[f]))
                    fg_b.append(psnr(blurry_imgs[f], sdata.sharp_imgs[f],
                                     sdata.masks[f]))
                entry["direct_fg_psnr"] = round(float(np.mean(fg_p)), 3)
                entry["direct_blurry_fg_psnr"] = round(float(np.mean(fg_b)), 3)
            except Exception as e:
                entry["render_error"] = str(e)[:200]
        stages.append(entry)
        with open(partial_path, "w") as f:
            json.dump({"round": args.round, "config_tier":
                       ("quick" if args.quick else "ref-scale"),
                       "stages": stages}, f, indent=2)
        print(f"[stage {tag}] {json.dumps(entry)}", flush=True)

    t0 = time.time()
    sceneA, window_scenes, metrics, slides = PL.train_low(
        train_ds, val_ds, cfg, stage_callback=stage_callback,
    )
    train_s = time.time() - t0
    print(f"train_low in {train_s:.1f}s; pose-opt metrics: "
          f"{ {k: float(v) for k, v in metrics.items()} }")

    # PRIMARY score — the reference's own protocol (run_testing.py +
    # run_compute_metrics.py): test-time pose-optimized renders vs SHARP
    # held-out GT (the val adapter serves sharp_imgs), aggregated over
    # globally odd-indexed frames. train_low already ran it
    # (run_testing_windows); `metrics` holds the result. The matched
    # baseline is the blurry input scored against the same sharp GT on
    # the same odd frames.
    odd = [f for f in range(T) if f % 2 == 1]
    base_psnr = float(np.mean(
        [psnr(blurry_imgs[f], sdata.sharp_imgs[f]) for f in odd]
    ))
    base_fg = float(np.mean([
        psnr(blurry_imgs[f], sdata.sharp_imgs[f], sdata.masks[f])
        for f in odd
    ]))
    deblur_psnr_opt = float(metrics["val/psnr"])
    deblur_fg_opt = float(metrics["val/fg_psnr"])

    # SECONDARY diagnostic — direct renders at the GT cameras without pose
    # alignment: each frame rendered sharp (mode='mid') by the window model
    # owning it. This understates quality by whatever world-frame drift
    # training absorbed (the drift test-time pose opt exists to remove,
    # run_testing.py:131-204); reported for transparency, not asserted.
    # Frame ownership reuses the pipeline's val_partition (the same slicing
    # run_testing_windows applies, run_compute_metrics.py:36-52 parity)
    # instead of re-deriving the window bounds here.
    owners = {}
    n_win = len(window_scenes)
    slices = PL.val_partition(T, n_win, T)
    for wid in sorted(window_scenes, key=int):
        w = int(wid)
        scene_w, window = window_scenes[wid]
        lo, hi = slices[w]
        for f in range(lo, hi):
            owners[f] = (scene_w, window)

    W, H = wh
    blur_psnrs, deblur_psnrs = [], []
    blur_fg, deblur_fg = [], []
    for f in range(T):
        scene_w, window = owners[f]
        t_local = int(np.clip(f - window[0], 0, len(window) - 1))
        out = render(
            scene_w, t_local, jnp.asarray(sdata.w2cs[f]),
            jnp.asarray(sdata.Ks[f]), wh, mode="mid", stage="second",
            num_exposure=cfg.render.num_exposure, cap=cfg.render.tile_cap,
            use_pallas=cfg.render.use_pallas,
        )
        gt = sdata.sharp_imgs[f]
        mask = sdata.masks[f]
        blur_psnrs.append(psnr(blurry_imgs[f], gt))
        deblur_psnrs.append(psnr(out["img"], gt))
        blur_fg.append(psnr(blurry_imgs[f], gt, mask))
        deblur_fg.append(psnr(out["img"], gt, mask))

    result = {
        "round": args.round,
        "T": T, "img_wh": list(wh),
        "train_seconds": round(train_s, 1),
        # primary: pose-opt renders vs sharp GT, held-out odd frames
        # (reference protocol) against the blurry input on the same frames
        "blurry_input_psnr": round(base_psnr, 3),
        "deblurred_psnr": round(deblur_psnr_opt, 3),
        "blurry_input_fg_psnr": round(base_fg, 3),
        "deblurred_fg_psnr": round(deblur_fg_opt, 3),
        "improvement_db": round(deblur_psnr_opt - base_psnr, 3),
        "fg_improvement_db": round(deblur_fg_opt - base_fg, 3),
        # secondary: unaligned direct renders at GT cameras, all frames
        "direct_render_psnr": round(float(np.mean(deblur_psnrs)), 3),
        "direct_render_fg_psnr": round(float(np.mean(deblur_fg)), 3),
        "direct_blurry_psnr": round(float(np.mean(blur_psnrs)), 3),
        "direct_blurry_fg_psnr": round(float(np.mean(blur_fg)), 3),
        "pose_opt_metrics": {k: float(v) for k, v in metrics.items()},
        "stage_diagnostics": stages,
        "backend": jax.default_backend(),
        "config": {
            "static_epochs": cfg.static_epochs,
            "dynamic_epochs": cfg.dynamic_epochs,
            "num_exposure": cfg.render.num_exposure,
            "tile_cap": cfg.render.tile_cap,
            "pose_opt_iters": cfg.pose_opt_iters,
            "num_tracks": num_tracks,
            "lpips_weights": cfg_kw.get("lpips_weights"),
            "w_multires": cfg.losses.w_multires,
            "blur_union_masks": blur_union,
            "scene_kw": {k: v for k, v in sorted(scene_kw.items())},
        },
    }
    result["dataset_blur_psnr"] = round(blur_lvl, 3)
    result["dataset_blur_fg_psnr"] = round(blur_lvl_fg, 3)
    if args.sharp_supervision:
        # the number this control exists to produce: the pipeline's
        # reconstruction ceiling under sharp supervision (pose-opt protocol)
        result["ceiling_fg_psnr"] = result["deblurred_fg_psnr"]
        result["ceiling_psnr"] = result["deblurred_psnr"]
    print(json.dumps(result, indent=2))
    if not (args.small or args.medium):
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"QUALITY_r{args.round:02d}{suffix}.json",
        )
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_path}")
        if args.ablate_blur or args.sharp_supervision:
            return
        assert result["fg_improvement_db"] > args.margin_db, (
            f"deblurred fg PSNR must beat the blurry input by "
            f">{args.margin_db} dB, got {result['fg_improvement_db']}"
        )
        print("QUALITY REGRESSION PASSED")


if __name__ == "__main__":
    main()
