"""End-to-end deblur-quality regression on real TPU hardware.

VERDICT r1 item 5: generate a realistic synthetic blurry sequence (camera
shake + object motion), run the FULL staged train_low pipeline, and assert
the deblurred sharp renders beat the blurry inputs against the ground-truth
sharp frames by a fixed margin. This is the proxy for the unavailable
real-scene parity target (BASELINE.md): the reference establishes quality
by PSNR/SSIM on held-out frames (run_compute_metrics.py); here the
synthetic generator gives us true sharp frames to score against directly.

Writes QUALITY_r{round}.json at the repo root.

Usage:  python scripts/tpu_quality_regression.py [--small] [--round N]
  --small: CPU-sized sanity run (reduced frames/res/epochs, no assert).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--work-dir", default="/tmp/deblur4dgs_quality")
    ap.add_argument("--margin-db", type=float, default=1.0,
                    help="required fg-PSNR improvement over blurry input")
    ap.add_argument("--ablate-blur", action="store_true",
                    help="control run: SAME data/budget with blur synthesis"
                         " OFF (num_exposure=1 — a plain 4DGS fit of the"
                         " blurry frames, the paper's 'w/o blur modeling'"
                         " ablation). Writes QUALITY_r{N}_ablation.json; no"
                         " margin assert.")
    args = ap.parse_args()

    from deblur4dgs_tpu import pipeline as PL
    from deblur4dgs_tpu.configs import OptimizerConfig, RenderConfig
    from deblur4dgs_tpu.data import synthetic
    from deblur4dgs_tpu.models.scene import render

    # exp_shake: intra-exposure camera sweep (the reference data's dominant
    # blur source). 0.02 rad/units at f~460 px => ~10 px of camera blur.
    if args.small:
        T, wh = 8, (64, 48)
        num_fg, num_bg, blur_samples = 80, 200, 3
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
        # Severe blur — the reference's target regime (heavily smeared
        # video). exp_shake=0.30 (camera sweep, fg+bg) + exposure=0.9
        # (object motion across the exposure window — fg-specific blur,
        # where the asserted margin is measured) put the blurry input well
        # below the 60/30-epoch reconstruction ceiling (~21-25 dB even on
        # sharp data; r03 run history: 0.02 shake -> 33 dB inputs, 0.10 ->
        # 23.6 dB, both at/above the ceiling — unmeasurable margin).
        # Tracks/masks/depths are GT here, so heavier blur degrades only
        # the RGB supervision — exactly the deblurring task.
        scene_kw = dict(exp_shake=0.30, motion_cycles=3.0, exposure=0.9)
        # The reference's MoveModel schedule presumes 400-epoch stages:
        # pose heads gate open after epoch 20 (5%) and step every 25
        # accumulated grads (~380 updates). Rescaled to this 60-epoch
        # regression so the exposure trajectory actually trains (~270
        # updates) instead of the gaussians absorbing the blur — the r03
        # second-run failure mode (renders matched the blurry input 4.5 dB
        # better than the sharp GT).
        from deblur4dgs_tpu.configs import LossesConfig, SceneLRConfig

        lr_cfg = SceneLRConfig()
        lr_cfg.move.accum_every = 5
        lr_cfg.move.pose = 1e-3
        loss_cfg = LossesConfig(exposure_cons_start_epoch=3)
        cfg_kw = dict(
            num_fg=2000, num_bg=8000, num_motion_bases=6, static_epochs=60,
            dynamic_epochs=32, steps_per_epoch=24, initial_optim_iters=400,
            pose_opt_iters=200, lr=lr_cfg, losses=loss_cfg,
            render=RenderConfig(num_exposure=7, tile_cap=1024,
                                use_pallas=True),
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
    cache_key = (
        f"T{T}_w{wh[0]}x{wh[1]}_fg{num_fg}_bg{num_bg}_bs{blur_samples}_"
        + "_".join(f"{k}{v}" for k, v in sorted(scene_kw.items()))
    )
    cache_path = f"/tmp/d4_qualcache_{cache_key}.npz"
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        sdata = synthetic.SyntheticDataset(
            **{k: jnp.asarray(z[k]) for k in synthetic.SyntheticDataset._fields}
        )
        print(f"  dataset loaded from cache {cache_path}")
    else:
        sdata = synthetic.generate_dataset(
            sscene, num_blur_samples=blur_samples,
            num_tracks=min(128, num_fg),
            fast_renderer=not args.small,  # dense oracle too slow at scale
        )
        np.savez(
            cache_path,
            **{k: np.asarray(getattr(sdata, k))
               for k in synthetic.SyntheticDataset._fields},
        )
    train_ds = synthetic.SyntheticSceneAdapter(sscene, sdata, seed=0)
    val_ds = synthetic.SyntheticSceneAdapter(sscene, sdata, seed=0,
                                             split="val")
    blur_lvl = float(np.mean(
        [psnr(sdata.imgs[f], sdata.sharp_imgs[f]) for f in range(T)]
    ))
    blur_lvl_fg = float(np.mean([
        psnr(sdata.imgs[f], sdata.sharp_imgs[f], sdata.masks[f])
        for f in range(T)
    ]))
    print(f"  dataset in {time.time() - t0:.1f}s; blurry-vs-sharp "
          f"{blur_lvl:.2f} dB (fg {blur_lvl_fg:.2f} dB)")
    # a 'blurry' input indistinguishable from sharp (> ~38 dB) makes the
    # margin unmeasurable — the QUALITY_r03 first-run failure mode
    assert args.small or blur_lvl < 38.0, (
        f"synthetic blur too weak to measure deblurring: {blur_lvl:.1f} dB"
    )

    if args.ablate_blur:
        # blur synthesis off: one mid-exposure sample, nothing else changed
        cfg_kw["render"] = RenderConfig(
            num_exposure=1, tile_cap=cfg_kw["render"].tile_cap,
            use_pallas=cfg_kw["render"].use_pallas,
        )
        args.work_dir = args.work_dir + "_ablation"
    cfg = PL.PipelineConfig(
        work_dir=args.work_dir, validate_every=10_000, save_videos_every=0,
        optim=OptimizerConfig(warmup_steps=100, control_every=100),
        resume=False, seed=0, **cfg_kw,
    )

    t0 = time.time()
    sceneA, window_scenes, metrics, slides = PL.train_low(
        train_ds, val_ds, cfg
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
        [psnr(sdata.imgs[f], sdata.sharp_imgs[f]) for f in odd]
    ))
    base_fg = float(np.mean([
        psnr(sdata.imgs[f], sdata.sharp_imgs[f], sdata.masks[f])
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
        blur_psnrs.append(psnr(sdata.imgs[f], gt))
        deblur_psnrs.append(psnr(out["img"], gt))
        blur_fg.append(psnr(sdata.imgs[f], gt, mask))
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
        "backend": jax.default_backend(),
        "config": {
            "static_epochs": cfg.static_epochs,
            "dynamic_epochs": cfg.dynamic_epochs,
            "num_exposure": cfg.render.num_exposure,
            "tile_cap": cfg.render.tile_cap,
            "pose_opt_iters": cfg.pose_opt_iters,
        },
    }
    result["dataset_blur_psnr"] = round(blur_lvl, 3)
    result["dataset_blur_fg_psnr"] = round(blur_lvl_fg, 3)
    print(json.dumps(result, indent=2))
    if not (args.small or args.medium):
        suffix = "_ablation" if args.ablate_blur else ""
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"QUALITY_r{args.round:02d}{suffix}.json",
        )
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_path}")
        if args.ablate_blur:
            return
        assert result["fg_improvement_db"] > args.margin_db, (
            f"deblurred fg PSNR must beat the blurry input by "
            f">{args.margin_db} dB, got {result['fg_improvement_db']}"
        )
        print("QUALITY REGRESSION PASSED")


if __name__ == "__main__":
    main()
