"""Command-line entry points (counterpart of /root/reference/train_low.py,
train_high.py, run_training_static/dynamic.py, run_testing.py,
run_compute_metrics.py — argparse instead of tyro, one process instead of
four os.system stages).

Usage:
  python -m deblur4dgs_tpu train --data-dir <scene>/x1 --work-dir out \
      [--high-res] [--epochs-static 400] [--epochs-dynamic 101]
  python -m deblur4dgs_tpu metrics --result-dir ... --gt-dir ...
  python -m deblur4dgs_tpu view --checkpoint ... --num-frames T \
      --num-fg N --num-bg M [--port 8890]
  python -m deblur4dgs_tpu render-path --checkpoint ... --num-frames T \
      --num-fg N --num-bg M --keyframes kf.json --out path.mp4
"""

from __future__ import annotations

import argparse
import json
import os


def _add_train(sub):
    p = sub.add_parser("train", help="staged train_low/train_high pipeline")
    p.add_argument("--data-dir", default=None,
                   help="scene dir (required unless --synthetic)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--high-res", action="store_true",
                   help="720x1280 (no /2.5 intrinsics scaling)")
    p.add_argument("--num-fg", type=int, default=40_000)
    p.add_argument("--num-bg", type=int, default=100_000)
    p.add_argument("--num-motion-bases", type=int, default=10)
    p.add_argument("--epochs-static", type=int, default=400)
    p.add_argument("--epochs-dynamic", type=int, default=101)
    p.add_argument("--steps-per-epoch", type=int, default=24)
    p.add_argument("--num-exposure", type=int, default=11)
    p.add_argument("--tile-cap", type=int, default=1024)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--validate-every", type=int, default=100)
    p.add_argument("--save-videos-every", type=int, default=50)
    p.add_argument("--pose-opt-iters", type=int, default=500)
    p.add_argument("--flow-weights", default=None,
                   help="PWC-Net .pth for the exposure-consistency loss")
    p.add_argument("--lpips-weights", default=None,
                   help="LPIPS 'backbone.pth,lins.pth' for metrics")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing stage checkpoints")
    p.add_argument("--viewer-port", type=int, default=None,
                   help="serve a live training viewer on this port")
    p.add_argument(
        "--synthetic", action="store_true",
        help="train on a generated synthetic blurry scene instead of a "
        "Shape-of-Motion data dir (smoke/regression runs)",
    )
    p.add_argument("--synthetic-frames", type=int, default=8)
    p.add_argument("--synthetic-wh", type=int, nargs=2, default=(64, 48))
    p.add_argument("--initial-optim-iters", type=int, default=1000)
    p.add_argument("--num-windows", type=int, default=None,
                   help="override phase-B window count (default ceil(T/5))")


def _add_metrics(sub):
    p = sub.add_parser("metrics", help="PSNR/SSIM over rendered results")
    p.add_argument("--result-dir", required=True,
                   help="flat render dir, or a results/ root containing "
                   "per-window win_*/rgb_test_optim dirs")
    p.add_argument("--gt-dir", default=None,
                   help="GT frames; defaults to colocated *_gt.png files")
    p.add_argument("--lpips-weights", default=None,
                   help="LPIPS 'backbone.pth,lins.pth' (optional)")


def _add_ckpt_args(p):
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-frames", type=int, required=True)
    p.add_argument("--num-fg", type=int, required=True,
                   help="fg Gaussian capacity of the checkpoint")
    p.add_argument("--num-bg", type=int, required=True)
    p.add_argument("--num-motion-bases", type=int, default=10)


def _add_view(sub):
    p = sub.add_parser("view", help="interactive browser viewer")
    _add_ckpt_args(p)
    p.add_argument("--port", type=int, default=8890)


def _add_render_path(sub):
    p = sub.add_parser(
        "render-path",
        help="render a keyframed camera path to a video "
        "(counterpart of the reference's viser render tab)",
    )
    _add_ckpt_args(p)
    p.add_argument(
        "--keyframes", required=True,
        help="JSON file: [{c2w: 4x4 list, fov?: rad, time?: frame}, ...]",
    )
    p.add_argument("--out", required=True, help="output video path")
    p.add_argument("--path-frames", type=int, default=120)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--loop", action="store_true")
    p.add_argument("--tension", type=float, default=0.0)


def _load_renderer(args):
    from deblur4dgs_tpu.train.checkpoints import template_state
    from deblur4dgs_tpu.vis.renderer import Renderer

    template = template_state(
        args.num_fg, args.num_bg, args.num_motion_bases, args.num_frames
    )
    return Renderer.init_from_checkpoint(
        args.checkpoint, template, args.num_frames
    )


def main(argv=None):
    parser = argparse.ArgumentParser("deblur4dgs_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_train(sub)
    _add_metrics(sub)
    _add_view(sub)
    _add_render_path(sub)
    args = parser.parse_args(argv)

    if args.cmd == "train":
        from tensorboardX import SummaryWriter

        from deblur4dgs_tpu import pipeline as PL
        from deblur4dgs_tpu.configs import RenderConfig

        if not args.synthetic and args.data_dir is None:
            parser.error("train: --data-dir is required unless --synthetic")
        if args.synthetic:
            from deblur4dgs_tpu.data import synthetic

            sscene = synthetic.make_scene(
                seed=args.seed, num_frames=args.synthetic_frames,
                img_wh=tuple(args.synthetic_wh),
            )
            sdata = synthetic.generate_dataset(sscene)
            train_ds = synthetic.SyntheticSceneAdapter(
                sscene, sdata, seed=args.seed
            )
            val_ds = synthetic.SyntheticSceneAdapter(
                sscene, sdata, seed=args.seed, split="val"
            )
        else:
            from deblur4dgs_tpu.data.stereo import (
                StereoDataConfig,
                StereoDataset,
            )

            train_ds = StereoDataset(
                StereoDataConfig(
                    data_dir=args.data_dir,
                    intrinsics_scale=1.0 if args.high_res else 2.5,
                    seed=args.seed,
                )
            )
            val_ds = StereoDataset(
                StereoDataConfig(
                    data_dir=args.data_dir, split="val",
                    intrinsics_scale=1.0 if args.high_res else 2.5,
                    seed=args.seed,
                ),
                scene_norm=train_ds.scene_norm,
            )
        cfg = PL.PipelineConfig(
            work_dir=args.work_dir,
            num_fg=args.num_fg,
            num_bg=args.num_bg,
            num_motion_bases=args.num_motion_bases,
            static_epochs=args.epochs_static,
            dynamic_epochs=args.epochs_dynamic,
            steps_per_epoch=args.steps_per_epoch,
            initial_optim_iters=args.initial_optim_iters,
            validate_every=args.validate_every,
            save_videos_every=args.save_videos_every,
            pose_opt_iters=args.pose_opt_iters,
            flow_weights=args.flow_weights,
            lpips_weights=args.lpips_weights,
            resume=not args.no_resume,
            render=RenderConfig(
                num_exposure=args.num_exposure,
                tile_cap=args.tile_cap,
                use_pallas=not args.no_pallas,
            ),
            seed=args.seed,
        )
        writer = SummaryWriter(args.work_dir)
        viewer = None
        if args.viewer_port is not None:
            from deblur4dgs_tpu.vis.viewer import TrainingViewer

            viewer = TrainingViewer(
                len(train_ds), port=args.viewer_port,
                num_exposure=args.num_exposure, cap=args.tile_cap,
                use_pallas=not args.no_pallas, work_dir=args.work_dir,
            )
            viewer.serve_forever(background=True)
            print(f"live viewer on http://0.0.0.0:{args.viewer_port}")
        sceneA, window_scenes, metrics, slides = PL.train_low(
            train_ds, val_ds, cfg, writer,
            num_phaseB_windows=args.num_windows, viewer=viewer,
        )
        print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
        with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)

    elif args.cmd == "metrics":
        from deblur4dgs_tpu.pipeline import (
            PipelineConfig,
            compute_scene_metrics,
            make_lpips_fn,
        )

        lpips_fn = make_lpips_fn(
            PipelineConfig(work_dir="", lpips_weights=args.lpips_weights)
        )
        print(json.dumps(
            compute_scene_metrics(
                args.result_dir, args.gt_dir, lpips_fn=lpips_fn
            ),
            indent=2,
        ))

    elif args.cmd == "view":
        from deblur4dgs_tpu.vis.viewer import DynamicViewer

        renderer = _load_renderer(args)
        print(f"serving on http://0.0.0.0:{args.port}")
        DynamicViewer(
            renderer.render_fn, args.num_frames, port=args.port
        ).serve_forever(background=False)

    elif args.cmd == "render-path":
        import numpy as np

        from deblur4dgs_tpu.vis.render_panel import (
            Keyframe,
            render_camera_path,
        )

        renderer = _load_renderer(args)
        with open(args.keyframes) as f:
            kf_json = json.load(f)
        keyframes = [
            Keyframe(
                c2w=np.asarray(k["c2w"], np.float32),
                fov=float(k.get("fov", np.pi / 3)),
                time=k.get("time"),
            )
            for k in kf_json
        ]
        _, video = render_camera_path(
            renderer.render_fn, keyframes, (args.width, args.height),
            num_frames=args.path_frames, out_path=args.out, fps=args.fps,
            loop=args.loop, tension=args.tension,
            num_scene_frames=args.num_frames,
        )
        print(json.dumps({"video": video, "frames": args.path_frames}))


if __name__ == "__main__":
    main()
