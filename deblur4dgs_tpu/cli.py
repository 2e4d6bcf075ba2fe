"""Command-line entry points (counterpart of /root/reference/train_low.py,
train_high.py, run_training_static/dynamic.py, run_testing.py,
run_compute_metrics.py — argparse instead of tyro, one process instead of
four os.system stages).

Usage:
  python -m deblur4dgs_tpu train --data-dir <scene>/x1 --work-dir out \
      [--high-res] [--epochs-static 400] [--epochs-dynamic 101]
  python -m deblur4dgs_tpu metrics --result-dir ... --gt-dir ...
  python -m deblur4dgs_tpu view --checkpoint ... --port 8890
"""

from __future__ import annotations

import argparse
import json
import os


def _add_train(sub):
    p = sub.add_parser("train", help="staged train_low/train_high pipeline")
    p.add_argument("--data-dir", required=True)
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


def _add_metrics(sub):
    p = sub.add_parser("metrics", help="PSNR/SSIM over rendered results")
    p.add_argument("--result-dir", required=True)
    p.add_argument("--gt-dir", required=True)


def _add_view(sub):
    p = sub.add_parser("view", help="interactive browser viewer")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--port", type=int, default=8890)
    p.add_argument("--num-frames", type=int, required=True)


def main(argv=None):
    parser = argparse.ArgumentParser("deblur4dgs_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_train(sub)
    _add_metrics(sub)
    _add_view(sub)
    args = parser.parse_args(argv)

    if args.cmd == "train":
        from tensorboardX import SummaryWriter

        from deblur4dgs_tpu import pipeline as PL
        from deblur4dgs_tpu.configs import RenderConfig
        from deblur4dgs_tpu.data.stereo import StereoDataConfig, StereoDataset

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
            render=RenderConfig(
                num_exposure=args.num_exposure,
                tile_cap=args.tile_cap,
                use_pallas=not args.no_pallas,
            ),
            seed=args.seed,
        )
        writer = SummaryWriter(args.work_dir)
        scene, metrics, slides = PL.train_low(train_ds, val_ds, cfg, writer)
        print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
        with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)

    elif args.cmd == "metrics":
        from deblur4dgs_tpu.pipeline import compute_scene_metrics

        print(json.dumps(
            compute_scene_metrics(args.result_dir, args.gt_dir), indent=2
        ))

    elif args.cmd == "view":
        print(
            "Viewer requires a checkpoint template; use the python API:\n"
            "  from deblur4dgs_tpu.vis.renderer import Renderer\n"
            "  from deblur4dgs_tpu.vis.viewer import DynamicViewer\n"
            "  r = Renderer.init_from_checkpoint(path, template, T)\n"
            "  DynamicViewer(r.render_fn, T, port=...).serve_forever(False)"
        )


if __name__ == "__main__":
    main()
