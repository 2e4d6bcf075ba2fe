"""Decompose a finished quality run's fg deficit: observation fit vs sharpness.

Given the ceiling result (QUALITY_r05_ceiling: 29.99 dB fg under sharp
supervision — the fit mechanism is sound), the full model's remaining
deficit must live in the blur inversion. Two distinct failure modes are
indistinguishable from the headline number alone:

  (a) the model does not even FIT the blurry observations it trains on
      (optimization starves in the dynamic stages), or
  (b) it fits them well but explains the blur with the WRONG latent
      structure (mushy fg + some sweep reproduces the observation as well
      as sharp fg + true sweep — an inversion ambiguity the priors were
      supposed to break).

This probe renders each frame's owning window model BOTH ways and scores:
    blury-mode render  vs the blurry observation  (training-fit quality)
    mid-mode render    vs the sharp GT            (deblur quality)

High blury-fit + low sharp = (b); low blury-fit = (a).

Usage: python scripts/fit_decompose_probe.py --work-dir /tmp/deblur4dgs_quality_r5 \
           [--cache /tmp/d4_qualcache_....npz] [--round 5]
Writes FIT_DECOMPOSE_r{N}.json at the repo root.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

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
    ap.add_argument("--work-dir", default="/tmp/deblur4dgs_quality_r5")
    ap.add_argument("--cache", default=None,
                    help="dataset cache npz; default: the ref-tier bum key")
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--num-exposure", type=int, default=9)
    ap.add_argument("--tile-cap", type=int, default=2048)
    args = ap.parse_args()

    from deblur4dgs_tpu import pipeline as PL
    from deblur4dgs_tpu.models.scene import render
    from scripts.inspect_checkpoint import load_scene

    cache = args.cache or (
        "/tmp/d4_qualcache_T24_w512x288_fg2000_bg9000_bs9_nt2000_bum_"
        "exp_shake0.1_exposure0.7_motion_amp0.7_motion_cycles1.0.npz"
    )
    z = np.load(cache)
    imgs, sharp, masks = z["imgs"], z["sharp_imgs"], z["masks"]
    w2cs, Ks = z["w2cs"], z["Ks"]
    T, H, W = imgs.shape[:3]

    win_dirs = sorted(glob.glob(os.path.join(args.work_dir, "ckpts", "win_*")))
    assert win_dirs, f"no window checkpoints under {args.work_dir}"
    wins = []
    for d in win_dirs:
        tag = os.path.basename(d)  # win_AABB -> frames [AA, BB)
        lo, hi = int(tag[4:6]), int(tag[6:8])
        scene, _, _ = load_scene(os.path.join(d, "last"))
        wins.append((lo, hi, scene))

    slices = PL.val_partition(T, len(wins), T)
    owners = {}
    for w, (lo_s, hi_s) in enumerate(slices):
        for f in range(lo_s, hi_s):
            owners[f] = wins[w]

    rows = []
    for f in range(T):
        lo, hi, scene = owners[f]
        t_local = int(np.clip(f - lo, 0, (hi - lo) - 1))
        out = {}
        for mode in ("blury", "mid"):
            out[mode] = render(
                scene, t_local, jnp.asarray(w2cs[f]), jnp.asarray(Ks[f]),
                (W, H), mode=mode, stage="second",
                num_exposure=args.num_exposure, cap=args.tile_cap,
                use_pallas=True,
            )["img"]
        rows.append({
            "frame": f,
            "blurfit_psnr": round(psnr(out["blury"], imgs[f]), 3),
            "blurfit_fg_psnr": round(psnr(out["blury"], imgs[f], masks[f]), 3),
            "sharp_psnr": round(psnr(out["mid"], sharp[f]), 3),
            "sharp_fg_psnr": round(psnr(out["mid"], sharp[f], masks[f]), 3),
        })
        print(rows[-1], flush=True)

    def mean(k):
        return round(float(np.mean([r[k] for r in rows])), 3)

    result = {
        "round": args.round,
        "work_dir": args.work_dir,
        "mean_blurfit_psnr": mean("blurfit_psnr"),
        "mean_blurfit_fg_psnr": mean("blurfit_fg_psnr"),
        "mean_sharp_psnr": mean("sharp_psnr"),
        "mean_sharp_fg_psnr": mean("sharp_fg_psnr"),
        "frames": rows,
        "backend": jax.default_backend(),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"FIT_DECOMPOSE_r{args.round:02d}.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "frames"},
                     indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
