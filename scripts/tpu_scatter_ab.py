"""Scatter-output window path: compiled-TPU equivalence + step-time A/B.

Round-3 landing of PERF.md's proven prefetch-output lever
(scripts/tpu_proto_prefetch_out.py): bucket kernels write the shared
image-tile-ordered buffer directly (prefetched tile_ids index maps +
input_output_aliases), deleting the inverse-permutation gather + bucket
concat. CPU interpret-mode equality is covered by
tests/test_bucketing.py::test_scatter_output_path_matches_gather; this
script checks the COMPILED Mosaic path on hardware and measures the
full-bench-shape step both ways.

Usage: python scripts/tpu_scatter_ab.py [--equiv-only]
"""

import argparse
import importlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_equivalence():
    import deblur4dgs_tpu.ops.rasterize as R
    from deblur4dgs_tpu.models.gaussians import Gaussians
    from deblur4dgs_tpu.models.motion_bases import MotionBases
    from deblur4dgs_tpu.models.move_model import init_move_model
    from deblur4dgs_tpu.models.scene import SceneModel, render

    rng = np.random.default_rng(0)
    n_fg, n_bg = 2000, 3000

    def gauss(n, coefs):
        means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        means[:, 2] = rng.uniform(1.5, 5.0, n)
        return Gaussians(
            means=jnp.asarray(means),
            quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
            scales=jnp.asarray(
                rng.uniform(-5, -3.5, (n, 3)).astype(np.float32)
            ),
            colors=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            opacities=jnp.full((n,), 1.0, jnp.float32),
            motion_coefs=(
                jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
                if coefs else None
            ),
            alive=jnp.ones((n,), jnp.float32),
        )

    ident6 = jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), (8, 8, 1))
    scene = SceneModel(
        fg=gauss(n_fg, True), bg=gauss(n_bg, False),
        bases=MotionBases(
            rots=ident6,
            transls=0.05 * jnp.asarray(
                rng.normal(size=(8, 8, 3)).astype(np.float32)
            ),
        ),
        move=init_move_model(jax.random.PRNGKey(0), num_frames=8),
    )
    W, H = 512, 288
    K = jnp.array([[420.0, 0, W / 2], [0, 420.0, H / 2], [0, 0, 1.0]])
    kw = dict(
        mode="blury", num_exposure=5, cap=512, bucketed=True,
        return_mask=True, return_depth=True, use_pallas=True,
    )

    def run(use_scatter):
        R._USE_SCATTER = use_scatter

        @jax.jit
        def fwd(s):
            return render(s, 3, jnp.eye(4), K, (W, H), **kw)

        out = fwd(scene)

        @jax.jit
        def loss(means):
            s = scene._replace(fg=scene.fg._replace(means=means))
            o = render(s, 3, jnp.eye(4), K, (W, H), **kw)
            return (
                jnp.sum(o["img"] ** 2) + jnp.sum(o["mask"])
                + jnp.sum(o["exposure_imgs"][0])
            )

        g = jax.grad(loss)(scene.fg.means)
        return out, g

    (a, ga), (b, gb) = run(True), run(False)
    ok = True
    for k in ("img", "mask", "depth", "acc", "exposure_imgs",
              "exposure_masks", "pred_sharp_img"):
        d = float(jnp.abs(a[k] - b[k]).max())
        print(f"  {k}: max|scatter-gather| = {d:.3e}")
        ok &= d < 1e-5
    gd = float(jnp.abs(ga - gb).max())
    rel = gd / (float(jnp.abs(gb).max()) + 1e-12)
    print(f"  grad: max diff {gd:.3e} (rel {rel:.3e})")
    ok &= rel < 1e-4
    print(f"equivalence (compiled, {jax.default_backend()}): "
          f"{'OK' if ok else 'FAILED'}")
    return ok


def bench_once(env_val):
    env = dict(os.environ, D4_SCATTER=env_val)
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [ln for ln in r.stderr.splitlines() if "sustained step" in ln]
    print(f"D4_SCATTER={env_val}: "
          f"{line[0] if line else r.stdout.strip() or r.stderr[-400:]}")
    out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    return out[0] if out else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--equiv-only", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    ok = check_equivalence()
    print(f"(equivalence in {time.time() - t0:.0f}s)")
    if not ok:
        sys.exit(1)
    if args.equiv_only:
        return
    print("bench A/B (full 720p train step):")
    bench_once("0")
    bench_once("1")


if __name__ == "__main__":
    main()
