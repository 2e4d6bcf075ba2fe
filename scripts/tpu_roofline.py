"""Speed-of-light accounting for the window-compositor bands (VERDICT r3 #5).

Replaces the estimated `vs_baseline` ratio with committed arithmetic: a
FLOP/pass model of the Pallas window kernels at the exact bench shape
(bench.py: 720x1280, 40k fg + 60k bg, S=11 sub-frames, tile_cap 1024),
the measured per-chip matmul ceiling, and the achieved fraction for each
band of the step breakdown in docs/PERF.md.

Model (from ops/rasterize.py kernel bodies; counts verified against the
grids this script rebuilds):

  * One *body* = one (tile, sub-frame, 128-gaussian chunk) inner step.
    The inner chunk loop runs `cdiv(min(count_t, cap_bucket), CHUNK)`
    iterations per tile (early-stop on transmittance can only reduce
    this, so the body count here is an upper bound => the derived
    utilization is a lower bound).
  * MXU work per body, P=256 pixels, CHUNK=128, nchan=11 (bench dynamic
    branch: rgb3+mask1+tracks6+depth1), one 128^3 MXU pass = 2*128^3
    FLOPs of issue slots regardless of the real contraction width:
      forward  (_fwd_kernel_window):   1 scan matmul (P,C)@(C,C) = 2 passes
                                       1 channel dot  (P,C)@(C,nchan) = 2
      backward (_bwd_kernel_window_*): 2 scan matmuls (transmittance +
                                       suffix scan) = 4 passes
                                       2 channel dots (sdot, g_ch) = 4
    i.e. 4 fwd / 8 bwd passes per body — the "MXU-pass-bound" claim in
    docs/PERF.md, now with the arithmetic attached.
  * Row-op bands (payload pack gather, gradient scatter-add) are bound by
    a fixed per-row cost (~13 ns/row measured in round 1, independent of
    row width) — their floor is rows * 13 ns, nowhere near HBM bandwidth.

Run `--measure` on a free TPU to (re)measure the matmul ceiling and the
band times; without it, the committed numbers from docs/PERF.md's trace
table are used and only the body/pass/FLOP counts are recomputed. Note
the count-only mode still rebuilds the full bench-shape binning (720p,
100k gaussians, S=11) — on CPU that takes far longer than on TPU (>5 min;
run it on the chip).

Output: a summary table (paste target: docs/PERF.md "Speed of light").
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import bench

CHUNK = 128
P = 256  # TILE*TILE pixels per tile
NCHAN = 11  # bench dynamic render: rgb3 + mask1 + tracks(2*3) + depth1
PASS_FLOPS = 2 * 128**3  # one 128x128x128 MXU pass of issue slots
FWD_PASSES = 4
BWD_PASSES = 8

# Committed band times (docs/PERF.md "Fresh step breakdown", 189 ms step,
# trace 2026-08-20) used when --measure is not given.
COMMITTED = {
    "step_ms": 189.0,
    "bwd_window_ms": 77.6,
    "fwd_window_ms": 24.7,
    "grad_scatter_ms": 15.7,
    "pack_gather_ms": 7.3,
    "grad_scatter_rows": 1.16e6,  # (G+1,88)-table slot rows per step
    "row_ns": 13.0,  # measured fixed per-row cost (round 1)
}


def body_count():
    """Rebuild the bench scene's window binning; return per-step counts.

    Mirrors the shared-exposure-binning bucketed path of
    models/scene.py::render for the bench's dynamic branch (frame t=5,
    identity w2c, 720x1280, S=11, cap=1024).
    """
    from deblur4dgs_tpu.models.move_model import exposure_samples
    from deblur4dgs_tpu.models.scene import _gather_set, _poses_at_time
    from deblur4dgs_tpu.ops import lie
    from deblur4dgs_tpu.ops.projection import project
    from deblur4dgs_tpu.ops.tiling import (
        bin_gaussians_union_runs,
        bucket_tiles_from_runs,
        default_bucket_spec,
        num_tiles,
    )

    state, _, batch, _ = bench.build()
    scene = state.scene
    w2c = batch.w2cs[0]
    K = batch.Ks[0]
    img_wh = (bench.W, bench.H)
    t = int(batch.ts[0])
    cap = bench.TILE_CAP
    S = bench.NUM_EXPOSURE

    scales, opacities, colors, alive = _gather_set(scene, False, False)
    N = scales.shape[0]
    samples = exposure_samples(scene.move, w2c, t, S, stage="second")

    def project_subframe(pose, tm):
        means_w, quats_w = _poses_at_time(scene, tm, False, False)
        means_w = lie.pose_apply(pose, means_w)
        return project(means_w, quats_w, scales, w2c, K, img_wh,
                       aux_mask=alive)

    projs = jax.vmap(project_subframe)(samples.poses, samples.times)
    tiles_x, tiles_y = num_tiles(img_wh)
    T = tiles_x * tiles_y
    rank_sorted, starts, _, raw, order = bin_gaussians_union_runs(
        projs, img_wh, cap, max_tiles_per_gauss=32
    )
    spec = default_bucket_spec(T, cap)
    buckets = bucket_tiles_from_runs(rank_sorted, starts, raw, N, spec)

    pairs = int(jnp.sum(raw))
    bodies_per_subframe = 0
    kept = 0
    slot_rows = 0
    for cnt, c in zip(buckets.counts, buckets.caps):
        cnt = np.asarray(cnt)
        bodies_per_subframe += int(np.sum(np.ceil(cnt / CHUNK)))
        kept += int(cnt.sum())
        slot_rows += cnt.shape[0] * c  # padded gather/scatter slots
    return {
        "tiles": T,
        "pairs": pairs,
        "kept": kept,
        "spec": spec,
        "bodies_per_subframe": bodies_per_subframe,
        "bodies_per_step": bodies_per_subframe * S,
        "slot_rows": slot_rows,
        "S": S,
    }


# VPU elementwise ops per body element, counted from the backward kernel
# source (_bwd_kernel_window_sgrid + _alpha_from_split + masks): conic
# quadratic+exp ~12, transmittance/weight chain ~10, g_alpha ~6, g_sigma +
# five weighted tree-reductions ~20, g_op ~4, misc selects/concats ~8.
# An ESTIMATE (+-30%) — used only to show which unit the body saturates.
BWD_VPU_OPS_PER_ELT = 60
FWD_VPU_OPS_PER_ELT = 30


def measure_vpu_ceiling():
    """Achieved f32 elementwise op rate for a long fused chain — the
    practical VPU ceiling under the same compiler path as the kernels."""
    n = 1024  # 4 MB carry — must stay VMEM-resident or the loop measures
    # HBM streaming, not the VPU (67 MB carries measured 0.4 Top/s)
    x = jnp.ones((n, n), jnp.float32)
    inner = 4096  # ops inside ONE dispatch: the axon tunnel costs ~60 ms
    # per call, so the loop must live inside the jit to amortize it

    def chain(x):
        def body(_, x):
            x = x * 1.000001 + 1e-7
            return x * 0.999999 + 1e-7  # 4 ops/element/iter

        return jax.lax.fori_loop(0, inner, body, x)

    f = jax.jit(chain)
    float(f(x)[0, 0])
    t0 = time.time()
    o = f(x)
    float(o[0, 0])
    dt = time.time() - t0
    return 4 * inner * n * n / dt


def measure_matmul_ceiling():
    """Achieved f32 matmul FLOP/s on this chip for a large square matmul —
    the practical per-chip MXU ceiling (no spec-sheet guesswork)."""
    n = 4096
    a = jnp.ones((n, n), jnp.float32)
    b = jnp.ones((n, n), jnp.float32)
    inner = 64  # chained matmuls per dispatch (amortize the tunnel cost)

    def chain(a, b):
        def body(_, a):
            # 1/n keeps the all-ones chain at exactly 1.0 every iteration
            # (0.5 overflowed f32 after ~11 iters; the scale is fused into
            # the matmul epilogue either way, so timing is unaffected)
            return (1.0 / n) * (a @ b)

        return jax.lax.fori_loop(0, inner, body, a)

    f = jax.jit(chain)
    float(f(a, b)[0, 0])  # compile + fence (axon: block_until_ready
    # can return before device work completes; a readback is the fence)
    t0 = time.time()
    o = f(a, b)
    float(o[0, 0])
    dt = time.time() - t0
    return inner * 2 * n**3 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="measure matmul ceiling on the live TPU (needs a "
                    "free chip); otherwise use the committed ceiling")
    ap.add_argument("--ceiling-tflops", type=float, default=None,
                    help="override the matmul ceiling (TFLOP/s)")
    ap.add_argument("--vpu-ceiling-tops", type=float, default=None,
                    help="override the VPU elementwise ceiling (Top/s)")
    args = ap.parse_args()

    c = body_count()
    print(f"tiles={c['tiles']}  pairs(window)={c['pairs']:,}  "
          f"kept={c['kept']:,}  spec={c['spec']}")
    print(f"bodies/sub-frame={c['bodies_per_subframe']:,}  "
          f"S={c['S']}  bodies/step={c['bodies_per_step']:,}")

    if args.ceiling_tflops is not None:
        ceiling = args.ceiling_tflops * 1e12
        src = "override"
    elif args.measure:
        ceiling = measure_matmul_ceiling()
        src = "measured"
    else:
        ceiling = None
        src = None
    if args.vpu_ceiling_tops is not None:
        vpu_ceiling = args.vpu_ceiling_tops * 1e12
        vsrc = "override"
    elif args.measure:
        vpu_ceiling = measure_vpu_ceiling()
        vsrc = "measured"
    else:
        vpu_ceiling = None
        vsrc = None

    B = c["bodies_per_step"]
    fwd_flops = B * FWD_PASSES * PASS_FLOPS
    bwd_flops = B * BWD_PASSES * PASS_FLOPS
    t = COMMITTED
    fwd_tflops = fwd_flops / (t["fwd_window_ms"] * 1e-3) / 1e12
    bwd_tflops = bwd_flops / (t["bwd_window_ms"] * 1e-3) / 1e12
    print(f"\npass-slot FLOPs/step: fwd {fwd_flops/1e12:.3f} T  "
          f"bwd {bwd_flops/1e12:.3f} T")
    print(f"band times (committed trace): fwd {t['fwd_window_ms']} ms, "
          f"bwd {t['bwd_window_ms']} ms")
    print(f"achieved pass-slot rate: fwd {fwd_tflops:.1f} TFLOP/s, "
          f"bwd {bwd_tflops:.1f} TFLOP/s")
    if ceiling:
        print(f"matmul ceiling ({src}): {ceiling/1e12:.1f} TFLOP/s")
        print(f"fraction of ceiling: fwd {fwd_tflops*1e12/ceiling:.1%}, "
              f"bwd {bwd_tflops*1e12/ceiling:.1%}")
        body_floor_us = BWD_PASSES * PASS_FLOPS / ceiling * 1e6
        print(f"backward: pass floor {body_floor_us:.2f} us/body, "
              f"observed {t['bwd_window_ms']*1e-3/B*1e6:.2f} us/body")

    elts = B * P * CHUNK  # body elements/step
    fwd_vops = elts * FWD_VPU_OPS_PER_ELT
    bwd_vops = elts * BWD_VPU_OPS_PER_ELT
    fwd_vrate = fwd_vops / (t["fwd_window_ms"] * 1e-3) / 1e12
    bwd_vrate = bwd_vops / (t["bwd_window_ms"] * 1e-3) / 1e12
    print(f"\nVPU elementwise (estimated {FWD_VPU_OPS_PER_ELT}/"
          f"{BWD_VPU_OPS_PER_ELT} ops/elt): fwd {fwd_vrate:.2f} Top/s, "
          f"bwd {bwd_vrate:.2f} Top/s over the same bands")
    if vpu_ceiling:
        print(f"VPU ceiling ({vsrc}): {vpu_ceiling/1e12:.2f} Top/s; "
              f"fraction: fwd {fwd_vrate*1e12/vpu_ceiling:.0%}, "
              f"bwd {bwd_vrate*1e12/vpu_ceiling:.0%}")

    rows = t["grad_scatter_rows"]
    floor_ms = rows * t["row_ns"] * 1e-6
    print(f"\nrow-op band: {rows:.2e} slot rows/step x {t['row_ns']} ns "
          f"= {floor_ms:.1f} ms floor vs measured "
          f"{t['grad_scatter_ms']} ms scatter band "
          f"({floor_ms/t['grad_scatter_ms']:.0%} of band)")
    print(f"(slot rows recomputed from spec: {c['slot_rows']:,}/bucket-pass)")


if __name__ == "__main__":
    main()
