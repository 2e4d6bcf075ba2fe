"""MoveModel supervised sanity: can the heads REPRESENT the GT sweep?

VERDICT r4 item 4: every committed quality run shows the learned camera
sweep at 0.3-0.5x the GT magnitude with |cosine| ~ 0 — the intra-exposure
camera trajectory (models/move_model.py, reference anchor
/root/reference/flow3d/models/move_model.py:112-156) has never been shown
to learn anything real through the rendering losses. This experiment
isolates the ARCHITECTURE + OPTIMIZER from the losses: train the pose
heads directly against the generator's known per-frame exposure deltas
(the same targets diagnose_move scores against) and see whether they fit.

  * converges (ratio -> 1, |cos| -> 1): the MLP can represent the sweep
    from the per-frame w2c embedding; the blur-rendering loss surface —
    not capacity — buries the signal.
  * does not converge: the per-frame w2cs (cam_shake-scale jitters, nearly
    identical se(3) embeddings) do not separate enough for the trunk to
    emit distinct per-frame deltas — an identifiability limit of
    conditioning on the pose alone, which the reference never faces
    because its real camera paths differ substantially frame to frame.

Targets: the model's residual poses act on WORLD points before the static
viewmat, so the GT world-frame residual for camera delta exp(u*d_f) @ w2c
is the conjugation w2c^-1 exp(u*d_f) w2c; start = u=-1, end = u=+1
(matching scripts/inspect_checkpoint.py::diagnose_move).

CPU-runnable (tiny MLP, no rendering). Writes MOVE_SANITY_r{N}.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="the quality run's pose-head LR")
    ap.add_argument("--steps-equivalent", type=int, default=None,
                    help="also report the fit after this many updates — "
                    "set to the quality run's actual pose-update count to "
                    "compare budgets")
    args = ap.parse_args()

    from deblur4dgs_tpu.data import synthetic
    from deblur4dgs_tpu.models.move_model import init_move_model, predict_deltas
    from deblur4dgs_tpu.ops import lie
    from scripts.inspect_checkpoint import diagnose_move

    # the frozen quality-run scene (tpu_quality_regression.py ref tier)
    T, wh = 24, (512, 288)
    sscene = synthetic.make_scene(
        seed=0, num_fg=2000, num_bg=9000, num_frames=T, img_wh=wh,
        cam_shake=0.03, exp_shake=0.10, motion_cycles=1.0, motion_amp=0.7,
        exposure=0.7,
    )
    w2cs = jnp.asarray(sscene.w2cs)
    deltas = jnp.asarray(sscene.exp_deltas)  # (T, 6) end-of-window cam delta

    def conj_target(w2c, d, u):
        """world-frame residual se(3) for camera delta exp(u*d) @ w2c."""
        D = jnp.eye(4).at[:3, :].set(lie.se3_exp(u * d))
        return lie.se3_log((jnp.linalg.inv(w2c) @ D @ w2c)[:3, :])

    tgt0 = jax.vmap(lambda w, d: conj_target(w, d, -1.0))(w2cs, deltas)
    tgt1 = jax.vmap(lambda w, d: conj_target(w, d, 1.0))(w2cs, deltas)

    move = init_move_model(jax.random.PRNGKey(0), num_frames=T)
    params = (move.trunk, move.head_start, move.head_end)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        m = move._replace(
            trunk=params[0], head_start=params[1], head_end=params[2]
        )
        d0, d1 = jax.vmap(lambda w: predict_deltas(m, w))(w2cs)
        return jnp.mean((d0 - tgt0) ** 2) + jnp.mean((d1 - tgt1) ** 2)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # input separation: how distinct are the per-frame MLP inputs?
    se3s = jax.vmap(lambda w: lie.se3_log(w[:3, :]))(w2cs)
    inp_spread = float(jnp.std(se3s, axis=0).mean())
    tgt_spread = float(jnp.std(tgt1, axis=0).mean())

    t0 = time.time()
    history = []
    checkpoints = {}
    marks = sorted({args.iters} | ({args.steps_equivalent}
                                   if args.steps_equivalent else set()))
    for i in range(args.iters):
        params, opt_state, loss = step(params, opt_state)
        if i % 200 == 0 or (i + 1) in marks:
            history.append({"iter": i, "loss": float(loss)})
        if (i + 1) in marks:
            m = move._replace(trunk=params[0], head_start=params[1],
                              head_end=params[2])
            d = diagnose_move(m, w2cs, sscene.exp_deltas, sscene.exposure)
            checkpoints[str(i + 1)] = {
                k: v for k, v in d.items() if k != "frames"
            }
            print(f"iter {i+1}: loss {float(loss):.3e} "
                  f"ratio {d['mean_sweep_ratio']:.3f} "
                  f"|cos| {d['mean_sweep_abs_cosine']:.3f}")

    final = checkpoints[str(args.iters)]
    result = {
        "round": args.round,
        "iters": args.iters,
        "lr": args.lr,
        "seconds": round(time.time() - t0, 1),
        "input_se3_spread": inp_spread,
        "target_se3_spread": tgt_spread,
        "loss_history": history[:5] + history[-5:],
        "fit_at": checkpoints,
        "final": final,
        "converged": bool(
            final["mean_sweep_ratio"] > 0.8
            and final["mean_sweep_abs_cosine"] > 0.9
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result["final"], indent=2))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"MOVE_SANITY_r{args.round:02d}.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}; converged={result['converged']}")


if __name__ == "__main__":
    main()
