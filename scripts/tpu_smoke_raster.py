"""TPU smoke test: compile + time the Pallas rasterizer fwd/bwd."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize import rasterize

W, H = 1280, 720
G = 50_000
K = jnp.array([[1000.0, 0.0, W / 2], [0.0, 1000.0, H / 2], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    means = rng.uniform(-1, 1, (G, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 6.0, G)
    quats = rng.normal(size=(G, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-5.0, -3.0, (G, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, G).astype(np.float32)
    chans = rng.uniform(0, 1, (G, 3)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, chans)))

    @jax.jit
    def fwd(means, quats, scales, opac, chans):
        proj = project(means, quats, scales, EYE4, K, (W, H))
        img, alpha, _ = rasterize(
            proj, opac, chans, jnp.zeros(3), (W, H), cap=1024
        )
        return img, alpha

    @jax.jit
    def fwdbwd(means, quats, scales, opac, chans):
        def loss(means, scales, opac, chans):
            proj = project(means, quats, scales, EYE4, K, (W, H))
            img, alpha, _ = rasterize(
                proj, opac, chans, jnp.zeros(3), (W, H), cap=1024
            )
            return jnp.mean(img**2) + jnp.mean(alpha)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, chans)

    t0 = time.time()
    out = fwd(*args)
    jax.block_until_ready(out)
    print(f"fwd compile+run: {time.time()-t0:.1f}s; img mean {float(out[0].mean()):.4f} alpha mean {float(out[1].mean()):.4f}")

    for name, fn in [("fwd", fwd), ("fwdbwd", fwdbwd)]:
        out = fn(*args)
        jax.block_until_ready(out)
        n = 10
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms -> {W*H/dt/1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
