"""Tiled (Pallas + XLA) rasterizer vs the pure-JAX oracle.

Pallas runs in interpret mode on CPU; the same kernels compile on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize import rasterize, _composite_xla, composite_tiles
from deblur4dgs_tpu.ops.rasterize_ref import render_ref
from deblur4dgs_tpu.ops.tiling import pack_and_gather

W, H = 64, 48
K = jnp.array([[60.0, 0.0, 32.0], [0.0, 60.0, 24.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def make_scene(g=200, d=3, seed=0, spread=0.6):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, (g, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.5, 4.0, g)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (g, 3))).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, g).astype(np.float32)
    chans = rng.uniform(0, 1, (g, d)).astype(np.float32)
    return (
        jnp.asarray(means),
        jnp.asarray(quats),
        jnp.asarray(scales),
        jnp.asarray(opac),
        jnp.asarray(chans),
    )


def oracle(scene, bg=0.3):
    means, quats, scales, opac, chans = scene
    bgv = jnp.full((chans.shape[-1],), bg)
    return render_ref(means, quats, scales, opac, chans, EYE4, K, (W, H), bgv)


def tiled(scene, bg=0.3, use_pallas=True, cap=256):
    means, quats, scales, opac, chans = scene
    proj = project(means, quats, scales, EYE4, K, (W, H))
    bgv = jnp.full((chans.shape[-1],), bg)
    img, alpha, _ = rasterize(
        proj, opac, chans, bgv, (W, H), cap=cap, use_pallas=use_pallas
    )
    return img, alpha


class TestForwardParity:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_oracle(self, use_pallas):
        scene = make_scene(200)
        img_o, alpha_o = oracle(scene)
        img_t, alpha_t = tiled(scene, use_pallas=use_pallas)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)
        np.testing.assert_allclose(alpha_t, alpha_o, atol=1e-5)

    @pytest.mark.parametrize("d", [1, 4, 19])
    def test_multichannel(self, d):
        scene = make_scene(100, d=d, seed=2)
        img_o, _ = oracle(scene)
        img_t, _ = tiled(scene)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)

    def test_dense_overlap(self):
        # many big gaussians piled at the center: exercises deep tiles
        scene = list(make_scene(300, seed=4, spread=0.15))
        scene[2] = jnp.full_like(scene[2], 0.15)  # big scales
        img_o, alpha_o = oracle(tuple(scene))
        img_t, alpha_t = tiled(tuple(scene))
        np.testing.assert_allclose(img_t, img_o, atol=1e-4)

    def test_empty_scene(self):
        scene = make_scene(10)
        # push everything behind the camera
        scene = (scene[0].at[:, 2].set(-1.0),) + scene[1:]
        img_t, alpha_t = tiled(scene, bg=0.7)
        np.testing.assert_allclose(img_t, 0.7, atol=1e-6)
        np.testing.assert_allclose(alpha_t, 0.0, atol=1e-6)

    def test_capacity_overflow_drops_farthest(self):
        # cap 128 < actual count: result keeps front-most gaussians
        scene = list(make_scene(600, seed=5, spread=0.1))
        scene[2] = jnp.full_like(scene[2], 0.2)
        scene[3] = jnp.full_like(scene[3], 0.9)  # near-opaque: back invisible
        img_full, _ = tiled(tuple(scene), cap=1024)
        img_cap, _ = tiled(tuple(scene), cap=128)
        # saturated pixels identical; only low-alpha fringe differs
        assert float(jnp.median(jnp.abs(img_full - img_cap))) < 1e-4


class TestGradientParity:
    def _grads(self, scene, impl):
        means, quats, scales, opac, chans = scene

        def loss(params):
            means, scales, opac, chans = params
            if impl == "oracle":
                img, alpha = render_ref(
                    means, quats, scales, opac, chans, EYE4, K, (W, H),
                    jnp.full((chans.shape[-1],), 0.3),
                )
            else:
                proj = project(means, quats, scales, EYE4, K, (W, H))
                img, alpha, _ = rasterize(
                    proj, opac, chans, jnp.full((chans.shape[-1],), 0.3),
                    (W, H), cap=256, use_pallas=(impl == "pallas"),
                )
            t = jnp.linspace(0, 1, img.size).reshape(img.shape)
            return jnp.mean((img - t) ** 2) + 0.1 * jnp.mean(alpha)

        return jax.grad(loss)((means, scales, opac, chans))

    def test_xla_tiled_matches_oracle(self):
        scene = make_scene(120, seed=7)
        g_o = self._grads(scene, "oracle")
        g_x = self._grads(scene, "xla")
        for a, b in zip(g_o, g_x):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)

    def test_pallas_matches_oracle(self):
        scene = make_scene(120, seed=7)
        g_o = self._grads(scene, "oracle")
        g_p = self._grads(scene, "pallas")
        for a, b in zip(g_o, g_p):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)

    def test_pallas_grads_multichannel(self):
        scene = make_scene(60, d=7, seed=9)
        g_o = self._grads(scene, "oracle")
        g_p = self._grads(scene, "pallas")
        for a, b in zip(g_o, g_p):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)
