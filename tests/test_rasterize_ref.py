"""Tests for the pure-JAX oracle rasterizer (projection + compositing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.rasterize_ref import render_ref

W, H = 64, 48
K = jnp.array([[60.0, 0.0, 32.0], [0.0, 60.0, 24.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def identity_quats(n):
    return jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))


class TestProjection:
    def test_center_gaussian(self):
        means = jnp.array([[0.0, 0.0, 2.0]])
        proj = project(
            means, identity_quats(1), jnp.full((1, 3), 0.1), EYE4, K, (W, H)
        )
        np.testing.assert_allclose(proj.means2d[0], [32.0, 24.0], atol=1e-4)
        np.testing.assert_allclose(proj.depths[0], 2.0, atol=1e-6)
        assert bool(proj.valid[0])
        # isotropic: cov2d = (fx*s/z)^2 + 0.3 on the diagonal, b = 0
        var = (60.0 * 0.1 / 2.0) ** 2 + 0.3
        np.testing.assert_allclose(proj.conics[0, 0], 1.0 / var, rtol=1e-4)
        np.testing.assert_allclose(proj.conics[0, 2], 1.0 / var, rtol=1e-4)
        np.testing.assert_allclose(proj.conics[0, 1], 0.0, atol=1e-6)
        assert proj.radii[0] == np.ceil(3.0 * np.sqrt(var))

    def test_culling(self):
        means = jnp.array(
            [
                [0.0, 0.0, -1.0],  # behind camera
                [0.0, 0.0, 0.001],  # closer than near plane
                [100.0, 0.0, 2.0],  # far off screen
                [0.0, 0.0, 2.0],  # visible
            ]
        )
        proj = project(
            means, identity_quats(4), jnp.full((4, 3), 0.05), EYE4, K, (W, H)
        )
        np.testing.assert_array_equal(proj.valid, [False, False, False, True])
        assert proj.radii[0] == 0.0

    def test_offcenter_projection(self):
        means = jnp.array([[0.5, -0.25, 2.0]])
        proj = project(
            means, identity_quats(1), jnp.full((1, 3), 0.05), EYE4, K, (W, H)
        )
        np.testing.assert_allclose(
            proj.means2d[0], [32.0 + 60 * 0.25, 24.0 - 60 * 0.125], atol=1e-4
        )

    def test_viewmat_transform(self):
        # camera shifted +1 in x: world origin appears at x=-1 in camera
        viewmat = EYE4.at[0, 3].set(-1.0)
        means = jnp.array([[1.0, 0.0, 2.0]])  # cancels the shift
        proj = project(
            means, identity_quats(1), jnp.full((1, 3), 0.05), viewmat, K, (W, H)
        )
        np.testing.assert_allclose(proj.means2d[0], [32.0, 24.0], atol=1e-4)

    def test_anisotropic_rotated(self):
        # elongated gaussian rotated 90deg about z swaps x/y variances
        q = lie.quat_exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
        scales = jnp.array([[0.2, 0.05, 0.05]])
        p_rot = project(means := jnp.array([[0.0, 0.0, 2.0]]), q[None], scales, EYE4, K, (W, H))
        p_ref = project(means, identity_quats(1), jnp.array([[0.05, 0.2, 0.05]]), EYE4, K, (W, H))
        np.testing.assert_allclose(p_rot.conics[0], p_ref.conics[0], rtol=1e-3, atol=1e-5)


class TestCompositing:
    def test_background_only(self):
        means = jnp.array([[0.0, 0.0, -5.0]])  # culled
        img, alpha = render_ref(
            means,
            identity_quats(1),
            jnp.full((1, 3), 0.1),
            jnp.array([0.9]),
            jnp.array([[1.0, 0.0, 0.0]]),
            EYE4,
            K,
            (W, H),
            background=0.25,
        )
        np.testing.assert_allclose(img, 0.25, atol=1e-6)
        np.testing.assert_allclose(alpha, 0.0, atol=1e-6)

    def test_single_gaussian_center_alpha(self):
        op = 0.8
        img, alpha = render_ref(
            jnp.array([[0.0, 0.0, 2.0]]),
            identity_quats(1),
            jnp.full((1, 3), 0.3),
            jnp.array([op]),
            jnp.array([[1.0, 0.5, 0.2]]),
            EYE4,
            K,
            (W, H),
        )
        # pixel center (32.5, 24.5) is 0.5px off the projected mean (32, 24)
        var = (60.0 * 0.3 / 2.0) ** 2 + 0.3
        sigma = 0.5 * (0.5**2 + 0.5**2) / var
        expect = op * np.exp(-sigma)
        np.testing.assert_allclose(alpha[24, 32], expect, rtol=1e-4)
        np.testing.assert_allclose(img[24, 32], expect * np.array([1.0, 0.5, 0.2]), rtol=1e-4)

    def test_depth_ordering_occlusion(self):
        # near-opaque red in front of blue: center pixel ~red
        means = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 3.0]])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        big = jnp.full((2, 3), 0.5)
        img, alpha = render_ref(
            means, identity_quats(2), big, jnp.array([0.999, 0.999]),
            colors, EYE4, K, (W, H),
        )
        assert img[24, 32, 0] > 0.97
        assert img[24, 32, 2] < 0.03
        assert alpha[24, 32] > 0.99
        # reversed input order must give the same result (sorted internally)
        img2, _ = render_ref(
            means[::-1], identity_quats(2), big, jnp.array([0.999, 0.999]),
            colors[::-1], EYE4, K, (W, H),
        )
        np.testing.assert_allclose(img, img2, atol=1e-6)

    def test_alpha_blend_two_layers(self):
        means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
        # huge flat gaussians -> alpha ~ opacity everywhere near center
        img, alpha = render_ref(
            means, identity_quats(2), jnp.full((2, 3), 5.0),
            jnp.array([0.4, 0.6]),
            jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
            EYE4, K, (W, H), background=1.0,
        )
        a0, a1 = 0.4, 0.6
        T = (1 - a0) * (1 - a1)  # background weight (bg=1 on all channels)
        np.testing.assert_allclose(img[24, 32, 0], a0 + T, atol=2e-3)
        np.testing.assert_allclose(img[24, 32, 1], (1 - a0) * a1 + T, atol=2e-3)
        np.testing.assert_allclose(img[24, 32, 2], T * 1.0, atol=2e-3)
        np.testing.assert_allclose(alpha[24, 32], 1 - T, atol=2e-3)

    def test_multichannel_payload(self):
        # 7 channels (e.g. RGB+mask+3 tracks): all composited identically
        g = 5
        rng = np.random.default_rng(3)
        means = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3)).astype(np.float32))
        means = means.at[:, 2].add(2.5)
        chans = jnp.asarray(rng.uniform(0, 1, (g, 7)).astype(np.float32))
        img, _ = render_ref(
            means, identity_quats(g), jnp.full((g, 3), 0.2),
            jnp.full((g,), 0.7), chans, EYE4, K, (W, H),
        )
        assert img.shape == (H, W, 7)
        # channel k of output is a fixed linear function of channel inputs:
        # rendering channels [c, c] must equal duplicating output channel
        img2, _ = render_ref(
            means, identity_quats(g), jnp.full((g, 3), 0.2),
            jnp.full((g,), 0.7), jnp.concatenate([chans, chans[:, :1]], -1),
            EYE4, K, (W, H),
        )
        np.testing.assert_allclose(img2[..., -1], img2[..., 0], atol=1e-6)


class TestGradients:
    def _loss(self, params):
        means, scales_log, op_logit, colors = params
        img, _ = render_ref(
            means,
            identity_quats(means.shape[0]),
            jnp.exp(scales_log),
            jax.nn.sigmoid(op_logit),
            colors,
            EYE4,
            K,
            (32, 24),
        )
        target = jnp.linspace(0, 1, 32 * 24 * 3).reshape(24, 32, 3)
        return jnp.mean((img - target) ** 2)

    def test_grads_match_finite_difference(self):
        rng = np.random.default_rng(7)
        g = 6
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (g, 3)).astype(np.float32))
        means = means.at[:, 2].add(2.0)
        params = (
            means,
            jnp.full((g, 3), np.log(0.15), jnp.float32),
            jnp.zeros((g,), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 0.8, (g, 3)).astype(np.float32)),
        )
        grads = jax.grad(self._loss)(params)
        # spot-check several coordinates with central differences
        f64 = lambda p: float(self._loss(p))
        eps = 1e-3
        checks = [(0, (0, 0)), (0, (2, 2)), (1, (1, 0)), (2, (3,)), (3, (4, 1))]
        for pi, idx in checks:
            p_plus = list(params)
            p_minus = list(params)
            p_plus[pi] = params[pi].at[idx].add(eps)
            p_minus[pi] = params[pi].at[idx].add(-eps)
            fd = (f64(tuple(p_plus)) - f64(tuple(p_minus))) / (2 * eps)
            an = float(grads[pi][idx])
            assert abs(fd - an) < 2e-3 * max(1.0, abs(fd)), (pi, idx, fd, an)

    def test_grads_finite(self):
        g = 4
        rng = np.random.default_rng(11)
        means = jnp.asarray(rng.uniform(-0.3, 0.3, (g, 3)).astype(np.float32))
        means = means.at[:, 2].add(2.0)
        params = (
            means,
            jnp.full((g, 3), np.log(0.1), jnp.float32),
            jnp.zeros((g,), jnp.float32),
            jnp.full((g, 3), 0.5, jnp.float32),
        )
        grads = jax.grad(self._loss)(params)
        for gr in grads:
            assert bool(jnp.all(jnp.isfinite(gr)))
