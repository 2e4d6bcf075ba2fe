"""Loss library vs independent numpy/scipy/torch references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi
import torch

from deblur4dgs_tpu.train import losses


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestMaskedQuantile:
    def test_matches_torch_quantile(self, rng):
        x = rng.normal(size=(1000,)).astype(np.float32)
        for q in (0.5, 0.9, 0.98):
            ours = float(losses.masked_quantile(jnp.asarray(x), jnp.ones(1000, bool), q))
            ref = float(torch.quantile(torch.from_numpy(x), q))
            assert abs(ours - ref) < 1e-4, (q, ours, ref)

    def test_masked_subset(self, rng):
        x = rng.normal(size=(500,)).astype(np.float32)
        mask = rng.uniform(size=500) < 0.6
        ours = float(losses.masked_quantile(jnp.asarray(x), jnp.asarray(mask), 0.9))
        ref = float(torch.quantile(torch.from_numpy(x[mask]), 0.9))
        assert abs(ours - ref) < 1e-4


class TestMaskedLosses:
    def test_l1_no_mask_matches_trimmed(self, rng):
        pred = rng.uniform(size=(40, 30, 3)).astype(np.float32)
        gt = rng.uniform(size=(40, 30, 3)).astype(np.float32)
        # reference trimmed_l1_loss semantics
        per = np.abs(pred - gt).mean(-1)
        thr = float(torch.quantile(torch.from_numpy(per).reshape(-1), 0.9))
        ref = per[per < thr].mean()
        ours = float(losses.masked_l1_loss(jnp.asarray(pred), jnp.asarray(gt), quantile=0.9))
        assert abs(ours - ref) < 1e-5

    def test_l1_with_mask(self, rng):
        pred = rng.uniform(size=(20, 20, 3)).astype(np.float32)
        gt = rng.uniform(size=(20, 20, 3)).astype(np.float32)
        mask = (rng.uniform(size=(20, 20)) < 0.5).astype(np.float32)
        per = np.abs(pred - gt).mean(-1)
        ref = (per * mask).sum() / (mask.sum() + 1e-8)
        ours = float(
            losses.masked_l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
        )
        assert abs(ours - ref) < 1e-5

    def test_mse(self, rng):
        pred = rng.uniform(size=(10, 10, 3)).astype(np.float32)
        gt = rng.uniform(size=(10, 10, 3)).astype(np.float32)
        ref = ((pred - gt) ** 2).mean()
        ours = float(losses.masked_mse_loss(jnp.asarray(pred), jnp.asarray(gt)))
        assert abs(ours - ref) < 1e-6

    def test_huber_matches_torch(self, rng):
        pred = rng.normal(size=(50, 3)).astype(np.float32)
        gt = rng.normal(size=(50, 3)).astype(np.float32)
        ref = float(torch.nn.functional.huber_loss(
            torch.from_numpy(pred), torch.from_numpy(gt), delta=0.5))
        ours = float(losses.masked_huber_loss(jnp.asarray(pred), jnp.asarray(gt), 0.5))
        assert abs(ours - ref) < 1e-5


class TestSSIM:
    def _ssim_ref(self, a, b):
        """Independent scipy implementation (valid-window gaussian SSIM)."""
        size, sigma = 11, 1.5
        x = np.arange(size) - 5.0
        g = np.exp(-(x**2) / (2 * sigma**2))
        g /= g.sum()
        win = np.outer(g, g)

        def blur(img):
            out = np.stack(
                [ndi.convolve(img[..., c], win, mode="constant") for c in range(img.shape[-1])],
                -1,
            )
            return out[5:-5, 5:-5]

        C1, C2 = 0.01**2, 0.03**2
        mu1, mu2 = blur(a), blur(b)
        s1 = blur(a * a) - mu1**2
        s2 = blur(b * b) - mu2**2
        s12 = blur(a * b) - mu1 * mu2
        m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
        )
        return m.mean()

    def test_matches_scipy(self, rng):
        a = rng.uniform(size=(32, 40, 3)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
        ref = self._ssim_ref(a, b)
        ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ours - ref) < 1e-4

    def test_identity(self, rng):
        a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        assert abs(float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6


class TestMotionRegs:
    def test_accel_zero_for_linear(self):
        t = jnp.arange(10, dtype=jnp.float32)
        x = jnp.stack([t, 2 * t, -t], -1)[None]  # (1, 10, 3) linear motion
        assert float(losses.compute_accel_loss(x)) < 1e-6

    def test_accel_positive_for_quadratic(self):
        t = jnp.arange(10, dtype=jnp.float32)
        x = jnp.stack([t**2, t, t], -1)[None]
        assert float(losses.compute_accel_loss(x)) > 1.0

    def test_z_acc_ray_projection(self):
        # motion orthogonal to the ray: zero loss; along the ray: positive
        w2cs = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
        base = jnp.array([[0.0, 0.0, 5.0]])
        ortho = jnp.stack(
            [base + jnp.array([-0.5, 0, 0]), base, base + jnp.array([0.5, 0, 0])], 1
        )[:, :, None]  # (G, 3, B, 3) moving in x, ray is +z
        assert float(losses.compute_z_acc_loss(ortho, w2cs)) < 1e-8
        along = jnp.stack(
            [base + jnp.array([0, 0, -0.5]), base, base + jnp.array([0, 0, 0.5])], 1
        )[:, :, None]
        assert float(losses.compute_z_acc_loss(along, w2cs)) > 0.1

    def test_scale_var(self):
        iso = jnp.zeros((5, 3))
        aniso = jnp.array([[0.0, 1.0, -1.0]])
        assert float(losses.scale_variance_loss(iso)) < 1e-8
        assert float(losses.scale_variance_loss(aniso)) > 0.1


class TestGradientLoss:
    def test_zero_for_identical(self, rng):
        img = rng.uniform(size=(20, 20)).astype(np.float32)
        mask = np.ones((20, 20), np.float32)
        out = float(losses.compute_gradient_loss(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(mask)))
        assert out < 1e-7

    def test_detects_gradient_mismatch(self, rng):
        gt = np.tile(np.linspace(0, 1, 20)[None], (20, 1)).astype(np.float32)
        pred = np.zeros_like(gt)
        mask = np.ones((20, 20), np.float32)
        out = float(losses.compute_gradient_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
        assert out > 1e-3


class TestExposureConsistencyLoss:
    """AlignedLoss fg-mask weighting (reference trainer.py:605,613-616 +
    loss_utils.py:176-177): the consistency term is multiplied by the
    DETACHED rendered fg-mask of the target sub-frame, excluding
    background pixels from supervision."""

    def _stacks(self):
        S, H, W = 3, 8, 8
        rng = np.random.default_rng(0)
        imgs = rng.uniform(size=(S, H, W, 3)).astype(np.float32)
        # sub-frames agree on the fg half, disagree on the bg half
        imgs[:, :, : W // 2] = imgs[0, :, : W // 2]
        masks = np.zeros((S, H, W, 1), np.float32)
        masks[:, :, : W // 2] = 1.0
        return jnp.asarray(imgs), jnp.asarray(masks)

    @staticmethod
    def _identity_flow(a, b):
        return a, jnp.ones_like(a[..., :1])

    def test_mask_excludes_bg_disagreement(self):
        from deblur4dgs_tpu.train.trainer import exposure_consistency_loss

        imgs, masks = self._stacks()
        masked = float(exposure_consistency_loss(
            imgs, masks, self._identity_flow))
        unmasked = float(exposure_consistency_loss(
            imgs, jnp.ones_like(masks), self._identity_flow))
        # fg pixels agree -> masked loss zero; bg disagreement only leaks
        # into the unmasked variant
        assert masked < 1e-7
        assert unmasked > 1e-3

    def test_mask_gradient_detached(self):
        from deblur4dgs_tpu.train.trainer import exposure_consistency_loss

        imgs, masks = self._stacks()

        g = jax.grad(
            lambda m: exposure_consistency_loss(imgs, m, self._identity_flow)
        )(masks)
        assert float(jnp.abs(g).max()) == 0.0

    def test_loss_value_matches_reference_form(self):
        """cons = sum of mean|pred*w - target*w| over (S-1) forward pairs +
        (S-1) vs-first pairs, normalized by (S-1)."""
        from deblur4dgs_tpu.train.trainer import exposure_consistency_loss

        S, H, W = 3, 4, 4
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(size=(S, H, W, 3)).astype(np.float32))
        masks = jnp.asarray(
            (rng.uniform(size=(S, H, W, 1)) < 0.5).astype(np.float32))
        got = float(exposure_consistency_loss(
            imgs, masks, self._identity_flow))
        expect = 0.0
        for ee in range(S - 1):
            w = np.asarray(masks[ee + 1])
            expect += np.abs(
                np.asarray(imgs[ee]) * w - np.asarray(imgs[ee + 1]) * w
            ).mean()
        for ee in range(1, S):
            w = np.asarray(masks[0])
            expect += np.abs(
                np.asarray(imgs[ee]) * w - np.asarray(imgs[0]) * w
            ).mean()
        expect /= S - 1
        assert abs(got - expect) < 1e-6


class TestSSIMSmallImages:
    def test_finite_below_window_size(self, rng):
        """Images smaller than the 11-px window must shrink it instead of
        producing an empty valid-padded blur whose mean is NaN (latent in
        rounds 1-2: x4 phase-A training on tiny synthetic scenes reported
        NaN loss values while the L1 gradients kept training going)."""
        a = jnp.asarray(rng.uniform(size=(8, 12, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(8, 12, 3)).astype(np.float32))
        v = float(losses.ssim(a, b))
        assert np.isfinite(v) and -1.0 <= v <= 1.0
        assert abs(float(losses.ssim(a, a)) - 1.0) < 1e-6
        g = jax.grad(lambda x: losses.ssim(x, b))(a)
        assert bool(jnp.isfinite(g).all())
