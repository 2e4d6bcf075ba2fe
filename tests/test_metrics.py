"""Metrics vs independent references (torch CPU for masked SSIM parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from deblur4dgs_tpu.eval import metrics as M


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert abs(M.compute_psnr(a, b) - 20.0) < 1e-4

    def test_masked(self, rng):
        a = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        b = a.at[:8].add(0.5)  # corrupt top half
        mask = jnp.zeros((16, 16)).at[8:].set(1.0)
        assert M.compute_psnr(a, b, mask) > 60  # bottom half identical

    def test_accumulator_matches_reference_formula(self, rng):
        m = M.mPSNR()
        imgs = [rng.uniform(size=(12, 12, 3)).astype(np.float32) for _ in range(3)]
        tgts = [np.clip(x + 0.05 * rng.normal(size=x.shape), 0, 1).astype(np.float32) for x in imgs]
        per = []
        for a, b in zip(imgs, tgts):
            m.update(jnp.asarray(a), jnp.asarray(b))
            per.append(M.compute_psnr(jnp.asarray(a), jnp.asarray(b)))
        assert abs(m.compute() - np.mean(per)) < 1e-3


class TestMaskedSSIM:
    def _torch_ref(self, preds, targets, masks):
        """Direct port of the reference mSSIM.update (metrics.py:142-213)."""
        preds = torch.from_numpy(preds)[None]
        targets = torch.from_numpy(targets)[None]
        masks = torch.from_numpy(masks)[None]
        kernel_size, sigma, k1, k2, dr = 11, 1.5, 0.01, 0.03, 1.0
        hw = kernel_size // 2
        shift = (2 * hw - kernel_size + 1) / 2
        f_i = ((torch.arange(kernel_size) - hw + shift) / sigma) ** 2
        filt = torch.exp(-0.5 * f_i)
        filt /= torch.sum(filt)

        def convolve2d(z, m, f):
            z = z.permute(0, 3, 1, 2)
            m = m[:, None]
            f = f[None, None].expand(z.shape[1], -1, -1, -1)
            z_ = tF.conv2d(z * m, f, padding="valid", groups=z.shape[1])
            m_ = tF.conv2d(m, torch.ones_like(f[:1]), padding="valid")
            return torch.where(
                m_ != 0, z_ * torch.ones_like(f).sum() / (m_ * z.shape[1]), 0
            ).permute(0, 2, 3, 1), (m_ != 0)[:, 0].to(z.dtype)

        filt_fn1 = lambda z, m: convolve2d(z, m, filt[:, None])
        filt_fn2 = lambda z, m: convolve2d(z, m, filt[None, :])
        filt_fn = lambda z, m: filt_fn1(*filt_fn2(z, m))
        mu0 = filt_fn(preds, masks)[0]
        mu1 = filt_fn(targets, masks)[0]
        mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
        s00 = (filt_fn(preds**2, masks)[0] - mu00).clamp(min=0)
        s11 = (filt_fn(targets**2, masks)[0] - mu11).clamp(min=0)
        s01 = filt_fn(preds * targets, masks)[0] - mu01
        s01 = torch.sign(s01) * torch.minimum(
            torch.sqrt(s00 * s11), torch.abs(s01)
        )
        c1, c2 = (k1 * dr) ** 2, (k2 * dr) ** 2
        ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
            (mu00 + mu11 + c1) * (s00 + s11 + c2)
        )
        return float(ssim_map.mean())

    def test_matches_torch_port(self, rng):
        a = rng.uniform(size=(32, 40, 3)).astype(np.float32)
        b = np.clip(a + 0.08 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
        mask = (rng.uniform(size=(32, 40)) < 0.7).astype(np.float32)
        ref = self._torch_ref(a, b, mask)
        ours = float(M.masked_ssim(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
        assert abs(ours - ref) < 1e-4, (ours, ref)

    def test_identity_is_one(self, rng):
        a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        assert abs(float(M.masked_ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5


class TestPoseErrors:
    def test_zero_for_identical(self, rng):
        from deblur4dgs_tpu.ops import lie

        poses = np.stack(
            [
                np.asarray(lie.rt_to_mat4(
                    np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.3))),
                    rng.normal(size=3).astype(np.float32),
                ))
                for _ in range(5)
            ]
        )
        ate, rpe_t, rpe_r = M.compute_pose_errors(poses, poses)
        assert ate < 1e-6 and rpe_t < 1e-5 and rpe_r < 0.1

    def test_translation_offset(self):
        eye = np.broadcast_to(np.eye(4), (4, 4, 4)).copy()
        shifted = eye.copy()
        shifted[:, 0, 3] += 0.5
        ate, rpe_t, rpe_r = M.compute_pose_errors(shifted, eye)
        assert abs(ate - 0.5) < 1e-6
        assert rpe_t < 1e-6  # constant offset cancels in relative poses


class TestPCK:
    def test_fraction(self):
        p = jnp.array([[0.0, 0.0], [1.0, 0.0], [5.0, 0.0]])
        t = jnp.zeros((3, 2))
        assert abs(M.compute_pck(p, t, threshold=2.0) - 2 / 3) < 1e-6
