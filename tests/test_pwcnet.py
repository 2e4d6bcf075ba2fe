"""PWC-Net: correlation vs direct reference, shapes, warp correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.models import pwcnet as P


class TestCorrelation:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.normal(size=(1, 8, 10, 6)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(1, 8, 10, 6)).astype(np.float32))
        out = P.correlation(f1, f2, radius=4)
        assert out.shape == (1, 8, 10, 81)
        # spot-check a few displacements against the definition
        f2n = np.asarray(f2[0])
        f1n = np.asarray(f1[0])
        for (dy, dx) in [(-4, -4), (0, 0), (2, -3), (4, 4)]:
            k = (dy + 4) * 9 + (dx + 4)
            for (y, x) in [(0, 0), (4, 5), (7, 9)]:
                yy, xx = y + dy, x + dx
                if 0 <= yy < 8 and 0 <= xx < 10:
                    expect = (f1n[y, x] * f2n[yy, xx]).mean()
                else:
                    expect = 0.0
                np.testing.assert_allclose(
                    out[0, y, x, k], expect, atol=1e-5,
                    err_msg=f"dy={dy} dx={dx} y={y} x={x}",
                )

    def test_identical_inputs_peak_at_center(self):
        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(size=(1, 6, 6, 16)).astype(np.float32))
        out = P.correlation(f, f)
        center = out[0, 3, 3, 40]  # dy=dx=0
        others = jnp.concatenate([out[0, 3, 3, :40], out[0, 3, 3, 41:]])
        assert float(center) > float(others.max())


class TestBackwarp:
    def test_zero_flow_identity(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        out, mask = P.backwarp(x, jnp.zeros((1, 8, 8, 2)))
        np.testing.assert_allclose(out, x, atol=1e-6)
        np.testing.assert_allclose(mask, 1.0)

    def test_integer_shift(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        # the effective pixel displacement is flow * W/(W-1) (reference
        # grid_sample semantics, see backwarp docstring): a flow of
        # 2*(W-1)/W samples exactly 2 pixels to the right
        flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(2.0 * 7.0 / 8.0)
        out, mask = P.backwarp(x, flow)
        np.testing.assert_allclose(out[0, :, :6], x[0, :, 2:], atol=1e-5)
        # out-of-range columns masked
        np.testing.assert_allclose(mask[0, :, 6:], 0.0)


class TestTorchParity:
    def test_conv_matches_torch(self):
        import torch

        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 8, 9, 5)).astype(np.float32)
        w = rng.normal(size=(4, 5, 3, 3)).astype(np.float32)  # torch OIHW
        b = rng.normal(size=(4,)).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w), torch.from_numpy(b), padding=1,
        ).numpy().transpose(0, 2, 3, 1)
        ours = P.conv2d(
            {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_deconv_matches_torch(self):
        import torch

        rng = np.random.default_rng(8)
        x = rng.normal(size=(1, 6, 7, 5)).astype(np.float32)
        w = rng.normal(size=(5, 3, 4, 4)).astype(np.float32)  # torch (cin,cout,kh,kw)
        b = rng.normal(size=(3,)).astype(np.float32)
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=1,
        ).numpy().transpose(0, 2, 3, 1)
        # converter layout: spatial flip + transpose to (kh, kw, cin, cout)
        wj = np.ascontiguousarray(
            np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
        )
        ours = P.conv_transpose2d(
            {"w": jnp.asarray(wj), "b": jnp.asarray(b)}, jnp.asarray(x)
        )
        assert ours.shape == ref.shape == (1, 12, 14, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestNetwork:
    def test_flow_shapes_and_grads(self):
        params = P.init_pwcnet(jax.random.PRNGKey(0))
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
        flow = P.pwcnet_flow(params, a, b)
        assert flow.shape == (1, 64, 96, 2)
        assert bool(jnp.all(jnp.isfinite(flow)))

    def test_aligned_loss_fn(self):
        params = P.init_pwcnet(jax.random.PRNGKey(0))
        fn = P.make_aligned_loss_fn(params)
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))

        def loss(a):
            aligned, mask = fn(a, b)
            return jnp.mean(jnp.abs(aligned * mask - b * mask))

        g = jax.grad(loss)(a)
        # grads flow to the image but not through the (frozen) flow
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_non_multiple_of_64(self):
        params = P.init_pwcnet(jax.random.PRNGKey(1))
        rng = np.random.default_rng(6)
        a = jnp.asarray(rng.uniform(size=(1, 48, 50, 3)).astype(np.float32))
        flow = P.pwcnet_flow(params, a, a)
        assert flow.shape == (1, 48, 50, 2)
