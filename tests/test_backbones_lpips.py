"""AlexNet/VGG backbones + LPIPS: shape and torch-parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deblur4dgs_tpu.eval import lpips as LP
from deblur4dgs_tpu.models import backbones as B


class TestAlexNet:
    def test_feature_shapes(self):
        params = B.init_alexnet(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 3))
        feats = B.alexnet_features(params, x)
        assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]
        assert feats[0].shape[1] == 15  # (64+2*2-11)/4+1

    def test_matches_torch_alexnet_features(self):
        """Random torch alexnet.features -> converter -> identical taps."""
        rng = np.random.default_rng(0)
        layers = [
            torch.nn.Conv2d(3, 64, 11, 4, 2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(64, 192, 5, 1, 2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(192, 384, 3, 1, 1), torch.nn.ReLU(),
            torch.nn.Conv2d(384, 256, 3, 1, 1), torch.nn.ReLU(),
            torch.nn.Conv2d(256, 256, 3, 1, 1), torch.nn.ReLU(),
        ]
        net = torch.nn.Sequential(*layers)
        sd = {f"features.{i}.{k}": v for i, m in enumerate(layers)
              for k, v in m.state_dict().items()}
        params = B.load_alexnet_torch(sd)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
        ours = B.alexnet_features(
            params, jnp.asarray(x.transpose(0, 2, 3, 1))
        )[-1]
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


class TestVGG19:
    def test_feature_shapes(self):
        params = B.init_vgg19(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 3))
        feats = B.vgg19_features(params, x)
        assert feats["relu1_1"].shape == (1, 64, 64, 64)
        assert feats["relu3_2"].shape == (1, 16, 16, 256)
        assert feats["relu4_2"].shape == (1, 8, 8, 512)
        assert feats["relu5_2"].shape == (1, 4, 4, 512)

    def test_perceptual_loss_zero_for_identical(self):
        params = B.init_vgg19(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        assert float(B.vgg_perceptual_loss(params, img, img)) < 1e-7
        img2 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        assert float(B.vgg_perceptual_loss(params, img, img2)) > 1e-5


class TestLPIPS:
    def test_zero_for_identical(self):
        params = LP.init_lpips(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        assert float(LP.lpips(params, img, img)[0]) < 1e-8

    def test_positive_and_ordered(self):
        params = LP.init_lpips(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        small = jnp.clip(a + 0.02 * rng.normal(size=a.shape), 0, 1)
        big = jnp.asarray(rng.uniform(size=a.shape).astype(np.float32))
        d_small = float(LP.lpips(params, a, small)[0])
        d_big = float(LP.lpips(params, a, big)[0])
        assert 0 < d_small < d_big

    def test_spatial_and_masked(self):
        params = LP.init_lpips(jax.random.PRNGKey(0))
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        m = LP.lpips(params, a, b, spatial=True)
        assert m.shape == (1, 64, 64, 1)
        score = LP.masked_lpips(params, a, b, jnp.ones((1, 64, 64)))
        assert np.isfinite(float(score))
