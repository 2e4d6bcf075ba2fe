"""Exposure-shared binning vs exact per-sub-frame binning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from tests.test_models import identity_bases, make_gaussians

W, H = 48, 32
K = jnp.array([[40.0, 0.0, 24.0], [0.0, 40.0, 16.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def make_scene(moving=False):
    fg = make_gaussians(40, seed=1)
    bg = make_gaussians(60, seed=2, with_coefs=False)
    bases = identity_bases(4, 8)
    if moving:
        transls = bases.transls.at[0, :, 0].set(
            jnp.linspace(0, 0.4, bases.num_frames)
        )
        bases = bases._replace(transls=transls)
    move = init_move_model(jax.random.PRNGKey(0), num_frames=8)
    return SceneModel(fg=fg, bg=bg, bases=bases, move=move)


def both(scene, **kw):
    a = render(
        scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False,
        num_exposure=5, cap=256, shared_exposure_binning=True, **kw,
    )
    b = render(
        scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False,
        num_exposure=5, cap=256, shared_exposure_binning=False, **kw,
    )
    return a, b


class TestSharedBinning:
    def test_static_exact(self):
        a, b = both(make_scene(moving=False))
        np.testing.assert_allclose(a["img"], b["img"], atol=1e-6)
        np.testing.assert_allclose(a["acc"], b["acc"], atol=1e-6)

    def test_moving_close(self):
        # order differences within the window bound the error; for modest
        # motion the renders should be nearly identical
        a, b = both(make_scene(moving=True))
        assert float(jnp.abs(a["img"] - b["img"]).max()) < 5e-3
        np.testing.assert_allclose(a["img"], b["img"], atol=5e-3)

    def test_grads_close(self):
        scene = make_scene(moving=True)

        def loss(scene, shared):
            out = render(
                scene, 3, EYE4, K, (W, H), mode="blury", use_pallas=False,
                num_exposure=5, cap=256, shared_exposure_binning=shared,
            )
            return jnp.mean(out["img"] ** 2)

        ga = jax.grad(lambda s: loss(s, True))(scene)
        gb = jax.grad(lambda s: loss(s, False))(scene)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(a, b, atol=2e-3, rtol=0.05)

    def test_channels_and_depth(self):
        scene = make_scene(moving=True)
        a, b = both(
            scene, return_mask=True, return_depth=True,
            target_ts=jnp.array([1.0, 4.0]),
            target_w2cs=jnp.broadcast_to(EYE4, (2, 4, 4)),
        )
        np.testing.assert_allclose(a["mask"], b["mask"], atol=5e-3)
        np.testing.assert_allclose(a["tracks_3d"], b["tracks_3d"], atol=1e-2)
        sel = np.asarray(a["acc"][..., 0]) > 0.5
        np.testing.assert_allclose(
            np.asarray(a["depth"][..., 0])[sel],
            np.asarray(b["depth"][..., 0])[sel], atol=1e-2,
        )
