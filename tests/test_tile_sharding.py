"""Tile-axis sharding of the window compositor on the virtual CPU mesh.

SURVEY.md §5: image tiles sharded across devices, gaussians replicated.
The shard_map'd compositor must reproduce the single-device render and its
gradients (each device composites its block of bucket tile rows; the
binning, packing, reductions and losses stay GSPMD-partitioned).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from tests.test_models import identity_bases, make_gaussians

W, H = 160, 128  # 10x8 = 80 tiles: the bucketed path needs >= 64 tiles
K = jnp.array([[80.0, 0.0, W / 2], [0.0, 80.0, H / 2], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def make_scene():
    fg = make_gaussians(50, seed=3)
    bg = make_gaussians(80, seed=4, with_coefs=False)
    bases = identity_bases(4, 8)
    move = init_move_model(jax.random.PRNGKey(0), num_frames=8)
    return SceneModel(fg=fg, bg=bg, bases=bases, move=move)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    return Mesh(np.array(jax.devices()), ("tile",))


def _render(scene, tile_mesh=None):
    return render(
        scene, 3, EYE4, K, (W, H), mode="blury", stage="second",
        return_mask=True, return_depth=True, num_exposure=3, cap=256,
        tile_mesh=tile_mesh,
    )


class TestTileSharding:
    def test_matches_unsharded(self, mesh):
        scene = make_scene()
        out0 = jax.jit(lambda s: _render(s))(scene)
        out1 = jax.jit(lambda s: _render(s, tile_mesh=mesh))(scene)
        for k in ("img", "acc", "mask", "depth", "pred_sharp_img"):
            np.testing.assert_allclose(
                np.asarray(out1[k]), np.asarray(out0[k]), atol=1e-5,
                err_msg=k,
            )

    def test_grads_match_unsharded(self, mesh):
        scene = make_scene()

        def loss(s, tile_mesh):
            out = _render(s, tile_mesh=tile_mesh)
            return jnp.mean(jnp.abs(out["img"] - 0.5)) + jnp.mean(out["acc"])

        g0 = jax.jit(jax.grad(lambda s: loss(s, None)))(scene)
        g1 = jax.jit(jax.grad(lambda s: loss(s, mesh)))(scene)
        flat0 = jax.tree.leaves(g0)
        flat1 = jax.tree.leaves(g1)
        for a, b in zip(flat1, flat0):
            scale = float(jnp.max(jnp.abs(b))) + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4
            )
