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


def _train_inputs(rng_seed=0):
    from deblur4dgs_tpu.train.trainer import FrameBatch, TrackBatch

    rng = np.random.default_rng(rng_seed)

    def fb(b):
        return FrameBatch(
            ts=jnp.arange(2, 2 + b, dtype=jnp.int32),
            w2cs=jnp.broadcast_to(EYE4, (b, 4, 4)),
            Ks=jnp.broadcast_to(K, (b, 3, 3)),
            imgs=jnp.asarray(
                rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32)
            ),
            masks=jnp.asarray(
                (rng.uniform(size=(b, H, W)) < 0.3).astype(np.float32)
            ),
            valid_masks=jnp.ones((b, H, W)),
            depths=jnp.asarray(
                rng.uniform(1, 5, (b, H, W)).astype(np.float32)
            ),
        )

    P = 16
    tracks = TrackBatch(
        query_tracks_2d=jnp.asarray(
            np.stack([rng.integers(0, W, P), rng.integers(0, H, P)], -1)
            .astype(np.float32)
        ),
        target_ts=jnp.asarray([1, 3], jnp.int32),
        target_w2cs=jnp.broadcast_to(EYE4, (2, 4, 4)),
        target_Ks=jnp.broadcast_to(K, (2, 3, 3)),
        target_tracks_2d=jnp.asarray(
            rng.uniform(0, W, (2, P, 2)).astype(np.float32)
        ),
        target_visibles=jnp.ones((2, P)),
        target_confidences=jnp.ones((2, P)),
        target_track_depths=jnp.asarray(
            rng.uniform(1, 5, (2, P)).astype(np.float32)
        ),
    )
    return fb, tracks


class TestFullTrainStepSharded:
    """VERDICT r1 item 4b: the FULL jitted train step (all three loss
    branches + optimizer + density stats) over the tile-sharded Pallas
    compositor must match the unsharded step."""

    def _run_step(self, tile_mesh):
        from deblur4dgs_tpu.configs import (
            LossesConfig,
            OptimizerConfig,
            RenderConfig,
            SceneLRConfig,
        )
        from deblur4dgs_tpu.train.optimizers import make_optimizer
        from deblur4dgs_tpu.train.trainer import (
            init_train_state,
            make_train_step,
        )

        scene = make_scene()
        lr, ocfg, lcfg = SceneLRConfig(), OptimizerConfig(), LossesConfig()
        rcfg = RenderConfig(num_exposure=3, tile_cap=256)
        state = init_train_state(scene, lr, ocfg)
        step = make_train_step(
            make_optimizer(scene, lr, ocfg), lcfg, rcfg, "second", 8,
            has_static=True, has_dynamic=True, has_reg=True,
            tile_mesh=tile_mesh,
        )
        fb, tracks = _train_inputs()
        state, loss, _ = step(
            state, jnp.asarray(25), fb(3), fb(1), tracks, fb(2), None
        )
        jax.block_until_ready(loss)
        return state, float(loss)

    def test_step_matches_unsharded(self, mesh):
        s0, l0 = self._run_step(None)
        s1, l1 = self._run_step(mesh)
        assert np.isfinite(l0)
        np.testing.assert_allclose(l1, l0, rtol=1e-4)
        for a, b in zip(
            jax.tree.leaves(s1.scene), jax.tree.leaves(s0.scene)
        ):
            scale = float(jnp.max(jnp.abs(np.asarray(b)))) + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
            )
        # density stats (per-gaussian psum'd reductions) must agree too
        np.testing.assert_allclose(
            np.asarray(s1.stats.vis_count), np.asarray(s0.stats.vis_count)
        )
