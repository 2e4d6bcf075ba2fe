"""End-to-end training smoke tests on a synthetic scene (CPU, tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.data import synthetic
from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from deblur4dgs_tpu.train.optimizers import make_optimizer
from deblur4dgs_tpu.train.trainer import (
    FrameBatch,
    TrackBatch,
    init_train_state,
    make_train_step,
)


@pytest.fixture(scope="module")
def scene_and_data():
    scene = synthetic.make_scene(
        seed=0, num_fg=80, num_bg=200, num_frames=8, img_wh=(48, 32)
    )
    data = synthetic.generate_dataset(scene, num_blur_samples=5, num_tracks=32)
    return scene, data


def degraded_scene_model(gt: synthetic.SyntheticScene, key) -> SceneModel:
    """GT scene + noise: training should improve it."""
    # deep-copy: the train step donates its state, which would otherwise
    # delete the shared fixture arrays
    gt = jax.tree.map(lambda x: jnp.array(x, copy=True), gt)
    k1, k2, k3 = jax.random.split(key, 3)
    fg = gt.fg._replace(
        means=gt.fg.means + 0.03 * jax.random.normal(k1, gt.fg.means.shape),
        colors=gt.fg.colors + 0.5 * jax.random.normal(k2, gt.fg.colors.shape),
        alive=jnp.ones((gt.fg.capacity,), jnp.float32),
    )
    bg = gt.bg._replace(
        colors=gt.bg.colors + 0.5 * jax.random.normal(k3, gt.bg.colors.shape),
        alive=jnp.ones((gt.bg.capacity,), jnp.float32),
    )
    bases = gt.bases._replace(
        transls=gt.bases.transls + 0.01,
    )
    move = init_move_model(jax.random.PRNGKey(7), num_frames=8)
    return SceneModel(fg=fg, bg=bg, bases=bases, move=move)


def make_batches(data, idx3, dyn_idx):
    def fb(ids):
        ids = jnp.asarray(ids)
        return FrameBatch(
            ts=ids.astype(jnp.int32),
            w2cs=data.w2cs[ids],
            Ks=data.Ks[ids],
            imgs=data.imgs[ids],
            masks=data.masks[ids],
            valid_masks=jnp.ones_like(data.masks[ids]),
            depths=data.depths[ids],
        )

    batch_static = fb(idx3)
    batch_dyn = fb([dyn_idx])
    # track supervision: 2 target frames. Query pixels must be on-grid and
    # visible at the query frame (guaranteed by the reference's dataset).
    tts = jnp.asarray([max(0, dyn_idx - 1), min(7, dyn_idx + 1)])
    W = data.imgs.shape[2]
    H = data.imgs.shape[1]
    q = jnp.floor(data.tracks_2d[dyn_idx])
    q = jnp.stack([q[:, 0].clip(0, W - 1), q[:, 1].clip(0, H - 1)], -1)
    q_vis = data.track_visibles[dyn_idx].astype(jnp.float32)
    tracks = TrackBatch(
        query_tracks_2d=q,
        target_ts=tts,
        target_w2cs=data.w2cs[tts],
        target_Ks=data.Ks[tts],
        target_tracks_2d=data.tracks_2d[tts],
        target_visibles=data.track_visibles[tts].astype(jnp.float32)
        * q_vis[None],
        target_confidences=jnp.ones_like(data.track_depths[tts]),
        target_track_depths=data.track_depths[tts],
    )
    return batch_static, batch_dyn, tracks


class TestStaticTraining:
    def test_static_loss_decreases(self, scene_and_data):
        gt, data = scene_and_data
        model = degraded_scene_model(gt, jax.random.PRNGKey(0))
        lr = SceneLRConfig()
        lcfg = LossesConfig()
        rcfg = RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False)
        ocfg = OptimizerConfig()
        state = init_train_state(model, lr, ocfg)
        step = make_train_step(
            make_optimizer(model, lr, ocfg), lcfg, rcfg, "first", 8,
            has_static=True, has_dynamic=False, has_reg=False,
        )
        bs, _, _ = make_batches(data, [2, 3, 4], 3)
        losses = []
        for i in range(15):
            state, loss, aux = step(
                state, jnp.asarray(i // 1), bs, None, None, None, None
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.95, losses

    def test_density_stats_accumulate(self, scene_and_data):
        gt, data = scene_and_data
        model = degraded_scene_model(gt, jax.random.PRNGKey(0))
        lr = SceneLRConfig()
        ocfg = OptimizerConfig()
        state = init_train_state(model, lr, ocfg)
        step = make_train_step(
            make_optimizer(model, lr, ocfg), LossesConfig(),
            RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False),
            "first", 8, has_static=True, has_dynamic=False, has_reg=False,
        )
        bs, _, _ = make_batches(data, [2, 3, 4], 3)
        state, _, _ = step(state, jnp.asarray(0), bs, None, None, None, None)
        nfg = model.num_fg
        # bg slice got stats; fg slice untouched (bg_only branch)
        assert int(state.stats.vis_count[nfg:].sum()) > 0
        assert int(state.stats.vis_count[:nfg].sum()) == 0
        assert float(state.stats.grad_norm_acc[nfg:].sum()) > 0
        assert float(state.stats.max_radii[nfg:].max()) > 0


class TestDynamicTraining:
    def test_dynamic_step_runs_and_improves(self, scene_and_data):
        gt, data = scene_and_data
        model = degraded_scene_model(gt, jax.random.PRNGKey(1))
        lr = SceneLRConfig()
        lcfg = LossesConfig()
        rcfg = RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False)
        ocfg = OptimizerConfig()
        state = init_train_state(model, lr, ocfg)
        step = make_train_step(
            make_optimizer(model, lr, ocfg), lcfg, rcfg, "second", 8,
            has_static=True, has_dynamic=True, has_reg=False,
        )
        losses = []
        for i in range(12):
            dyn_idx = 2 + (i % 4)
            bs, bd, tr = make_batches(data, [2, 3, 4], dyn_idx)
            state, loss, aux = step(
                state, jnp.asarray(25), bs, bd, tr, None, None
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # compare like-for-like frames one sweep apart (some frames have
        # much larger absolute loss than others)
        first, last = np.array(losses[:4]), np.array(losses[-4:])
        assert last.sum() < first.sum(), losses
        # stats now cover fg too (dynamic branch is last without reg)
        assert int(state.stats.vis_count[: model.num_fg].sum()) > 0

    def test_psnr_improves_on_sharp_eval(self, scene_and_data):
        gt, data = scene_and_data
        model = degraded_scene_model(gt, jax.random.PRNGKey(2))
        lr = SceneLRConfig()
        rcfg = RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False)
        ocfg = OptimizerConfig()

        def psnr(m):
            out = render(
                m, 3, data.w2cs[3], data.Ks[3], (48, 32), mode="mid",
                stage="second", use_pallas=False, num_exposure=3, cap=256,
            )
            mse = jnp.mean((out["img"] - data.sharp_imgs[3]) ** 2)
            return float(-10 * jnp.log10(mse))

        p0 = psnr(model)
        state = init_train_state(model, lr, ocfg)
        step = make_train_step(
            make_optimizer(model, lr, ocfg), LossesConfig(), rcfg, "second",
            8, has_static=True, has_dynamic=True, has_reg=False,
        )
        for i in range(20):
            dyn_idx = 2 + (i % 4)
            bs, bd, tr = make_batches(data, [2, 3, 4], dyn_idx)
            state, loss, _ = step(state, jnp.asarray(25), bs, bd, tr, None, None)
        p1 = psnr(state.scene)
        assert p1 > p0 + 0.3, (p0, p1)
