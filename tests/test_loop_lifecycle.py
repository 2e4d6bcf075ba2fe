"""TrainLoop lifecycle: stage-end NaN trap, bounded loss history,
stage-end tile_overflow reporting (VERDICT r2 item 8).

The in-loop NaN trap fires at log cadence only (PARITY §20); finish()
covers the tail steps of a stage whose total isn't a multiple of
log_every, and reports the final tile_overflow even without a writer.
"""

from collections import deque

import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.configs import (
    LossesConfig,
    OptimizerConfig,
    RenderConfig,
    SceneLRConfig,
)
from deblur4dgs_tpu.train.loop import TrainLoop
from deblur4dgs_tpu.train.optimizers import make_optimizer
from deblur4dgs_tpu.train.trainer import init_train_state

from tests.test_train_e2e import (
    degraded_scene_model,
    make_batches,
    scene_and_data,  # noqa: F401  (fixture)
)


def make_loop(scene_and_data, tmp_path, key=3):
    import jax

    gt, data = scene_and_data
    model = degraded_scene_model(gt, jax.random.PRNGKey(key))
    lr = SceneLRConfig()
    ocfg = OptimizerConfig()
    state = init_train_state(model, lr, ocfg)
    loop = TrainLoop(
        state, make_optimizer(model, lr, ocfg), LossesConfig(),
        RenderConfig(num_exposure=3, tile_cap=256, use_pallas=False),
        ocfg, 8, str(tmp_path), "first",
        has_static=True, has_dynamic=False, has_reg=False,
        checkpoint_every=0, log_every=10,
    )
    return loop, data


class TestLoopLifecycle:
    def test_loss_history_bounded_and_finish_reports(
        self, scene_and_data, tmp_path, capsys  # noqa: F811
    ):
        loop, data = make_loop(scene_and_data, tmp_path)
        assert isinstance(loop.losses, deque)
        assert loop.losses.maxlen is not None
        bs, _, _ = make_batches(data, [2, 3, 4], 3)
        # 3 steps: not a multiple of log_every=10 — the in-loop trap never
        # fires; finish() still checks the final loss and reports overflow
        for _ in range(3):
            loop.train_step(bs, None, None, None)
        assert len(loop.losses) == 3
        loop.finish()
        outp = capsys.readouterr().out
        assert "tile_overflow" in outp
        assert "static=" in outp
        # bounded history: appending past maxlen never grows the deque
        for _ in range(loop.losses.maxlen + 5):
            loop.losses.append(jnp.asarray(0.0))
        assert len(loop.losses) == loop.losses.maxlen

    def test_finish_traps_final_nan(self, tmp_path):
        loop = object.__new__(TrainLoop)
        loop.losses = deque([jnp.asarray(1.0), jnp.asarray(np.nan)])
        loop._last_aux = None
        loop.global_step = 7
        loop.work_dir = str(tmp_path)
        with pytest.raises(FloatingPointError):
            loop.finish()

    def test_finish_noop_when_empty(self, tmp_path):
        loop = object.__new__(TrainLoop)
        loop.losses = deque()
        loop._last_aux = None
        loop.global_step = 0
        loop.work_dir = str(tmp_path)
        loop.finish()  # no steps taken: nothing to check
