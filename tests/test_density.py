"""Fixed-capacity density control tests."""

import jax
import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.configs import OptimizerConfig, SceneLRConfig
from deblur4dgs_tpu.models.gaussians import Gaussians, pad_to_capacity
from deblur4dgs_tpu.train.density import (
    cull_group,
    densify_group,
    reset_opacities_group,
)


def make_group(n=20, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    g = Gaussians(
        means=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        scales=jnp.asarray(rng.uniform(-7, -5, (n, 3)).astype(np.float32)),
        colors=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        opacities=jnp.full((n,), 2.0, jnp.float32),
        motion_coefs=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        alive=jnp.ones((n,), jnp.float32),
    )
    return pad_to_capacity(g, cap)


class TestDensify:
    def test_dup_small_high_grad(self):
        g = make_group()
        cfg = OptimizerConfig()
        grad = jnp.zeros(64).at[3].set(1.0)  # only gaussian 3 has high grad
        radii = jnp.zeros(64)
        out, rep = densify_group(g, grad, radii, cfg, use_screen=True)
        # scales are tiny -> dup path: one new gaussian, original kept
        assert int(rep.num_dup) == 1 and int(rep.num_split) == 0
        assert int(out.num_alive()) == 21
        # the new slot is a copy of gaussian 3
        slot = int(jnp.argmax(rep.new_slot_mask))
        np.testing.assert_allclose(out.means[slot], g.means[3], atol=1e-6)
        np.testing.assert_allclose(out.scales[slot], g.scales[3], atol=1e-6)

    def test_split_big_high_grad(self):
        g = make_group()
        g = g._replace(scales=g.scales.at[5].set(jnp.log(0.5)))  # big
        cfg = OptimizerConfig()
        grad = jnp.zeros(64).at[5].set(1.0)
        out, rep = densify_group(g, grad, jnp.zeros(64), cfg, use_screen=True)
        assert int(rep.num_split) == 1 and int(rep.num_dup) == 0
        # original killed, two children written (its slot may be reused)
        assert int(out.num_alive()) == 21
        slots = np.where(np.asarray(rep.new_slot_mask) > 0)[0]
        assert len(slots) == 2
        for s in slots:
            np.testing.assert_allclose(
                out.scales[s], g.scales[5] - np.log(1.6), atol=1e-5
            )
            np.testing.assert_allclose(out.means[s], g.means[5], atol=1e-6)

    def test_capacity_exhaustion_drops(self):
        g = make_group(n=60, cap=64)
        cfg = OptimizerConfig()
        grad = jnp.ones(64)  # everything wants to densify
        out, rep = densify_group(g, grad, jnp.zeros(64), cfg, use_screen=True)
        assert int(rep.num_dropped) > 0
        assert int(out.num_alive()) <= 64

    def test_dead_slots_ignored(self):
        g = make_group()
        cfg = OptimizerConfig()
        grad = jnp.ones(64)  # high everywhere, but only alive count
        out, rep = densify_group(g, grad, jnp.zeros(64), cfg, use_screen=True)
        assert int(rep.num_dup) == 20  # only the 20 alive


class TestCull:
    def test_cull_by_opacity(self):
        g = make_group()
        g = g._replace(opacities=g.opacities.at[2].set(-5.0))  # tiny opacity
        out, n = cull_group(
            g, jnp.zeros(64), OptimizerConfig(), 1.0, use_scale=False,
            use_screen=False,
        )
        assert int(n) == 1
        assert not bool(out.get_alive()[2])
        assert int(out.num_alive()) == 19

    def test_cull_by_scale_with_scene_scale(self):
        g = make_group()
        g = g._replace(scales=g.scales.at[4].set(jnp.log(2.0)))
        cfg = OptimizerConfig()  # cull_scale_threshold 0.5
        out, n = cull_group(g, jnp.zeros(64), cfg, 1.0, True, False)
        assert int(n) == 1 and not bool(out.get_alive()[4])
        # larger scene scale tolerates it
        out2, n2 = cull_group(g, jnp.zeros(64), cfg, 10.0, True, False)
        assert int(n2) == 0

    def test_cull_by_radius(self):
        g = make_group()
        radii = jnp.zeros(64).at[7].set(0.5)
        out, n = cull_group(g, radii, OptimizerConfig(), 1.0, False, True)
        assert int(n) == 1 and not bool(out.get_alive()[7])


class TestResetOpacity:
    def test_reset(self):
        g = make_group()
        cfg = OptimizerConfig()
        out = reset_opacities_group(g, cfg)
        target = 0.8 * cfg.cull_opacity_threshold
        op = jax.nn.sigmoid(out.opacities)
        alive = np.asarray(out.get_alive())
        np.testing.assert_allclose(np.asarray(op)[alive], target, atol=1e-5)
        # dead slots untouched
        dead = ~alive
        np.testing.assert_allclose(
            np.asarray(out.opacities)[dead], np.asarray(g.opacities)[dead]
        )

    def test_reset_only_lowers(self):
        g = make_group()
        g = g._replace(opacities=g.opacities.at[0].set(-8.0))
        out = reset_opacities_group(g, OptimizerConfig())
        assert float(out.opacities[0]) == -8.0  # min() keeps lower values
