"""Camera trajectory generator tests."""

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.utils import trajectories as T


def make_w2cs(n=6, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        wu = np.concatenate(
            [0.2 * rng.normal(size=3), rng.normal(size=3)]
        ).astype(np.float32)
        out.append(np.asarray(lie.rt_to_mat4(*_rt(lie.se3_exp(jnp.asarray(wu))))))
    return jnp.asarray(np.stack(out))


def _rt(p):
    return p[:3, :3], p[:3, 3]


def _valid_w2cs(w2cs):
    R = w2cs[..., :3, :3]
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-4)


class TestAvgAndLookat:
    def test_avg_of_identical(self):
        w2c = make_w2cs(1)[0]
        avg = T.get_avg_w2c(jnp.broadcast_to(w2c, (4, 4, 4)))
        # same camera center
        np.testing.assert_allclose(
            jnp.linalg.inv(avg)[:3, 3], jnp.linalg.inv(w2c)[:3, 3], atol=1e-4
        )

    def test_lookat_triangulation(self):
        target = jnp.array([0.5, -0.2, 1.0])
        rng = np.random.default_rng(1)
        origins = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) * 2)
        dirs = target - origins
        out = T.get_lookat(origins, dirs)
        np.testing.assert_allclose(out, target, atol=1e-4)

    def test_lookat_w2cs_point_at_target(self):
        target = jnp.array([0.0, 0.0, 2.0])
        pos = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.5, 0.0]])
        w2cs = T.get_lookat_w2cs(pos, target, jnp.array([0.0, -1.0, 0.0]))
        _valid_w2cs(w2cs)
        # the target should project onto the optical axis (x=y=0, z>0)
        for i in range(2):
            cam = w2cs[i, :3, :3] @ target + w2cs[i, :3, 3]
            np.testing.assert_allclose(cam[:2], 0.0, atol=1e-5)
            assert cam[2] > 0


class TestPaths:
    def _check(self, w2cs, n):
        assert w2cs.shape == (n, 4, 4)
        _valid_w2cs(w2cs)
        assert bool(jnp.all(jnp.isfinite(w2cs)))

    def test_arc(self):
        ref = make_w2cs(1)[0]
        lookat = jnp.zeros(3)
        up = jnp.array([0.0, 0.0, 1.0])
        w2cs = T.get_arc_w2cs(ref, lookat, up, 12, degree=30.0)
        self._check(w2cs, 12)
        # constant distance from lookat
        d = jnp.linalg.norm(jnp.linalg.inv(w2cs)[:, :3, 3] - lookat, axis=-1)
        np.testing.assert_allclose(d, d[0], rtol=1e-4)

    def test_lemniscate(self):
        ref = make_w2cs(1)[0]
        w2cs = T.get_lemniscate_w2cs(
            ref, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), 10, degree=20.0
        )
        self._check(w2cs, 10)

    def test_spiral(self):
        ref = make_w2cs(1)[0]
        w2cs = T.get_spiral_w2cs(
            ref, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), 10,
            rads=0.3, zrate=0.5, rots=2,
        )
        self._check(w2cs, 10)

    def test_wander(self):
        ref = make_w2cs(1)[0]
        w2cs = T.get_wander_w2cs(ref, focal_length=400.0, num_frames=8)
        self._check(w2cs, 8)
