"""Scene-bootstrap (init) pipeline tests on synthetic tracks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.data.observations import StaticObservations, TrackObservations
from deblur4dgs_tpu.models.motion_bases import compute_transforms
from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.train import init as I


def make_tracks(num=200, T=8, num_clusters=2, seed=0):
    """Tracks from `num_clusters` rigid groups with known SE(3) motions."""
    rng = np.random.default_rng(seed)
    pts, labels = [], []
    motions = []  # per-cluster per-frame poses
    for c in range(num_clusters):
        base = rng.normal(size=3) * 2.0
        cluster_pts = base + rng.normal(size=(num // num_clusters, 3)) * 0.3
        poses = []
        for t in range(T):
            wu = np.concatenate([
                0.05 * t * np.array([0.0, 0.0, 1.0]) * (c + 1),
                0.15 * t * np.array([1.0, 0.5 * c, 0.0]),
            ]).astype(np.float32)
            poses.append(np.asarray(lie.se3_exp(jnp.asarray(wu))))
        motions.append(poses)
        traj = np.stack(
            [cluster_pts @ p[:3, :3].T + p[:3, 3] for p in poses], axis=1
        )
        pts.append(traj)
        labels += [c] * (num // num_clusters)
    xyz = np.concatenate(pts).astype(np.float32)
    n = xyz.shape[0]
    return (
        TrackObservations(
            xyz=jnp.asarray(xyz),
            visibles=jnp.ones((n, T), bool),
            invisibles=jnp.zeros((n, T), bool),
            confidences=jnp.ones((n, T)),
            colors=jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)),
        ),
        np.array(labels),
        motions,
    )


class TestFGInit:
    def test_shapes_and_activations(self):
        tracks, _, _ = make_tracks()
        coefs = jnp.ones((tracks.xyz.shape[0], 4))
        g = I.init_fg_from_tracks_3d(0, tracks, coefs)
        n = tracks.xyz.shape[0]
        assert g.means.shape == (n, 3)
        np.testing.assert_allclose(g.means, tracks.xyz[:, 0], atol=1e-6)
        # opacity logit(0.7)
        np.testing.assert_allclose(
            jax.nn.sigmoid(g.opacities), 0.7, atol=1e-5
        )
        # colors roundtrip
        np.testing.assert_allclose(
            jax.nn.sigmoid(g.colors), tracks.colors, atol=1e-4
        )
        assert bool(jnp.all(jnp.isfinite(g.scales)))


class TestBGInit:
    def test_normal_aligned_quats(self):
        rng = np.random.default_rng(0)
        n = 100
        pts = StaticObservations(
            xyz=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 2),
            normals=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            colors=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)),
        )
        g, scene_scale = I.init_bg(pts)
        assert scene_scale > 0
        # rotating +z by the quat gives the normal direction
        R = lie.quat_to_rmat(lie.quat_normalize(g.quats))
        z_rot = R @ jnp.array([0.0, 0.0, 1.0])
        normals = pts.normals / jnp.linalg.norm(pts.normals, axis=-1, keepdims=True)
        dots = jnp.sum(z_rot * normals, axis=-1)
        assert float(dots.min()) > 0.99


class TestProcrustes:
    def test_recovers_cluster_motion(self):
        tracks, labels, motions = make_tracks(num=200, num_clusters=2)
        bases, coefs, filtered = I.init_motion_params_with_procrustes(
            tracks, num_bases=2, cano_t=0
        )
        assert bases.rots.shape[0] == 2
        # the recovered transforms should map canonical points to each
        # frame's points for at least one basis per cluster
        T = bases.num_frames
        xyz = np.asarray(filtered.xyz)
        for t in [2, 5, 7]:
            tf = compute_transforms(
                bases, jnp.asarray([float(t)]),
                jax.nn.softmax(coefs * 100, axis=-1),  # hard assignment
            )
            pred = np.asarray(
                jnp.einsum(
                    "gbij,gj->gbi", tf,
                    jnp.concatenate(
                        [filtered.xyz[:, 0], jnp.ones((xyz.shape[0], 1))], -1
                    ),
                )
            )[:, 0]
            err = np.linalg.norm(pred - xyz[:, t], axis=-1)
            assert np.median(err) < 0.05, (t, np.median(err))


class TestInterp:
    def test_fills_gaps(self):
        vals = np.arange(10, dtype=np.float32)[None, :, None].repeat(2, 0).repeat(3, 2)
        mask = np.ones((2, 10), bool)
        mask[0, 3:6] = False
        vals_cor = vals.copy()
        vals_cor[0, 3:6] = -99
        out = I.interp_masked(vals_cor, mask)
        np.testing.assert_allclose(out[0, :, 0], np.arange(10), atol=1e-5)


class TestInitialOptim:
    def test_reduces_track_loss(self):
        tracks, labels, _ = make_tracks(num=120, num_clusters=2, seed=3)
        bases, coefs, filtered = I.init_motion_params_with_procrustes(
            tracks, num_bases=2, cano_t=0
        )
        fg = I.init_fg_from_tracks_3d(0, filtered, coefs)
        # perturb the bases: initial optim should recover
        bases = bases._replace(transls=bases.transls + 0.05)
        T = bases.num_frames
        Ks = jnp.broadcast_to(
            jnp.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]), (T, 3, 3)
        )
        w2cs = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(6.0), (T, 4, 4))
        fg2, bases2, losses = I.run_initial_optim(
            fg, bases, filtered, Ks, w2cs, num_iters=150
        )
        assert bool(jnp.all(jnp.isfinite(losses)))
        assert float(losses[-1]) < float(losses[0]) * 0.5, (
            float(losses[0]), float(losses[-1]),
        )
