"""Count-sorted tile buckets vs the dense uniform-CAP layout.

Bucketing (ops/tiling.py bucket_tiles) re-permutes tiles by occupancy and
gives each rank bucket its own capacity. When no bucket truncates (every
tile's count fits its bucket's cap), compositing must be bit-identical to
the dense layout — the tile lists are the same front-most prefixes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.models.move_model import init_move_model
from deblur4dgs_tpu.models.scene import SceneModel, render
from deblur4dgs_tpu.ops.tiling import (
    MIN_CAP,
    bucket_tiles,
    default_bucket_spec,
)
from tests.test_models import identity_bases, make_gaussians

W, H = 48, 32
K = jnp.array([[40.0, 0.0, 24.0], [0.0, 40.0, 16.0], [0.0, 0.0, 1.0]])
EYE4 = jnp.eye(4)


def make_scene():
    fg = make_gaussians(40, seed=1)
    bg = make_gaussians(60, seed=2, with_coefs=False)
    bases = identity_bases(4, 8)
    transls = bases.transls.at[0, :, 0].set(
        jnp.linspace(0, 0.4, bases.num_frames)
    )
    move = init_move_model(jax.random.PRNGKey(0), num_frames=8)
    return SceneModel(
        fg=fg, bg=bg, bases=bases._replace(transls=transls), move=move
    )


class TestBucketSpec:
    @pytest.mark.parametrize("T,cap", [(6, 256), (3600, 1024), (1, 128),
                                       (16, 512), (4050, 256)])
    def test_spec_invariants(self, T, cap):
        spec = default_bucket_spec(T, cap)
        sizes = [n for n, _ in spec]
        caps = [c for _, c in spec]
        assert sum(sizes) == T
        assert all(n > 0 for n in sizes)
        assert all(c % MIN_CAP == 0 and MIN_CAP <= c <= max(cap, MIN_CAP)
                   for c in caps)
        assert caps == sorted(caps, reverse=True)  # heavy ranks first
        assert len(set(caps)) == len(caps)  # equal-cap buckets merged

    def test_bucket_tiles_partition(self):
        T, CAP, G = 24, 256, 50
        rng = np.random.default_rng(0)
        raw = jnp.asarray(rng.integers(0, 300, T, dtype=np.int32))
        counts = jnp.minimum(raw, CAP)
        gi = jnp.asarray(
            rng.integers(0, G + 1, (T, CAP), dtype=np.int32)
        )
        spec = default_bucket_spec(T, CAP)
        b = bucket_tiles(gi, counts, raw, G, spec)
        # every image tile appears in exactly one bucket
        seen = np.concatenate(
            [np.asarray(ids[:n]) for ids, n in zip(b.tile_ids, b.sizes)]
        )
        assert sorted(seen.tolist()) == list(range(T))
        # heavy tiles land in the first bucket
        order = np.argsort(-np.asarray(raw))
        np.testing.assert_array_equal(
            np.asarray(b.tile_ids[0][: b.sizes[0]]), order[: b.sizes[0]]
        )
        # per-bucket counts are capped at the bucket capacity
        for cnt, cap_b in zip(b.counts, b.caps):
            assert int(jnp.max(cnt)) <= cap_b
        # gather rows are the front-most prefix of the full lists
        ids0 = np.asarray(b.tile_ids[0][: b.sizes[0]])
        np.testing.assert_array_equal(
            np.asarray(b.gather_idx[0][: b.sizes[0]]),
            np.asarray(gi)[ids0, : b.caps[0]],
        )


class TestBucketedRender:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_dense(self, use_pallas):
        scene = make_scene()
        kw = dict(
            mode="blury", num_exposure=5, cap=256,
            shared_exposure_binning=True, return_mask=True,
            return_depth=True, use_pallas=use_pallas,
        )
        a = render(scene, 3, EYE4, K, (W, H), bucketed=True, **kw)
        b = render(scene, 3, EYE4, K, (W, H), bucketed=False, **kw)
        # no truncation at these occupancies -> same lists, same compositing
        np.testing.assert_allclose(a["img"], b["img"], atol=1e-6)
        np.testing.assert_allclose(a["mask"], b["mask"], atol=1e-6)
        np.testing.assert_allclose(a["depth"], b["depth"], atol=1e-6)
        np.testing.assert_allclose(a["acc"], b["acc"], atol=1e-6)

    def test_mask_stack_matches_unbucketed(self):
        """The bucketed window compositor's per-sub-frame mask stack
        (stack_mask slab) equals the non-bucketed path's — exercised on an
        image large enough (>= 64 tiles) that bucketing actually engages."""
        Wb, Hb = 128, 128
        Kb = jnp.array(
            [[110.0, 0.0, 64.0], [0.0, 110.0, 64.0], [0.0, 0.0, 1.0]]
        )
        scene = make_scene()
        kw = dict(
            mode="blury", num_exposure=3, cap=256,
            shared_exposure_binning=True, return_mask=True,
            use_pallas=False,
        )
        a = render(scene, 3, EYE4, Kb, (Wb, Hb), bucketed=True, **kw)
        b = render(scene, 3, EYE4, Kb, (Wb, Hb), bucketed=False, **kw)
        assert a["exposure_masks"].shape == (3, Hb, Wb, 1)
        np.testing.assert_allclose(
            a["exposure_masks"], b["exposure_masks"], atol=1e-6
        )
        np.testing.assert_allclose(a["img"], b["img"], atol=1e-6)

    def test_scatter_output_path_matches_gather(self, monkeypatch):
        """The scatter-output window path (composite_buckets_scatter:
        kernels write image-tile-ordered rows via prefetched index maps,
        buckets chained by input_output_aliases) is bit-identical to the
        bucket-ordered + inverse-permutation-gather path, forward and
        backward, including mask/depth channels and the exposure stacks."""
        import deblur4dgs_tpu.ops.rasterize as R

        Wb, Hb = 128, 128
        Kb = jnp.array(
            [[110.0, 0.0, 64.0], [0.0, 110.0, 64.0], [0.0, 0.0, 1.0]]
        )
        scene = make_scene()
        kw = dict(
            mode="blury", num_exposure=3, cap=256, bucketed=True,
            shared_exposure_binning=True, return_mask=True,
            return_depth=True, use_pallas=True,
        )

        def run(use_scatter):
            monkeypatch.setattr(R, "_USE_SCATTER", use_scatter)
            return render(scene, 3, EYE4, Kb, (Wb, Hb), **kw)

        a, b = run(True), run(False)
        for k in ("img", "mask", "depth", "acc", "exposure_imgs",
                  "exposure_masks", "pred_sharp_img"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

        def loss(fg_means, use_scatter):
            monkeypatch.setattr(R, "_USE_SCATTER", use_scatter)
            s = scene._replace(fg=scene.fg._replace(means=fg_means))
            out = render(s, 3, EYE4, Kb, (Wb, Hb), **kw)
            return (
                jnp.sum(out["img"] ** 2)
                + jnp.sum(out["mask"])
                + jnp.sum(out["exposure_imgs"][0])
            )

        ga = jax.grad(lambda m: loss(m, True))(scene.fg.means)
        gb = jax.grad(lambda m: loss(m, False))(scene.fg.means)
        np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-7)

    def test_grads_match(self):
        scene = make_scene()

        def loss(fg_means, bucketed):
            s = scene._replace(fg=scene.fg._replace(means=fg_means))
            out = render(
                s, 3, EYE4, K, (W, H), mode="blury", num_exposure=3,
                cap=256, use_pallas=False, bucketed=bucketed,
            )
            return jnp.sum(out["img"] ** 2)

        ga = jax.grad(loss)(scene.fg.means, True)
        gb = jax.grad(loss)(scene.fg.means, False)
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)
