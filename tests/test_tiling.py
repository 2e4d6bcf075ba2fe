"""Pair-expansion binning vs the per-tile masked-top-k reference binning."""

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.ops.projection import project
from deblur4dgs_tpu.ops.tiling import bin_gaussians, bin_gaussians_pairs

W, H = 96, 64
K = jnp.array([[80.0, 0.0, 48.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]])


def make_proj(g=300, seed=0, scale=0.06):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.6, 0.6, (g, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.5, 4.0, g)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    scales = np.full((g, 3), scale, np.float32)
    return project(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.eye(4), K, (W, H),
    )


class TestPairBinningMatchesReference:
    def test_idx_and_counts_equal(self):
        proj = make_proj()
        idx_a, cnt_a, raw_a, ord_a = bin_gaussians(proj, (W, H), cap=256)
        idx_b, cnt_b, raw_b, ord_b = bin_gaussians_pairs(
            proj, (W, H), cap=256, max_tiles_per_gauss=64
        )
        np.testing.assert_array_equal(ord_a, ord_b)
        np.testing.assert_array_equal(raw_a, raw_b)
        np.testing.assert_array_equal(cnt_a, cnt_b)
        np.testing.assert_array_equal(idx_a, idx_b)

    def test_capacity_truncation_identical(self):
        proj = make_proj(600, seed=3, scale=0.15)  # dense overlap
        idx_a, cnt_a, raw_a, _ = bin_gaussians(proj, (W, H), cap=128)
        idx_b, cnt_b, raw_b, _ = bin_gaussians_pairs(
            proj, (W, H), cap=128, max_tiles_per_gauss=256
        )
        np.testing.assert_array_equal(raw_a, raw_b)
        np.testing.assert_array_equal(idx_a, idx_b)
        assert int(jnp.max(raw_a)) > 128  # truncation actually exercised

    def test_depth_order_within_tiles(self):
        proj = make_proj(200, seed=5)
        idx, cnt, _, order = bin_gaussians_pairs(proj, (W, H), cap=256)
        depths = jnp.where(proj.valid, proj.depths, jnp.inf)[order]
        depths = jnp.concatenate([depths, jnp.full((1,), jnp.inf)])
        d = np.asarray(depths)[np.asarray(idx)]
        cnt = np.asarray(cnt)
        for t in range(idx.shape[0]):
            dt = d[t, : cnt[t]]
            assert np.all(np.diff(dt) >= 0), f"tile {t} not depth sorted"

    def test_all_valid_gaussians_covered(self):
        proj = make_proj(150, seed=7)
        idx, cnt, _, order = bin_gaussians_pairs(proj, (W, H), cap=512)
        # every valid gaussian appears in at least one tile
        binned = set(np.asarray(idx).ravel().tolist()) - {150}
        n_valid = int(jnp.sum(proj.valid))
        assert len(binned) == n_valid
