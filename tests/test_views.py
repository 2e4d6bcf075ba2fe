"""Dataset view tests (resolution pyramid + temporal windows)."""

import numpy as np
import pytest

from deblur4dgs_tpu.data import synthetic
from deblur4dgs_tpu.data.views import DownsampleView, WindowView


@pytest.fixture(scope="module")
def adapter():
    scene = synthetic.make_scene(
        seed=0, num_fg=40, num_bg=80, num_frames=8, img_wh=(64, 48)
    )
    data = synthetic.generate_dataset(scene, num_blur_samples=3, num_tracks=20)
    return synthetic.SyntheticSceneAdapter(scene, data)


class TestDownsampleView:
    def test_shapes_and_intrinsics(self, adapter):
        v = DownsampleView(adapter, 4)
        assert v.get_img_wh() == (16, 12)
        assert v.imgs.shape == (8, 12, 16, 3)
        np.testing.assert_allclose(v.Ks[:, :2] * 4, adapter.Ks[:, :2])
        np.testing.assert_allclose(v.Ks[:, 2], adapter.Ks[:, 2])

    def test_area_downsampling_preserves_mean(self, adapter):
        v = DownsampleView(adapter, 4)
        np.testing.assert_allclose(
            v.imgs.mean(), np.asarray(adapter.imgs).mean(), atol=1e-5
        )

    def test_item_scaled_tracks(self, adapter):
        v = DownsampleView(adapter, 4)
        item = v.get_item(2)
        W, H = v.get_img_wh()
        q = np.asarray(item["query_tracks_2d"])
        assert q[:, 0].max() <= W - 1 and q[:, 1].max() <= H - 1
        np.testing.assert_allclose(
            np.asarray(item["target_Ks"])[:, :2] * 4,
            np.asarray(adapter.get_item(2)["target_Ks"])[:, :2],
            rtol=1e-5,
        )


class TestWindowView:
    def test_reindexing(self, adapter):
        w = WindowView(adapter, [3, 4, 5, 6])
        assert len(w) == 4
        assert w.get_dyn_image_ids() == [0, 1, 2, 3]
        item = w.get_item(1)
        assert item["ts"] == 1
        np.testing.assert_allclose(item["imgs"], adapter.get_item(4)["imgs"])

    def test_targets_within_window(self, adapter):
        w = WindowView(adapter, [2, 3, 4, 5])
        for i in range(4):
            item = w.get_item(i)
            assert np.all(np.asarray(item["target_ts"]) < 4)
            assert item["target_w2cs"].shape[0] == len(item["target_ts"])

    def test_target_track_arrays_coherent_with_resampled_targets(self, adapter):
        """Round-4 regression: get_item resamples target_ts/w2cs/Ks into
        the window, so EVERY target-indexed track array must be re-paired
        for the SAME frames. The pre-fix synthetic path kept the base
        item's arrays (sampled for different frames), silently scoring
        frame-A track positions against frame-B cameras/times — incoherent
        supervision that flattened the learned motion field."""
        w = WindowView(adapter, [2, 3, 4, 5])
        d = adapter.data
        for i in range(4):
            item = w.get_item(i)
            tids = np.asarray(item["target_ts"])
            g = [w.window[int(t)] for t in tids]
            np.testing.assert_allclose(
                np.asarray(item["target_tracks_2d"]),
                np.asarray(d.tracks_2d)[g],
            )
            np.testing.assert_allclose(
                np.asarray(item["target_track_depths"]),
                np.asarray(d.track_depths)[g],
            )
            np.testing.assert_allclose(
                np.asarray(item["target_w2cs"]), np.asarray(adapter.w2cs)[g]
            )
            src = w.window[i]
            vis_expect = (
                np.asarray(d.track_visibles)[g].astype(np.float32)
                * np.asarray(d.track_visibles[src], np.float32)[None]
            )
            np.testing.assert_allclose(
                np.asarray(item["target_visibles"]), vis_expect
            )

    def test_window_tracks(self, adapter):
        w = WindowView(adapter, [1, 2, 3])
        tr = w.get_tracks_3d(num_samples=15)
        assert tr.xyz.shape[1] == 3
        full = adapter.get_tracks_3d(num_samples=15)
        assert full.xyz.shape[1] == 8


class TestBlurUnionMasks:
    def test_union_covers_sharp_and_streaks(self):
        """blur_union_masks=True must emit a superset of the mid-exposure
        mask that includes motion-streak coverage (the reference's masks
        are segmented from blurry frames; a sharp mask penalizes the
        correctly-sweeping solution through the mask loss)."""
        sc = synthetic.make_scene(
            seed=0, num_fg=40, num_bg=80, num_frames=4, img_wh=(48, 32),
            exposure=0.6, exp_shake=0.05, motion_cycles=1.5,
        )
        d_sharp = synthetic.generate_dataset(sc, num_blur_samples=3,
                                             num_tracks=10)
        d_union = synthetic.generate_dataset(
            sc, num_blur_samples=3, num_tracks=10, blur_union_masks=True
        )
        ms = np.asarray(d_sharp.masks)
        mu = np.asarray(d_union.masks)
        assert np.all(mu >= ms)  # superset
        assert (mu - ms).sum() > 0  # streaks actually covered
        # everything else identical
        np.testing.assert_allclose(
            np.asarray(d_union.imgs), np.asarray(d_sharp.imgs)
        )
        np.testing.assert_allclose(
            np.asarray(d_union.tracks_2d), np.asarray(d_sharp.tracks_2d)
        )


class TestValSplitServesSharpGT:
    def test_val_imgs_are_sharp(self, adapter):
        """The val split serves SHARP held-out frames (the reference's
        images_test protocol, run_compute_metrics.py:55-61); the train
        split serves the blurry inputs. Pose-opt evaluation against
        blurry targets silently measures blur-fit, not deblurring (the
        QUALITY_r03 second-run failure mode)."""
        val = synthetic.SyntheticSceneAdapter(
            adapter.scene, adapter.data, split="val"
        )
        np.testing.assert_array_equal(
            val.imgs, np.asarray(adapter.data.sharp_imgs)
        )
        np.testing.assert_array_equal(
            adapter.imgs, np.asarray(adapter.data.imgs)
        )
        np.testing.assert_array_equal(
            val.get_item(3)["imgs"], np.asarray(adapter.data.sharp_imgs[3])
        )
        assert "query_tracks_2d" not in val.get_item(3)
        # blur is real on this scene: the two splits differ
        assert float(np.abs(val.imgs - adapter.imgs).max()) > 1e-3
