"""StereoDataset loading tests against a fabricated on-disk scene."""

import os
import os.path as osp
import struct

import imageio.v3 as iio
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.data import colmap
from deblur4dgs_tpu.data.stereo import StereoDataConfig, StereoDataset
from tests.test_colmap import write_cameras_binary, write_images_binary

W, H = 64, 48
T_ALL = 16  # on-disk frames; train uses even -> 8


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    os.makedirs(d / "images")
    pre = d / "flow3d_preprocessed"
    os.makedirs(pre / "masks")
    os.makedirs(pre / "aligned_depth_anything_colmap")
    os.makedirs(pre / "2d_tracks")
    os.makedirs(pre / "colmap/sparse")

    names = [f"{i:05d}" for i in range(T_ALL)]
    cams = [colmap.Camera(1, "PINHOLE", W, H, np.array([100.0, 100.0, W / 2, H / 2]))]
    images = []
    for i, n in enumerate(names):
        img = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        iio.imwrite(str(d / "images" / f"{n}.png"), img)
        mask = np.zeros((H, W), np.uint8)
        mask[10:30, 20:40] = 255
        iio.imwrite(str(pre / "masks" / f"{n}.png"), mask)
        # stored as INVERSE depth (dataset inverts it back)
        depth = rng.uniform(0.2, 0.5, (H, W)).astype(np.float32)
        np.save(str(pre / "aligned_depth_anything_colmap" / f"{n}.npy"), depth)
        q = np.array([1.0, 0, 0, 0])
        t = np.array([0.01 * i, 0.0, 0.1 * i])
        images.append(
            colmap.Image(i + 1, q, t, 1, f"{n}.png",
                         np.zeros((0, 2)), np.zeros((0,), np.int64))
        )
    write_cameras_binary(str(pre / "colmap/sparse/cameras.bin"), cams)
    write_images_binary(str(pre / "colmap/sparse/images.bin"), images)

    # pairwise tracks between train frames (even indices): P=20 points
    P = 20
    train_names = names[::2]
    base = rng.uniform([5, 5], [W - 5, H - 5], (P, 2)).astype(np.float32)
    for i, ni in enumerate(train_names):
        for j, nj in enumerate(train_names):
            xy = base + 0.5 * (j - i)
            occ = np.full((P,), -5.0)  # sigmoid -> ~0 (visible)
            dist = np.full((P,), -5.0)  # confident
            arr = np.concatenate(
                [xy, occ[:, None], dist[:, None]], -1
            ).astype(np.float32)
            np.save(str(pre / "2d_tracks" / f"{ni}_{nj}.npy"), arr)
    return str(d)


class TestLoading:
    def test_train_split(self, scene_dir):
        ds = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8,
            )
        )
        assert ds.num_frames == 8
        assert ds.imgs.shape == (8, H, W, 3)
        assert ds.masks.shape == (8, H, W)
        assert ds.depths.shape == (8, H, W)
        assert ds.Ks.shape == (8, 3, 3)
        # depths were stored inverse; loaded depth = 1/stored in (2, 5)
        assert 1.5 < ds.depths.mean() < 6.0
        # scene normalization applied: w2cs still valid SE(3)
        R = ds.w2cs[:, :3, :3]
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape),
            atol=1e-4,
        )

    def test_val_split_reuses_norm(self, scene_dir):
        train = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8,
            )
        )
        val = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, split="val", intrinsics_scale=1.0,
                max_train_frames=8,
            ),
            scene_norm=train.scene_norm,
        )
        assert val.num_frames == 16
        assert list(val.time_ids[:4]) == [0, 0, 1, 1]

    def test_tracks_3d(self, scene_dir):
        ds = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8,
            )
        )
        tracks = ds.get_tracks_3d(num_samples=100)
        assert tracks.check_sizes()
        assert tracks.xyz.shape[1] == 8
        assert bool(jnp.all(jnp.isfinite(tracks.xyz)))

    def test_bkgd_points(self, scene_dir):
        ds = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8,
            )
        )
        pts = ds.get_bkgd_points(200)
        assert pts.xyz.shape[0] > 100
        norms = jnp.linalg.norm(pts.normals, axis=-1)
        assert bool(jnp.all((norms < 1.01)))

    def test_get_item_training(self, scene_dir):
        ds = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8, num_targets_per_frame=3,
            )
        )
        item = ds.get_item(2)
        assert item["imgs"].shape == (H, W, 3)
        assert item["target_ts"].shape == (3,)
        assert item["target_tracks_2d"].shape[0] == 3
        assert item["target_track_depths"].shape == item["target_visibles"].shape

    def test_intrinsics_scaling(self, scene_dir):
        lo = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=2.5,
                max_train_frames=8,
            )
        )
        hi = StereoDataset(
            StereoDataConfig(
                data_dir=scene_dir, end=8, intrinsics_scale=1.0,
                max_train_frames=8,
            )
        )
        np.testing.assert_allclose(lo.Ks[:, :2] * 2.5, hi.Ks[:, :2], rtol=1e-5)
