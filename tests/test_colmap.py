"""COLMAP reader round-trip tests (write binary + text, read back)."""

import os
import struct

import numpy as np
import pytest

from deblur4dgs_tpu.data import colmap


def write_cameras_binary(path, cams):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for c in cams:
            model_id = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1}[c.model]
            f.write(struct.pack("<iiQQ", c.id, model_id, c.width, c.height))
            f.write(struct.pack(f"<{len(c.params)}d", *c.params))


def write_images_binary(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images:
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            n = im.xys.shape[0]
            f.write(struct.pack("<Q", n))
            for j in range(n):
                f.write(struct.pack("<2d", *im.xys[j]))
                f.write(struct.pack("<q", im.point3D_ids[j]))


@pytest.fixture
def model_dir(tmp_path):
    rng = np.random.default_rng(0)
    cams = [
        colmap.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])),
        colmap.Camera(2, "SIMPLE_PINHOLE", 320, 240, np.array([250.0, 160.0, 120.0])),
    ]
    images = []
    for i in range(3):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        images.append(
            colmap.Image(
                i + 1, q, rng.normal(size=3), 1 + i % 2, f"frame_{i:04d}.png",
                rng.uniform(0, 640, (5, 2)), rng.integers(-1, 100, 5).astype(np.int64),
            )
        )
    write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    write_images_binary(str(tmp_path / "images.bin"), images)
    return tmp_path, cams, images


class TestBinaryRoundtrip:
    def test_cameras(self, model_dir):
        d, cams, _ = model_dir
        out = colmap.read_cameras_binary(str(d / "cameras.bin"))
        assert set(out) == {1, 2}
        np.testing.assert_allclose(out[1].params, cams[0].params)
        assert out[1].K[0, 0] == 500.0 and out[1].K[1, 1] == 510.0
        assert out[2].K[0, 0] == out[2].K[1, 1] == 250.0

    def test_images(self, model_dir):
        d, _, images = model_dir
        out = colmap.read_images_binary(str(d / "images.bin"))
        assert len(out) == 3
        for im in images:
            got = out[im.id]
            assert got.name == im.name
            np.testing.assert_allclose(got.qvec, im.qvec)
            np.testing.assert_allclose(got.tvec, im.tvec)
            np.testing.assert_allclose(got.xys, im.xys)
            np.testing.assert_array_equal(got.point3D_ids, im.point3D_ids)

    def test_w2c_valid(self, model_dir):
        d, _, images = model_dir
        out = colmap.read_images_binary(str(d / "images.bin"))
        for im in out.values():
            R = im.w2c[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)

    def test_get_camera_params(self, model_dir):
        d, _, images = model_dir
        names = [im.name for im in images]
        Ks, w2cs = colmap.get_colmap_camera_params(str(d), names)
        assert Ks.shape == (3, 3, 3) and w2cs.shape == (3, 4, 4)


class TestQvec:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = colmap.qvec_to_rotmat(q)
            q2 = colmap.rotmat_to_qvec(R)
            np.testing.assert_allclose(q, q2, atol=1e-8)
