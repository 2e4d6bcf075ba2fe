"""Native C++ COLMAP reader vs the pure-Python parser."""

import struct

import numpy as np
import pytest

from deblur4dgs_tpu.data import colmap as pycolmap
from deblur4dgs_tpu.data import native_colmap
from tests.test_colmap import write_cameras_binary, write_images_binary


@pytest.fixture
def model_dir(tmp_path):
    rng = np.random.default_rng(0)
    cams = [
        pycolmap.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])),
        pycolmap.Camera(7, "SIMPLE_PINHOLE", 320, 240, np.array([250.0, 160.0, 120.0])),
    ]
    images = []
    for i in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images.append(
            pycolmap.Image(
                i + 1, q, rng.normal(size=3), 1, f"im_{i:03d}.png",
                rng.uniform(0, 640, (7, 2)),
                rng.integers(-1, 50, 7).astype(np.int64),
            )
        )
    write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    write_images_binary(str(tmp_path / "images.bin"), images)
    return tmp_path


def _skip_if_no_native():
    if native_colmap.get_lib() is None:
        pytest.skip("native toolchain unavailable")


class TestNativeReader:
    def test_builds(self):
        _skip_if_no_native()

    def test_cameras_match_python(self, model_dir):
        _skip_if_no_native()
        nat = native_colmap.read_cameras_binary(str(model_dir / "cameras.bin"))
        py = pycolmap.read_cameras_binary(str(model_dir / "cameras.bin"))
        assert set(nat) == set(py)
        for k in py:
            assert nat[k].model == py[k].model
            assert nat[k].width == py[k].width
            np.testing.assert_allclose(nat[k].params, py[k].params)
            np.testing.assert_allclose(nat[k].K, py[k].K)

    def test_images_match_python(self, model_dir):
        _skip_if_no_native()
        nat = native_colmap.read_images_binary(str(model_dir / "images.bin"))
        py = pycolmap.read_images_binary(str(model_dir / "images.bin"))
        assert set(nat) == set(py)
        for k in py:
            assert nat[k].name == py[k].name
            assert nat[k].camera_id == py[k].camera_id
            np.testing.assert_allclose(nat[k].qvec, py[k].qvec)
            np.testing.assert_allclose(nat[k].tvec, py[k].tvec)
            np.testing.assert_allclose(nat[k].w2c, py[k].w2c)

    def test_points3d(self, tmp_path):
        _skip_if_no_native()
        rng = np.random.default_rng(1)
        n = 5
        with open(tmp_path / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<Q", i + 10))
                f.write(struct.pack("<3d", *rng.normal(size=3)))
                f.write(struct.pack("<3B", *rng.integers(0, 255, 3)))
                f.write(struct.pack("<d", rng.uniform()))
                f.write(struct.pack("<Q", 2))
                f.write(struct.pack("<2Q", 0, 0))
        xyz, rgb, err, ids = native_colmap.read_points3d_binary(
            str(tmp_path / "points3D.bin")
        )
        xyz2, rgb2, err2, ids2 = pycolmap.read_points3d_binary(
            str(tmp_path / "points3D.bin")
        )
        np.testing.assert_allclose(xyz, xyz2)
        np.testing.assert_array_equal(rgb, rgb2)
        np.testing.assert_array_equal(ids, ids2)
