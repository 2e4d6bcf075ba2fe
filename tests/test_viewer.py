"""Browser viewer: drive the HTTP surface with a fake renderer."""

import json
import urllib.request

import numpy as np
import pytest

from deblur4dgs_tpu.vis.viewer import DynamicViewer


@pytest.fixture
def viewer():
    calls = []

    def render_fn(cam, img_wh, t):
        calls.append((cam, t))
        W, H = img_wh
        img = np.zeros((H, W, 3), np.uint8)
        img[..., 0] = 255 if t is None else min(t * 40, 255)
        return img

    v = DynamicViewer(render_fn, num_frames=5, img_wh=(64, 48), port=0)
    server = v.serve_forever(background=True)
    port = server.server_address[1]
    yield v, port, calls
    server.shutdown()


class TestViewer:
    def test_index_page(self, viewer):
        _, port, _ = viewer
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        assert "deblur4dgs_tpu viewer" in html
        assert 'max=4' in html  # num_frames - 1

    def test_render_endpoint(self, viewer):
        v, port, calls = viewer
        body = json.dumps(
            {"c2w": np.eye(4).tolist(), "t": 3, "canonical": False}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render", data=body, method="POST"
        )
        resp = urllib.request.urlopen(req, timeout=10)
        assert resp.headers["Content-Type"] == "image/jpeg"
        data = resp.read()
        assert data[:2] == b"\xff\xd8"  # JPEG magic
        assert calls[-1][1] == 3

    def test_canonical_mode(self, viewer):
        v, port, calls = viewer
        body = json.dumps(
            {"c2w": np.eye(4).tolist(), "t": 2, "canonical": True}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render", data=body, method="POST"
        )
        urllib.request.urlopen(req, timeout=10).read()
        assert calls[-1][1] is None
