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


def _post(port, route, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{route}",
        data=json.dumps(obj).encode(), method="POST",
    )
    return json.loads(urllib.request.urlopen(req, timeout=10).read())


def _lookat_c2w(eye):
    eye = np.asarray(eye, np.float32)
    f = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    r = np.cross(up, f)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, d, f, eye
    return c2w


class TestKeyframeEndpoints:
    """In-browser keyframe editing surface (the viser render tab
    counterpart, flow3d/vis/render_panel.py:37-1165)."""

    def test_add_list_clear(self, viewer):
        _, port, _ = viewer
        assert _post(port, "/keyframe",
                     {"c2w": np.eye(4).tolist(), "time": 0})["num"] == 1
        assert _post(port, "/keyframe",
                     {"c2w": _lookat_c2w([0, 0, -3]).tolist(), "fov": 1.2,
                      "time": 2})["num"] == 2
        listed = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/keyframes", timeout=10
        ).read())
        assert listed["num"] == 2
        assert listed["keyframes"][1]["fov"] == pytest.approx(1.2)
        assert listed["keyframes"][1]["time"] == 2
        assert _post(port, "/keyframe_clear", {})["num"] == 0

    def test_path_cameras_preview(self, viewer):
        _, port, _ = viewer
        _post(port, "/keyframe",
              {"c2w": _lookat_c2w([0, 0, -3]).tolist(), "time": 0})
        _post(port, "/keyframe",
              {"c2w": _lookat_c2w([2, 0, -2]).tolist(), "time": 4})
        out = _post(port, "/path_cameras", {"num_frames": 5})
        assert len(out["c2ws"]) == 5
        assert len(out["times"]) == 5
        assert out["times"][0] == pytest.approx(0.0, abs=1e-5)
        assert out["times"][-1] == pytest.approx(4.0, abs=1e-5)
        # endpoint cameras hit the keyframes exactly
        np.testing.assert_allclose(
            np.array(out["c2ws"][0]), _lookat_c2w([0, 0, -3]), atol=1e-4
        )

    def test_path_needs_two_keyframes(self, viewer):
        _, port, _ = viewer
        assert "error" in _post(port, "/path_cameras", {"num_frames": 5})
        assert "error" in _post(port, "/render_path", {"num_frames": 3})

    def test_render_path_writes_video(self, tmp_path):
        def render_fn(cam, img_wh, t):
            W, H = img_wh
            return np.zeros((H, W, 3), np.uint8)

        v = DynamicViewer(render_fn, num_frames=5, img_wh=(32, 32), port=0,
                          work_dir=str(tmp_path))
        server = v.serve_forever(background=True)
        try:
            port = server.server_address[1]
            _post(port, "/keyframe",
                  {"c2w": _lookat_c2w([0, 0, -3]).tolist(), "time": 0})
            _post(port, "/keyframe",
                  {"c2w": _lookat_c2w([2, 0, -2]).tolist(), "time": 4})
            out = _post(port, "/render_path", {"num_frames": 3})
            assert out["num_frames"] == 3
            import os

            assert os.path.exists(out["video"])
            assert "camera_paths" in out["video"]
        finally:
            server.shutdown()


class TestTracksForwarding:
    def test_tracks_kwarg_forwarded_when_supported(self):
        seen = []

        def render_fn(cam, img_wh, t, render_tracks=False):
            seen.append(render_tracks)
            W, H = img_wh
            return np.zeros((H, W, 3), np.uint8)

        v = DynamicViewer(render_fn, num_frames=3, img_wh=(32, 32), port=0)
        server = v.serve_forever(background=True)
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render",
                data=json.dumps({"c2w": np.eye(4).tolist(), "t": 1,
                                 "tracks": True}).encode(),
                method="POST",
            )
            urllib.request.urlopen(req, timeout=10).read()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render",
                data=json.dumps(
                    {"c2w": np.eye(4).tolist(), "t": 1}
                ).encode(),
                method="POST",
            )
            urllib.request.urlopen(req, timeout=10).read()
        finally:
            server.shutdown()
        assert seen == [True, False]

    def test_legacy_render_fn_not_broken(self, viewer):
        """A render_fn without the kwarg never receives it even when the
        page requests tracks."""
        _, port, calls = viewer
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"c2w": np.eye(4).tolist(), "t": 1,
                             "tracks": True}).encode(),
            method="POST",
        )
        resp = urllib.request.urlopen(req, timeout=10)
        assert resp.read()[:2] == b"\xff\xd8"


class TestRendererTracksOverlay:
    def test_track_overlay_drawn(self):
        """Renderer caches fg tracks (reference renderer.py:37-42) and
        overlays the projected trails (renderer.py:83-88)."""
        from deblur4dgs_tpu.train.checkpoints import template_state
        from deblur4dgs_tpu.vis.renderer import CameraState, Renderer

        state = template_state(
            num_fg=32, num_bg=32, num_bases=4, num_frames=3
        )
        r = Renderer(state.scene, num_frames=3, num_exposure=3, cap=256,
                     use_pallas=False, num_tracks=8)
        cam = CameraState(
            fov=np.pi / 3, aspect=1.0, c2w=_lookat_c2w([0, 0, -3])
        )
        img = r.render_fn(cam, (32, 32), t=2, render_tracks=True)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert r._tracks_3d.shape == (8, 3, 3)
        # cache is per-scene: same scene object, no recompute
        tr0 = r._tracks_3d
        r.render_fn(cam, (32, 32), t=1, render_tracks=True)
        assert r._tracks_3d is tr0
