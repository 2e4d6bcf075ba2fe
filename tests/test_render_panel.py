"""Keyframed camera-path tests (vis/render_panel.py vs reference
render_panel.py:37-1165 semantics: interpolating spline through keyframes,
loop mode, fov/time interpolation, offline path rendering)."""

import numpy as np
import pytest

from deblur4dgs_tpu.vis.render_panel import (
    Keyframe,
    interpolate_camera_path,
    render_camera_path,
)


def lookat_c2w(eye, target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0)):
    eye = np.asarray(eye, np.float32)
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float32))
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, d, f, eye
    return c2w


def ring_keyframes(n=4, radius=3.0, with_time=True):
    kfs = []
    for i in range(n):
        a = 2 * np.pi * i / n
        kfs.append(
            Keyframe(
                c2w=lookat_c2w(
                    [radius * np.sin(a), 0.5, -radius * np.cos(a)]
                ),
                fov=np.pi / 3 + 0.1 * np.sin(a),
                time=float(2 * i) if with_time else None,
            )
        )
    return kfs


class TestInterpolation:
    def test_passes_through_keyframes(self):
        kfs = ring_keyframes(4)
        w2cs, fovs, times = interpolate_camera_path(kfs, 31, loop=False)
        assert w2cs.shape == (31, 4, 4)
        c2ws = np.linalg.inv(np.asarray(w2cs))
        # ends hit the first/last keyframes exactly (clamped path)
        np.testing.assert_allclose(c2ws[0], kfs[0].c2w, atol=1e-5)
        np.testing.assert_allclose(c2ws[-1], kfs[-1].c2w, atol=1e-4)
        # every keyframe position lies on the path (interpolating spline)
        pos = c2ws[:, :3, 3]
        for kf in kfs:
            d = np.linalg.norm(pos - kf.c2w[:3, 3], axis=-1).min()
            assert d < 0.12, d

    def test_valid_rotations_and_smooth(self):
        kfs = ring_keyframes(5)
        w2cs, _, _ = interpolate_camera_path(kfs, 60, loop=True)
        c2ws = np.linalg.inv(np.asarray(w2cs))
        R = c2ws[:, :3, :3]
        eye = np.eye(3)
        for r in R:
            np.testing.assert_allclose(r @ r.T, eye, atol=1e-4)
            assert np.linalg.det(r) > 0.9
        # consecutive positions move by bounded steps (no teleporting)
        step = np.linalg.norm(np.diff(c2ws[:, :3, 3], axis=0), axis=-1)
        assert step.max() < 6.0 * step.mean()

    def test_fov_time_interpolated_and_monotone_time(self):
        kfs = ring_keyframes(4)
        _, fovs, times = interpolate_camera_path(kfs, 24, loop=False)
        assert times is not None
        t = np.asarray(times)
        assert abs(t[0] - 0.0) < 1e-5 and abs(t[-1] - 6.0) < 1e-4
        f = np.asarray(fovs)
        assert f.min() >= np.pi / 3 - 0.25 and f.max() <= np.pi / 3 + 0.25

    def test_time_none_when_missing(self):
        kfs = ring_keyframes(3, with_time=False)
        _, _, times = interpolate_camera_path(kfs, 9)
        assert times is None

    def test_single_keyframe_and_errors(self):
        kfs = ring_keyframes(1)
        w2cs, fovs, times = interpolate_camera_path(kfs, 5)
        assert w2cs.shape == (5, 4, 4)
        np.testing.assert_allclose(
            np.asarray(w2cs[0]), np.asarray(w2cs[-1]), atol=1e-6
        )
        with pytest.raises(ValueError):
            interpolate_camera_path([], 5)

    def test_loop_wraps(self):
        kfs = ring_keyframes(4)
        w2cs, _, _ = interpolate_camera_path(kfs, 40, loop=True)
        c2ws = np.linalg.inv(np.asarray(w2cs))
        # a looped path ends near where it started (last sample is one
        # step before the wrap back to keyframe 0)
        gap = np.linalg.norm(c2ws[-1, :3, 3] - c2ws[0, :3, 3])
        step = np.linalg.norm(
            np.diff(c2ws[:, :3, 3], axis=0), axis=-1
        ).mean()
        assert gap < 5.0 * step

    def test_tension_one_gives_straighter_path(self):
        kfs = ring_keyframes(4)
        loose, _, _ = interpolate_camera_path(kfs, 40, tension=0.0)
        tight, _, _ = interpolate_camera_path(kfs, 40, tension=1.0)

        def path_len(w):
            p = np.linalg.inv(np.asarray(w))[:, :3, 3]
            return np.linalg.norm(np.diff(p, axis=0), axis=-1).sum()

        assert path_len(tight) <= path_len(loose) + 1e-4


class TestRenderPathCLI:
    def test_checkpoint_to_video(self, tmp_path):
        """Full CLI flow: save ckpt -> render-path -> video on disk."""
        import json

        from deblur4dgs_tpu.cli import main
        from deblur4dgs_tpu.train.checkpoints import (
            save_checkpoint,
            template_state,
        )

        state = template_state(
            num_fg=64, num_bg=64, num_bases=4, num_frames=3
        )
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, state, epoch=1)

        kfs = [
            {"c2w": lookat_c2w([0, 0, -3]).tolist(), "time": 0},
            {"c2w": lookat_c2w([2, 0, -2]).tolist(), "fov": 1.2, "time": 2},
        ]
        kf_path = tmp_path / "kf.json"
        kf_path.write_text(json.dumps(kfs))
        out = str(tmp_path / "path.mp4")
        main([
            "render-path", "--checkpoint", ckpt, "--num-frames", "3",
            "--num-fg", "64", "--num-bg", "64", "--num-motion-bases", "4",
            "--keyframes", str(kf_path), "--out", out,
            "--path-frames", "3", "--width", "32", "--height", "32",
        ])
        import os

        # save_video falls back to .gif when no mp4 codec is available
        assert os.path.exists(out) or os.path.exists(
            out.rsplit(".", 1)[0] + ".gif"
        )


class TestRenderPath:
    def test_renders_frames_and_video(self, tmp_path):
        calls = []

        def render_fn(cam, img_wh, t):
            calls.append((cam, t))
            W, H = img_wh
            return np.full((H, W, 3), 128, np.uint8)

        kfs = ring_keyframes(3)
        frames, video = render_camera_path(
            render_fn, kfs, (64, 48), num_frames=7,
            out_path=str(tmp_path / "path.mp4"), fps=10,
            num_scene_frames=5,
        )
        assert frames.shape == (7, 48, 64, 3)
        assert video is not None
        # times rounded + clamped to [0, num_scene_frames)
        ts = [t for _, t in calls]
        assert all(0 <= t <= 4 for t in ts)
        # fov flows through to the camera states
        assert all(0.8 < c.fov < 1.3 for c, _ in calls)


class TestFrameAllocation:
    def test_fewer_frames_than_segments_terminates(self):
        # regression: 5 looped keyframes (5 segments) with num_frames=4 used
        # to hang forever in the trim loop (every alloc entry floored at 1);
        # now num_frames is clamped up to the segment count
        kfs = ring_keyframes(5)
        w2cs, fovs, times = interpolate_camera_path(kfs, 4, loop=True)
        assert w2cs.shape[0] == 5  # clamped to nseg
        assert fovs.shape[0] == 5

    def test_clamped_path_fewer_frames(self):
        kfs = ring_keyframes(6)
        w2cs, _, _ = interpolate_camera_path(kfs, 3, loop=False)
        assert w2cs.shape[0] == 5  # nseg = K - 1
