"""Viewer-facing renderer (counterpart of /root/reference/flow3d/renderer.py):
wraps a trained SceneModel checkpoint behind a (camera_state, img_wh) ->
image callback for interactive viewing."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from deblur4dgs_tpu.models.scene import SceneModel, render


@dataclass
class CameraState:
    """Matches nerfview's CameraState surface (fov, c2w)."""

    fov: float
    aspect: float
    c2w: np.ndarray  # (4, 4)


class Renderer:
    def __init__(self, scene: SceneModel, num_frames: int,
                 num_exposure: int = 11, cap: int = 512,
                 use_pallas: bool = True, num_tracks: int = 10):
        self.scene = scene
        self.num_frames = num_frames
        self.num_exposure = num_exposure
        self.cap = cap
        self.use_pallas = use_pallas
        self.num_tracks = num_tracks
        self._tracks_scene = None  # identity key for the tracks_3d cache
        self._tracks_3d = None

    @staticmethod
    def init_from_checkpoint(path: str, template_state, num_frames: int,
                             **kw) -> "Renderer":
        from deblur4dgs_tpu.train.checkpoints import load_checkpoint

        state, _ = load_checkpoint(path, template_state)
        return Renderer(state.scene, num_frames, **kw)

    def _fg_tracks(self) -> np.ndarray:
        """(P, T, 3) world-space fg track positions over all frames
        (reference renderer.py:37-42: compute_poses_fg over arange(T) for a
        small index subset, cached per model)."""
        if self._tracks_scene is not self.scene:
            from deblur4dgs_tpu.models.scene import compute_poses_fg

            alive = np.asarray(self.scene.fg.get_alive()) > 0.5
            inds = np.nonzero(alive)[0]
            if inds.size == 0:
                inds = np.arange(min(self.num_tracks, self.scene.num_fg))
            inds = inds[: self.num_tracks]
            ts = jnp.arange(self.num_frames, dtype=jnp.float32)
            means, _ = compute_poses_fg(self.scene, ts)  # (G, T, 3)
            self._tracks_3d = np.asarray(means[inds])
            self._tracks_scene = self.scene
        return self._tracks_3d

    def render_fn(self, camera_state: CameraState,
                  img_wh: tuple[int, int], t: int | None = 0,
                  render_tracks: bool = False) -> np.ndarray:
        """Single sharp render for the viewer (renderer.py:57-89 /
        trainer.py:180-201 semantics). render_tracks overlays the fg 2D
        track trails (renderer.py:83-88: project the last 20 frames of
        cached tracks_3d through K @ w2c and draw)."""
        W, H = img_wh
        focal = 0.5 * H / np.tan(0.5 * camera_state.fov)
        K = jnp.asarray(
            [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        w2c = jnp.asarray(
            np.linalg.inv(camera_state.c2w.astype(np.float32))
        )
        out = render(
            self.scene, t, w2c, K, (W, H), mode="mid", stage="second",
            num_exposure=self.num_exposure, cap=self.cap,
            use_pallas=self.use_pallas,
        )
        img = np.asarray(jnp.clip(out["img"], 0, 1))
        if render_tracks and t is not None:
            from deblur4dgs_tpu.vis.utils import draw_tracks_2d

            tr = self._fg_tracks()[:, max(0, t - 20): max(1, t)]  # (P,n,3)
            Kw = np.asarray(K) @ np.asarray(w2c)[:3]  # (3, 4)
            xyz1 = np.concatenate(
                [tr, np.ones_like(tr[..., :1])], axis=-1
            )
            p = np.einsum("ij,ptj->pti", Kw, xyz1)
            tracks_2d = p[..., :2] / np.maximum(p[..., 2:], 1e-6)
            img = draw_tracks_2d(img, tracks_2d, num_trail=tr.shape[1])
        return (img * 255).astype(np.uint8)
