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
                 use_pallas: bool = True):
        self.scene = scene
        self.num_frames = num_frames
        self.num_exposure = num_exposure
        self.cap = cap
        self.use_pallas = use_pallas

    @staticmethod
    def init_from_checkpoint(path: str, template_state, num_frames: int,
                             **kw) -> "Renderer":
        from deblur4dgs_tpu.train.checkpoints import load_checkpoint

        state, _ = load_checkpoint(path, template_state)
        return Renderer(state.scene, num_frames, **kw)

    def render_fn(self, camera_state: CameraState,
                  img_wh: tuple[int, int], t: int | None = 0) -> np.ndarray:
        """Single sharp render for the viewer (renderer.py:57-89 /
        trainer.py:180-201 semantics)."""
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
        return np.asarray(
            (jnp.clip(out["img"], 0, 1) * 255).astype(jnp.uint8)
        )
