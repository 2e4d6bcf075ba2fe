"""Track/point observation bundles (counterpart of
/root/reference/flow3d/tensor_dataclass.py:62-96)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TrackObservations(NamedTuple):
    xyz: jnp.ndarray  # (G, T, 3)
    visibles: jnp.ndarray  # (G, T) bool
    invisibles: jnp.ndarray  # (G, T) bool
    confidences: jnp.ndarray  # (G, T)
    colors: jnp.ndarray  # (G, 3)

    def filter_valid(self, mask) -> "TrackObservations":
        return TrackObservations(
            self.xyz[mask],
            self.visibles[mask],
            self.invisibles[mask],
            self.confidences[mask],
            self.colors[mask],
        )

    def check_sizes(self) -> bool:
        G, T = self.xyz.shape[:2]
        return (
            self.visibles.shape == (G, T)
            and self.invisibles.shape == (G, T)
            and self.confidences.shape == (G, T)
            and self.colors.shape == (G, 3)
        )


class StaticObservations(NamedTuple):
    xyz: jnp.ndarray  # (N, 3)
    normals: jnp.ndarray  # (N, 3)
    colors: jnp.ndarray  # (N, 3)
