"""Fixed-capacity Gaussian parameter pytrees.

TPU-native counterpart of the reference's GaussianParams
(/root/reference/flow3d/params.py:10-118). The reference rebuilds
nn.Parameter tensors on every densify/cull (dynamic Gaussian counts); XLA
wants static shapes, so we keep a fixed capacity N with an ``alive`` mask.
Density control (train/density.py) writes new Gaussians into dead slots and
clears the mask to cull — no recompiles, no optimizer-state surgery beyond
masked moment resets.

Parameters are stored raw (pre-activation), matching the reference:
  means (N, 3); quats (N, 4) unnormalized wxyz; scales (N, 3) log;
  colors (N, 3) logit RGB (NOT spherical harmonics — params.py:40);
  opacities (N,) logit; motion_coefs (N, K) pre-softmax (fg only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Gaussians(NamedTuple):
    means: jnp.ndarray  # (N, 3)
    quats: jnp.ndarray  # (N, 4) raw wxyz
    scales: jnp.ndarray  # (N, 3) log-scale
    colors: jnp.ndarray  # (N, 3) logit RGB
    opacities: jnp.ndarray  # (N,) logit
    motion_coefs: jnp.ndarray | None = None  # (N, K) pre-softmax
    # float 1.0/0.0 mask (float so the pytree stays optax/grad-friendly;
    # the optimizer labels it frozen). None => all alive.
    alive: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def num_alive(self) -> jnp.ndarray:
        if self.alive is None:
            return jnp.asarray(self.capacity)
        return jnp.sum(self.alive > 0.5)

    def get_alive(self) -> jnp.ndarray:
        """Bool aliveness mask."""
        if self.alive is None:
            return jnp.ones((self.capacity,), bool)
        return self.alive > 0.5

    # Activations (params.py:39-43).
    def get_quats(self) -> jnp.ndarray:
        n = jnp.linalg.norm(self.quats, axis=-1, keepdims=True)
        return self.quats / jnp.maximum(n, 1e-8)

    def get_scales(self) -> jnp.ndarray:
        return jnp.exp(self.scales)

    def get_colors(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.colors)

    def get_opacities(self) -> jnp.ndarray:
        op = jax.nn.sigmoid(self.opacities)
        if self.alive is not None:
            op = op * self.alive
        return op

    def get_coefs(self) -> jnp.ndarray:
        assert self.motion_coefs is not None
        return jax.nn.softmax(self.motion_coefs, axis=-1)


def pad_to_capacity(g: Gaussians, capacity: int) -> Gaussians:
    """Grow arrays to ``capacity`` slots; new slots are dead."""
    n = g.capacity
    assert capacity >= n
    extra = capacity - n
    alive = g.get_alive().astype(jnp.float32)

    def pad(x):
        if x is None:
            return None
        return jnp.concatenate(
            [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0
        )

    quats = pad(g.quats)
    if extra:
        quats = quats.at[n:, 0].set(1.0)  # keep dead quats normalizable
    return Gaussians(
        means=pad(g.means),
        quats=quats,
        scales=pad(g.scales),
        colors=pad(g.colors),
        opacities=pad(g.opacities),
        motion_coefs=pad(g.motion_coefs),
        alive=jnp.concatenate([alive, jnp.zeros((extra,), jnp.float32)]),
    )


def concat_gaussians(fg: Gaussians, bg: Gaussians) -> tuple[jnp.ndarray, ...]:
    """Concatenate activated (scales, opacities, colors) of fg then bg,
    matching the reference's fg-first ordering (scene_model.py:122-143)."""
    scales = jnp.concatenate([fg.get_scales(), bg.get_scales()], axis=0)
    opacities = jnp.concatenate([fg.get_opacities(), bg.get_opacities()], axis=0)
    colors = jnp.concatenate([fg.get_colors(), bg.get_colors()], axis=0)
    return scales, opacities, colors
