"""Minimal MLP as plain pytrees (weights dict) + pure apply functions.

Small nets here (the exposure MoveModel trunk/heads are 64-wide) don't
warrant a framework; plain pytrees keep the whole train state a single
NamedTuple that optax/orbax handle natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key, d_in: int, d_out: int, zero: bool = False):
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    if zero:
        return {
            "w": jnp.zeros((d_in, d_out), jnp.float32),
            "b": jnp.zeros((d_out,), jnp.float32),
        }
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def linear(p, x):
    return x @ p["w"] + p["b"]


def init_mlp(key, dims: list[int], zero_last: bool = False):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        init_linear(k, a, b, zero=(zero_last and i == len(dims) - 2))
        for i, (k, a, b) in enumerate(zip(keys, dims[:-1], dims[1:]))
    ]


def mlp(params, x, act=None, slope: float = 0.01):
    """Apply an MLP with LeakyReLU(slope) between layers, none after last."""
    if act is None:
        act = lambda v: jax.nn.leaky_relu(v, slope)
    for i, p in enumerate(params):
        x = linear(p, x)
        if i < len(params) - 1:
            x = act(x)
    return x


def posenc(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """NeRF positional encoding with include_input, log-spaced frequencies
    2^0..2^(num_freqs-1) (matches move_model.py:12-60: out dim
    d*(1+2*num_freqs))."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    xb = x[..., None, :] * freqs[:, None]  # (..., F, d)
    # Per frequency: sin block then cos block (reference interleaving order).
    enc = jnp.reshape(
        jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2), x.shape[:-1] + (-1,)
    )
    return jnp.concatenate([x, enc], axis=-1)
