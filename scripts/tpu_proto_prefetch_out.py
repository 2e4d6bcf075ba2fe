"""Prototype for PERF.md lever 1: can a kernel write its output blocks
directly at image-tile positions via a scalar-prefetched index map, with
unvisited rows preserved through input_output_aliases?

Two questions, answered on real TPU:
  A. out BlockSpec index_map driven by a prefetched tile_ids array —
     does block t land at row ids[t]?
  B. rows NOT visited by any grid step, when the output aliases an input
     buffer — do they keep the input's contents (else lever 1 needs a
     select/merge pass that would eat the gather savings)?
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(ids_ref, x_ref, base_ref, o_ref):
    del ids_ref, base_ref
    o_ref[:] = x_ref[:] + 1000.0


@functools.partial(jax.jit, static_argnames=("T",))
def scatter_rows(ids, x, base, T):
    """x: (Tb, 8, 128) rows; base: (T, 8, 128) pre-existing contents.
    Writes row t of x at base[ids[t]]; other rows should keep base."""
    Tb = x.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tb,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, ids: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, ids: (ids[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, ids: (ids[t], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
        input_output_aliases={2: 0},  # base (input idx incl. prefetch) -> out
    )(ids, x, base)


def main():
    T, Tb = 16, 6
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.choice(T, Tb, replace=False).astype(np.int32))
    x = jnp.asarray(rng.uniform(0, 1, (Tb, 8, 128)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 1, (T, 8, 128)).astype(np.float32))
    out = np.asarray(scatter_rows(ids, x, base, T))

    ids_np = np.asarray(ids)
    ok_visited = all(
        np.allclose(out[ids_np[t]], np.asarray(x[t]) + 1000.0)
        for t in range(Tb)
    )
    unvisited = [t for t in range(T) if t not in set(ids_np.tolist())]
    ok_unvisited = all(
        np.allclose(out[t], np.asarray(base[t])) for t in unvisited
    )
    print(f"A: scatter-by-prefetched-index works: {ok_visited}")
    print(f"B: unvisited rows keep aliased input: {ok_unvisited}")
    if unvisited and not ok_unvisited:
        t = unvisited[0]
        print("  sample unvisited row[0,:4]:", out[t, 0, :4],
              "base:", np.asarray(base[t, 0, :4]))
    sys.exit(0 if (ok_visited and ok_unvisited) else 1)


if __name__ == "__main__":
    main()
