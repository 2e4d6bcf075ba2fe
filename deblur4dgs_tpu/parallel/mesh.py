"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §5: no distributed code at
all); scaling here is TPU-native via jax.sharding. Parallel axes (SURVEY.md
§5 "long-context analogs"):

  * 'sub' — exposure sub-frame parallelism: the K sub-frame renders of a
    blurry frame are independent until the averaging reduction; sharding
    the vmapped sub-frame axis lets GSPMD place one (or more) sub-frame
    render+backward per chip and turn the mean/max/min reductions and the
    Gaussian-parameter gradient reductions into ICI collectives.

Gaussians are replicated (they are small relative to pixels); their
gradients are psum'd by GSPMD automatically through the vmap-sharded path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None, axis: str = "sub") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def subframe_sharding(mesh: Mesh, axis: str = "sub") -> NamedSharding:
    """Sharding for arrays whose leading dim is the exposure sub-frame."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def maybe_init_distributed(env_var: str = "DEBLUR4DGS_DIST") -> bool:
    """Multi-host entry: call jax.distributed.initialize() when the
    launcher sets ``DEBLUR4DGS_DIST=1``. The coordinator address comes
    from JAX_COORDINATOR_ADDRESS (read by initialize itself); process
    count/id come from DEBLUR4DGS_NUM_PROCESSES / DEBLUR4DGS_PROCESS_ID
    when set (plain-process launchers, e.g. tests/test_multihost.py) and
    otherwise from JAX's cluster auto-detection (SLURM / OpenMPI / TPU
    metadata service). A no-op on single-host runs so CLIs and the graft
    dryrun can call it unconditionally. Returns True when initialization
    ran."""
    import os

    if os.environ.get(env_var, "").lower() not in ("1", "true"):
        return False
    kw = {}
    if os.environ.get("DEBLUR4DGS_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["DEBLUR4DGS_NUM_PROCESSES"])
        kw["process_id"] = int(os.environ["DEBLUR4DGS_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True


def global_mesh(axis: str = "sub") -> Mesh:
    """Mesh over every global device (all hosts after
    maybe_init_distributed); shardings built from it ride ICI within a
    host and DCN across hosts via GSPMD collectives."""
    return Mesh(np.array(jax.devices()), (axis,))
