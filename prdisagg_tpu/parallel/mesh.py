"""Device meshes and sharding policies.

The reference is single-GPU with a host-side multiprocessing input queue
(SURVEY.md §2.2); the TPU-native replacement is data-parallel SPMD over a 1-D
`jax.sharding.Mesh`:

* the batch axis of every per-sample tensor is sharded over the ``data`` axis,
* model/optimizer state and the HBM dataset are replicated,
* the XLA partitioner inserts the gradient all-reduce (psum over ICI).

At reference model scale (~10-50M params) TP/PP/EP buy nothing — they are
explicit non-goals (SURVEY.md §2.2); the extension point for bigger domains is
spatial sharding of the conv activations (halo exchange via XLA), which this
mesh abstraction leaves room for via extra axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` local devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_spec(ndim: int, axis: str = DATA_AXIS) -> P:
    """PartitionSpec sharding dim 0 (batch) over the data axis."""
    return P(axis, *([None] * (ndim - 1)))


def replicated_spec() -> P:
    return P()


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh (params, dataset, state).

    Works on a single host (plain device_put) and across process boundaries:
    when the mesh spans multiple processes (jax.distributed — SURVEY §2.2's
    "DP spans ICI first, DCN second"), each process contributes its local
    shards via `make_array_from_callback`, which only touches addressable
    devices.  Every process must hold an identical host copy (the usual
    replicated-input contract, guaranteed here by shared seeds/configs).
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def _rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(_rep, tree)
