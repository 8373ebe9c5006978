"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1) -> Mesh:
    """(data x spatial) mesh over the first n devices.

    spatial=1 gives a pure data-parallel mesh; spatial>1 additionally
    shards frame width for halo-exchange spatial parallelism.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % spatial == 0, (n_devices, spatial)
    arr = np.asarray(devices).reshape(n_devices // spatial, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P("data"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, C, H, W): batch over 'data', width over 'spatial'.

    Convs/lifting stencils on W-sharded frames get halo exchanges from
    the XLA SPMD partitioner; the lifting even/odd split is along H, so
    the W shards stay independent through split/merge.
    """
    return NamedSharding(mesh, P("data", None, None, "spatial"))
