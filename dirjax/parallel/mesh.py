"""Device-mesh construction.

The reference's entire parallel story is single-process
``torch.nn.DataParallel`` (``utils/common.py:150-175``). The TPU-native
replacement is SPMD over a ``jax.sharding.Mesh``:

* axis ``"data"`` — batch-parallel descriptor extraction (the DP analog,
  riding ICI instead of PCIe scatter/gather);
* axis ``"db"``   — database-sharded ranking: each device holds a row-slice
  of the descriptor matrix, queries are replicated, candidate top-ks merge
  with one all-gather (the workload's "sequence parallel" analog,
  SURVEY.md §5).

On a multi-host pod, put "db" on the ICI-adjacent axis and "data" across
DCN: extraction needs no cross-device traffic, ranking's all-gather stays
on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_multihost_mesh", "multihost_layout",
           "data_sharding", "replicated", "P", "Mesh", "NamedSharding"]


def make_mesh(data: Optional[int] = None, db: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 2D ("data", "db") mesh. Defaults to all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // db
    assert data * db == n, f"{data}x{db} != {n} devices"
    arr = np.asarray(devices).reshape(data, db)
    return Mesh(arr, axis_names=("data", "db"))


def multihost_layout(devices: Sequence, db_per_host: int) -> np.ndarray:
    """(hosts, db_per_host) device grid with each row holding one host's
    ICI-adjacent devices (grouped by ``process_index``, ordered by ``id``).
    Pure layout logic, unit-testable with fake device objects."""
    n = len(devices)
    assert n % db_per_host == 0, f"{n} devices not divisible by {db_per_host}"
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices, dtype=object).reshape(n // db_per_host,
                                                    db_per_host)
    for row in arr:  # each mesh row must stay within one host's ICI domain
        assert len({d.process_index for d in row}) == 1, \
            "db_per_host does not evenly tile the per-host device groups"
    return arr


def make_multihost_mesh(db_per_host: Optional[int] = None,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Mesh for a multi-host pod: "data" across hosts (DCN), "db" within a
    host (ICI) — extraction is embarrassingly parallel so its axis can ride
    the slow interconnect, while ranking's per-query candidate all-gather
    stays on ICI (the scaling-book recipe: collectives on the fastest axis
    that must communicate).

    Call :func:`jax.distributed.initialize` first in each host process;
    ``db_per_host`` defaults to every local device. On a single host this
    degenerates to ``make_mesh(data=1, db=n)``."""
    explicit = devices is not None
    devices = list(devices if explicit else jax.devices())
    if db_per_host is None:
        # For the default device set, this host's own device count is the
        # right row width (correct even on asymmetric pods where process 0
        # differs from the caller); for an explicit device list, infer it
        # from the list itself.
        db_per_host = max(1, len([d for d in devices
                                  if d.process_index == devices[0].process_index])) \
            if explicit else jax.local_device_count()
    arr = multihost_layout(devices, db_per_host)
    return Mesh(arr, axis_names=("data", "db"))


def data_sharding(mesh: Mesh, *trailing_none: int) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; trailing axes replicated."""
    return NamedSharding(mesh, P("data", *([None] * trailing_none[0]
                                           if trailing_none else [])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
