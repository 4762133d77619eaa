"""Device-mesh helpers for k-point sharding.

The rebuild's communication backend (SURVEY.md §2.4): XLA collectives
over ICI under ``jax.sharding`` — replacing the reference's MPI/hypre
ParCSR stack. The primary parallel axis is the k-point batch (the DP
analog, §2.3); domain decomposition of a single operator is layered on
top when one problem outgrows a chip (§2.3 row 1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["kpoint_mesh", "shard_k", "replicated", "P", "Mesh",
           "NamedSharding"]


def kpoint_mesh(devices: Optional[Sequence] = None,
                axis_name: str = "k") -> Mesh:
    """A 1D device mesh over all (or the given) devices, axis ``k``."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis_name,))


def shard_k(mesh: Mesh, axis_name: str = "k") -> NamedSharding:
    """Sharding that splits the leading (k-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
