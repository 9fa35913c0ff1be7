"""Device-mesh and sharding helpers.

The reference is single-device (SURVEY.md §2.3); the idiomatic TPU scale-out
for its workloads (embedding extraction, MTCNN stage batches, distance
matmuls) is batch data parallelism over a 1-D mesh with XLA collectives, plus
optional tensor parallelism for wide classifier heads at training time. These
helpers centralize mesh construction and batch sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a device mesh. Default: 1-D over all local devices."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    return Mesh(devices[:n].reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading dim up to a multiple (repeat-last padding). Returns
    (padded, original_n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = np.repeat(x[-1:], rem, axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x, n
